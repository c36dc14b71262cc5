package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}
import graft.llm.TextStats
import graft.operators.SurfaceQueries

/** The two Catalyst AGGREGATES ([[MisraGries]], [[TopKRows]]): structural
  * guarantees, merge/layout invariance where promised, and the
  * no-WindowExec plan shape q76 exists for.
  */
class AggSketchSpec extends SparkSuite {

  import spark.implicits._

  // a high-cardinality stream with two planted heavy hitters (20% each)
  // and ~12k singletons — capacity 32 forces constant eviction, so the
  // MG decrement path and the summary-merge path both run for real
  private def skewed(parts: Int) =
    spark.range(0, 20000)
      .select(when(col("id") % 5 < 2, concat(lit("H"), col("id") % 5))
        .otherwise(concat(lit("t"), col("id"))).as("k"))
      .repartition(parts)

  test("misra_gries surfaces every key above n/m under any layout") {
    for (parts <- Seq(1, 7, 32)) {
      val rows = skewed(parts)
        .agg(expr("misra_gries(k, 32)").as("sk"))
        .select(explode(col("sk.key")).as("key"))
        .collect().map(_.getString(0)).toSet
      assert(rows.size <= 31, s"capacity must bound the summary, got ${rows.size}")
      // H0 and H1 own 20% ≫ 1/32 of the stream each
      assert(rows.contains("H0") && rows.contains("H1"),
        s"heavy keys must survive at $parts partitions, got $rows")
    }
  }

  test("misra_gries counters are lower bounds of true frequencies") {
    val sk = skewed(7)
      .agg(expr("misra_gries(k, 32)").as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.key"), col("c.lower"))
      .as[(String, Long)].collect().toMap
    sk.foreach { case (k, lower) =>
      val truth = if (k.startsWith("H")) 4000L else 1L
      assert(lower <= truth, s"$k: lower bound $lower exceeds true count $truth")
      assert(lower >= 1L)
    }
  }

  test("l50 heavy trigrams: exact, deterministic, and layout-invariant") {
    val documents = Tables.documents(spark, sfDir("0.001"))
    val base = TextStats.heavyTrigrams(documents).collect().toSeq
    assert(base.nonEmpty, "fixture must have heavy trigrams")
    // exact reference: plain full GROUP BY + threshold (what the sketch
    // path must reproduce losslessly via the MG superset guarantee)
    val grams = documents.filter(length(col("text")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")).as("g"))
    val n = grams.count()
    val exact = grams.groupBy("g").count()
      .filter(col("count") * 128 > n)
      .select(col("g").as("trigram"), col("count").as("cnt"))
      .orderBy(col("cnt").desc, col("trigram")).collect().toSeq
    assert(base === exact, "sketch→verify must equal the exact heavy-hitter set")
    // partition layout cannot move the verified result
    val relaid = TextStats.heavyTrigrams(documents.repartition(13)).collect().toSeq
    assert(relaid === base)
  }

  test("top_k_rows equals window rank under any layout, ties by id") {
    val events = Tables.events(spark, sfDir("0.001"))
    val oracle = events
      .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("event_id"))
      .withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy(col("ts_s").desc, col("event_id"))))
      .filter(col("rn") <= 10).drop("rn")
      .select("event_type", "event_id", "ts_s")
      .orderBy(col("event_type"), col("ts_s").desc, col("event_id"))
      .collect().toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = SurfaceQueries.topKPerKey(events.repartition(parts)).collect().toSeq
      assert(got === oracle, s"top-k set must be layout-invariant at $parts partitions")
    }
  }

  test("top_k_rows keeps the whole group when k exceeds its size") {
    val tiny = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("ord", "id")
    val out = tiny.agg(expr("top_k_rows(ord, id, 5)").as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.ord"), col("t.id"))
      .as[(Long, Long)].collect().toSeq
    // ord DESC, id ASC — all three rows, exactly once
    assert(out === Seq((2L, 20L), (1L, 10L), (1L, 11L)))
  }

  test("q76 plan: partial/final object-hash aggregate, no window, no pre-sort") {
    val df = SurfaceQueries.topKPerKey(Tables.events(spark, sfDir("0.001")))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window rank must be gone:\n$p")
    val oha = "ObjectHashAggregate".r.findAllIn(p).length
    assert(oha >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    // the only Sort is the final 50-row presentation ORDER BY
    val sorts = "Sort ".r.findAllIn(p).length
    assert(sorts <= 1, s"no fact-sized sort allowed:\n$p")
  }

  test("l50 plan: candidate re-count joins through a broadcast, not a shuffle") {
    val df = TextStats.heavyTrigrams(Tables.documents(spark, sfDir("0.001")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤m-1 candidate set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-grain join shuffle:\n$p")
  }
}
