package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Binned range join: the rewrite must change the PLAN (nested-loop →
  * bin equi-join) and never the ROWS (parity with the naive predicate
  * join, at several bin widths). */
class RangeJoinSpec extends SparkSuite {

  private val sf = sfDir("0.001")

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("the naive keyless range predicate plans a nested-loop join (the trap)") {
    val ev = Tables.events(spark, sf)
    val naive = ev.select(col("event_id"), col("ts"))
      .join(RangeJoin.purchaseWindows(ev),
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"expected the nested-loop trap in the naive plan:\n$p")
  }

  test("q88 binned form plans an equi-join on the bin — no nested loop, no cartesian") {
    val p = finalPlan(RangeJoin.pointInWindowRollup(Tables.events(spark, sf)))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned rewrite must not nested-loop:\n$p")
    assert(p.contains("__bin"), s"expected the bin equi-key in:\n$p")
  }

  test("q88 pairs == naive predicate join, row for row") {
    val ev = Tables.events(spark, sf)
    val pts = ev.select(col("event_id"), col("ts"))
    val wins = RangeJoin.purchaseWindows(ev)
    val binned = RangeJoin.pointInInterval(pts, "ts", wins, "w_start", "w_end")
      .select("event_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = pts.join(wins, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length === naive.length, "pair count must match the naive join")
    assert(binned.sorted.toSeq === naive.sorted.toSeq)
    assert(binned.nonEmpty, "fixture must exercise matches")
  }

  test("q89 overlap pairs == naive overlap join — the overlap-start residual dedups exactly") {
    val ev = Tables.events(spark, sf)
    val w = RangeJoin.purchaseWindows(ev)
    val e = RangeJoin.errorWindows(ev)
    val binned = RangeJoin.intervalOverlap(w, "w_start", "w_end", e, "e_start", "e_end")
      .select("w_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = w.join(e, col("w_start") < col("e_end") && col("e_start") < col("w_end"))
      .select("w_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length === naive.length,
      "each overlapping pair must appear exactly once (no multi-bin duplicates)")
    assert(binned.sorted.toSeq === naive.sorted.toSeq)
    assert(binned.nonEmpty, "fixture must exercise overlaps")
  }

  test("bin width changes COST never ROWS: 1-minute, 10-minute, 1-day bins agree") {
    val ev = Tables.events(spark, sf)
    val pts = ev.select(col("event_id"), col("ts"))
    val wins = RangeJoin.purchaseWindows(ev)
    def pairs(w: Long) =
      RangeJoin.pointInInterval(pts, "ts", wins, "w_start", "w_end", w)
        .select("event_id", "w_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val minute = 60L * 1000 * 1000
    val base = pairs(10 * minute)
    assert(pairs(minute) === base)
    assert(pairs(24 * 60 * minute) === base)
    def overlaps(w: Long) =
      RangeJoin.intervalOverlap(wins, "w_start", "w_end",
        RangeJoin.errorWindows(ev), "e_start", "e_end", w)
        .select("w_id", "e_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val obase = overlaps(10 * minute)
    assert(overlaps(minute) === obase)
    assert(overlaps(24 * 60 * minute) === obase)
  }

  test("empty and inverted intervals match nothing instead of erroring") {
    import spark.implicits._
    val pts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("pid", "pt")
    val ivs = Seq(
      (1L, "2024-01-01 09:00:00", "2024-01-01 09:00:00"), // empty
      (2L, "2024-01-01 11:00:00", "2024-01-01 09:00:00"), // inverted
      (3L, "2024-01-01 09:00:00", "2024-01-01 11:00:00")) // real
      .toDF("iid", "s", "e")
      .select(col("iid"), col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))
    val out = RangeJoin.pointInInterval(pts, "pt", ivs, "s", "e").collect()
    assert(out.map(_.getAs[Long]("iid")).toSeq === Seq(3L))
  }
}
