package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det.{dsum, sqlDsum}

/** Structured Streaming EXECUTION under the DuckDB oracle gate.
  *
  * Streaming operators elsewhere in graft/streaming are spec-gated —
  * DuckDB cannot watch a stream. But a BOUNDED stream in Complete output
  * mode has a well-defined final table that no micro-batch boundary can
  * perturb: the aggregation state folds the whole input regardless of
  * how the file source slices it into triggers, and the decimal-routed
  * sums make the fold order-independent. So the full streaming machinery
  * — file-stream source over a partitioned directory, trigger-bounded
  * micro-batches, stateful aggregation, memory sink — runs end-to-end
  * inside a registered query whose FINAL result hash-matches the oracle
  * computing the same aggregate from the flat fixture in SQL (reference:
  * real_time_streaming.py's windowed aggregations, RT:155-211).
  *
  * The query streams the y/m/d-partitioned copy of `events`
  * ([[graft.sources.PartitionedLayout.partitionedEvents]]) with
  * `maxFilesPerTrigger=7`, so a 30-day corpus really does arrive as
  * multiple micro-batches in arbitrary file order — the exactness being
  * proven is precisely "micro-batching is invisible in the result".
  */
object StreamingOracle {

  private val runId = new AtomicInteger(0)

  /** q68 — 5-minute windowed rollup per event type, computed BY THE
    * STREAMING ENGINE and returned as the final Complete-mode table. */
  def streamingWindowRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // materialize the partitioned copy (memoized per JVM) and stream it
    graft.sources.PartitionedLayout.partitionedEvents(spark, sfDir)
    val dir = graft.sources.PartitionedLayout.partitionedEventsDir(sfDir)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "7")
      .option("basePath", dir)
      .parquet(dir)
    val agg = src
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), col("n"), col("total_value"))
    val name = s"q68_stream_${runId.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .orderBy(col("bucket_start"), col("event_type").asc_nulls_last)
  }

  private val q68Sql =
    s"""SELECT cast(floor(epoch(ts) / 300) * 300 as bigint) AS bucket_start,
       |       event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q69 — the stateful funnel across REAL micro-batches, under q58's
    * oracle. The Update-mode stream re-emits a user's (t1, t2, t3)
    * whenever a batch touches them; the funnel's monotonicity (every
    * step threshold only ever DECREASES once defined, and never reverts
    * to null — proven by FunnelSpec's property test) means the FINAL
    * state per user is simply the per-column MIN over all emissions. So:
    * stream the partitioned copy in arbitrary file order, fold the
    * emissions, roll up to q58's summary — hash equality with the batch
    * window formulation proves the state machine is exact under any
    * micro-batch slicing the source produces. */
  def streamingFunnelSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.sources.PartitionedLayout.partitionedEvents(spark, sfDir)
    val dir = graft.sources.PartitionedLayout.partitionedEventsDir(sfDir)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "7")
      .option("basePath", dir)
      .parquet(dir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
      .as[Funnel.FunnelEvent]
    val name = s"q69_stream_${runId.incrementAndGet()}"
    val q = Funnel.streamingFunnel(spark, src)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val perUser = spark.table(name)
      .groupBy("user_id")
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
    graft.operators.FunnelQueries.funnelSummary(perUser)
  }

  private val docsWritten = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q70 — STREAMING corpus dedup under the oracle: `documents` arrives
    * as ten separate files streamed two per trigger, and the streaming
    * `dropDuplicates` state machine keeps the first (lang, text-hash)
    * occurrence it sees. WHICH row survives depends on arrival order, so
    * the gate aggregates to the order-INVARIANT surface — kept docs per
    * language = distinct (lang, hash) pairs — which must hash-match
    * DuckDB computing the same from the flat fixture (the streaming twin
    * of l01's exact-dedup arithmetic, and the front door a streaming
    * corpus-ingest pipeline runs; reference analog: the content-hash
    * dedup in Streams.corpusIngest). */
  def streamingDedupStats(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = docsWritten.computeIfAbsent(sfDir, { _ =>
      val p = java.nio.file.Files.createTempDirectory("graft_stream_docs")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
      }))
      val out = p.toString
      graft.Tables.documents(spark, sfDir)
        .select("doc_id", "text", "lang")
        .repartition(10, col("doc_id"))
        .write.mode("overwrite").parquet(out)
      out
    })
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
      .withColumn("text_hash", md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .dropDuplicates("lang", "text_hash")
    val name = s"q70_stream_${runId.incrementAndGet()}"
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy("lang").agg(count(lit(1)).as("kept_docs"))
      .orderBy(col("lang").asc_nulls_last)
  }

  private val q70Sql =
    """SELECT lang, count(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS kept_docs
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[graft.Q] = Seq(
    graft.Q("q68_streaming_window_rollup", (s, d) => streamingWindowRollup(s, d), Some(q68Sql)),
    graft.Q("q69_streaming_funnel", (s, d) => streamingFunnelSummary(s, d),
      Some(graft.operators.FunnelQueries.q58Sql)),
    graft.Q("q70_streaming_dedup", (s, d) => streamingDedupStats(s, d), Some(q70Sql)))
}
