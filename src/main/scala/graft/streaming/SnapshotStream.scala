package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.etl.SnapshotMerge

/** Structured Streaming SOURCE over the [[SnapshotMerge]] store — the
  * managed-table streaming read the reference chains its medallion
  * stages with (`spark.readStream.format("delta")`,
  * real_time_streaming.py:226-230, 267-270, 373-376; r15 verdict item
  * #1, the one parity seam left).
  *
  * WHY a raw file-stream cannot sit on the snapshot store: the S2
  * substitution tails a directory of immutable files, which is exact
  * for append-only layouts — but a MERGE store rewrites whole
  * partitions per epoch ([[SnapshotMerge.upsert]]) and `compact()`
  * rewrites files with NO logical change. A file-stream over it would
  * double-read every compacted row and emit torn mid-publish states.
  * The manifest log is the correct source: offsets ARE committed
  * epochs, and each micro-batch emits the NET change rows between the
  * last processed epoch and the tip — `changes()`'s algebra
  * ([[SnapshotMerge.changes]]), restricted by the manifests to the
  * partitions a data-changing epoch actually touched.
  *
  * Semantics per batch (offset range `(fromE, toE]`):
  *  - first batch from a fresh checkpoint = the full `fromE`-less
  *    snapshot as `insert` rows (Delta's initial-snapshot behavior);
  *  - subsequent batches = net row diff, `insert` + (optionally)
  *    `delete` tagged, exactly once per committed epoch range — a
  *    restart replays the SAME `(start, end]` range from the
  *    checkpoint and `changes()` is a pure function of the two
  *    manifests, so recovery is deterministic;
  *  - compaction epochs (`dataChange=false` manifests) are SKIPPED at
  *    PLANNING time: a pure-compact range nets zero rows without
  *    reading one data file — the property that lets OPTIMIZE run
  *    under a live downstream stream (Delta marks those commits
  *    `dataChange=false` for the same reason);
  *  - a MERGE-updated key arrives as `delete`(old row) +
  *    `insert`(new row); with `withDeletes=false` only the inserts
  *    flow — lossless for a KEYED downstream apply, because this
  *    store's only mutation is keyed upsert (a key never vanishes
  *    without re-landing somewhere, so inserts carry the full final
  *    state per key).
  *
  * Scale posture: offset discovery is one manifest-directory listing
  * per poll; batch planning reads O(epochs in range) manifests —
  * metadata, never data; the data cost of a batch is the diff of the
  * CHANGED partitions only (manifest-pruned, the q111 property). The
  * `maxEpochsPerTrigger` option bounds a backlogged stream's per-batch
  * range. Retention contract: the manifests and version dirs of every
  * unprocessed epoch must outlive the stream's checkpoint lag —
  * size [[SnapshotMerge.vacuum]]'s `keep` to the reader window (the
  * Delta `delta.logRetentionDuration` trade, here in epochs).
  *
  * Schema is PINNED at stream start (the tip manifest's schema +
  * `_change_type` string + `_commit_epoch` long). Additive evolution
  * mid-stream keeps flowing (new columns are projected away until a
  * restart repins); drops and type changes cannot happen (the store
  * refuses them at merge time).
  */
class SnapshotStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), SnapshotStream.streamSchema(
      SnapshotStream.pinnedStoreSchema(sqlContext.sparkSession, parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotStreamSource(sqlContext.sparkSession, parameters, Some(metadataPath))
}

object SnapshotStream {
  /** `readStream.format(Format)` — the provider's fully-qualified name
    * (no service registry file in this build; Spark resolves class
    * names directly). */
  val Format: String = classOf[SnapshotStreamProvider].getName

  // ------------------------------------------------------------------
  // q112 — the medallion hop end-to-end under the driver's oracle: an
  // upstream snapshot store mutates (bootstrap → MERGE → compact →
  // MERGE) WHILE a streaming query reads its change feed through this
  // source and applies it into a downstream snapshot store
  // (Streams.changeApplySink — the reference's
  // readStream.format("delta") → MERGE chain,
  // real_time_streaming.py:226-230). The registered result is the
  // DOWNSTREAM store's final state rolled up per day; the oracle
  // recomputes the same three-state fold declaratively in DuckDB —
  // equality proves the source emitted exactly the net changes (the
  // compact epoch included, which must contribute zero rows).
  // Built once per (JVM, sfDir): the pipeline is a pure function of
  // the events fixture.
  // ------------------------------------------------------------------

  private val q112Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def q112Downstream(spark: SparkSession, sfDir: String): String =
    q112Dirs.computeIfAbsent(graft.PathKey(sfDir), { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_snapstream_q112")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path => JPath}
        if (Files.exists(root))
          Files.walk(root).sorted(java.util.Comparator.reverseOrder[JPath]())
            .forEach(f => Files.deleteIfExists(f))
      }))
      val gs = graft.SessionClones.cloned("snapshot-stream-gate", spark) { s =>
        s.conf.set("spark.sql.shuffle.partitions", "2")
      }
      val a = root.resolve("bronze").toString
      val b = root.resolve("silver").toString
      val ev = graft.Tables.events(gs, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          to_date(col("ts")).cast("string").as("day"))
      // epoch 1: bootstrap = ids %10 < 7
      SnapshotMerge.upsert(gs, a, ev.filter(col("event_id") % 10 < 7),
        Seq("event_id"), "day")
      // withDeletes=false is EXACT here because this upstream only
      // upserts (no deleteWhere in the fixture): every net change
      // re-lands as an insert per key, and the option skips the
      // delete-side exceptAll at planning time — the cheaper pairing
      // changeApplySink's doc scopes to upsert-only upstreams
      val q = Streams.changeApplySink(
        gs.readStream.format(Format).option("path", a)
          .option("withDeletes", "false").load(),
        b, root.resolve("ckpt").toString, Seq("event_id"), "day").start()
      try {
        q.processAllAvailable() // initial snapshot flows downstream
        // epoch 2: %10 ∈ {5,6,8} — 5,6 matched (+1000; 6 also MOVES
        // day+1), 8 inserts
        SnapshotMerge.upsert(gs, a,
          ev.filter(col("event_id") % 10 === 5 || col("event_id") % 10 === 6 ||
              col("event_id") % 10 === 8)
            .withColumn("value", col("value") + lit(1000.0))
            .withColumn("day",
              when(col("event_id") % 10 === 6,
                date_add(col("day").cast("date"), 1).cast("string"))
                .otherwise(col("day"))),
          Seq("event_id"), "day")
        q.processAllAvailable()
        // epoch 3: pure compaction mid-stream — MUST stream zero rows
        SnapshotMerge.compact(gs, a, maxFilesPerPartition = 0)
        q.processAllAvailable()
        // epoch 4: %10 ∈ {0,9} — 0 matched (×2), 9 inserts (×2)
        SnapshotMerge.upsert(gs, a,
          ev.filter(col("event_id") % 10 === 0 || col("event_id") % 10 === 9)
            .withColumn("value", col("value") * lit(2.0)),
          Seq("event_id"), "day")
        q.processAllAvailable()
      } finally q.stop()
      // streaming receipt, the StreamingOracle convention: trigger
      // count + input rows from the engine's own progress metrics
      val prog = q.recentProgress
      StreamingOracle.triggerCounts.put("q112",
        prog.map(_.batchId).distinct.length)
      StreamingOracle.gateReceipts.put("q112", StreamingOracle.GateReceipt(
        "q112",
        triggers = prog.map(_.batchId).distinct.length,
        inputRows = prog.filter(_.numInputRows > 0).map(_.numInputRows).sum,
        stateOperators = 0, stateRowsFinal = 0, stateRowsUpdated = 0,
        lateRowsDropped = 0))
      b
    })

  /** q112 — per-day rollup of the DOWNSTREAM store after the streamed
    * medallion hop (bootstrap + 2 merges + 1 compact upstream). */
  def snapshotChainRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Det.dsum
    SnapshotMerge.read(spark, q112Downstream(spark, sfDir))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("day").asc_nulls_last)
  }

  private val q112Sql = {
    val dsum = graft.functions.Det.sqlDsum _
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type, value,
       |         cast(cast(ts AS date) AS varchar) AS day
       |  FROM events),
       |v0 AS (SELECT * FROM ev WHERE event_id % 10 < 7),
       |u1 AS (
       |  SELECT event_id, user_id, event_type, value + 1000.0 AS value,
       |         CASE WHEN event_id % 10 = 6
       |              THEN cast(cast(day AS date) + INTERVAL 1 DAY AS date)::varchar
       |              ELSE day END AS day
       |  FROM ev WHERE event_id % 10 IN (5, 6, 8)),
       |s1 AS (
       |  SELECT * FROM v0 WHERE event_id NOT IN (SELECT event_id FROM u1)
       |  UNION ALL SELECT * FROM u1),
       |u2 AS (
       |  SELECT event_id, user_id, event_type, value * 2.0 AS value, day
       |  FROM ev WHERE event_id % 10 IN (0, 9)),
       |s2 AS (
       |  SELECT * FROM s1 WHERE event_id NOT IN (SELECT event_id FROM u2)
       |  UNION ALL SELECT * FROM u2)
       |SELECT day, count(*) AS n, ${dsum("value")} AS total_value
       |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def all: Seq[graft.Q] = Seq(
    graft.Q("q112_snapshot_stream_chain",
      (s, d) => snapshotChainRollup(s, d), Some(q112Sql)))

  private[streaming] def storeOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot stream needs .option(\"path\", <store>) — the SnapshotMerge store root"))

  /** The store's logical schema at stream start: the TIP manifest's.
    * An empty store cannot start a stream (no schema to pin) — same
    * contract as streaming from a not-yet-created Delta table. */
  private[streaming] def pinnedStoreSchema(
      spark: SparkSession, parameters: Map[String, String]): StructType = {
    val store = storeOf(parameters)
    SnapshotMerge.latestSnapshot(spark, store).map(_.schema).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot at $store — bootstrap the store (one " +
          "upsert) before streaming from it"))
  }

  private[streaming] def streamSchema(storeSchema: StructType): StructType =
    storeSchema.add("_change_type", StringType, nullable = false)
      .add("_commit_epoch", LongType, nullable = false)
}

class SnapshotStreamSource(
    spark: SparkSession,
    parameters: Map[String, String],
    metadataPath: Option[String] = None) extends Source {

  private val store = SnapshotStream.storeOf(parameters)
  private val withDeletes =
    parameters.getOrElse("withDeletes", "true").toBoolean
  private val maxEpochsPerTrigger =
    parameters.get("maxEpochsPerTrigger").map(_.toLong)
      .getOrElse(Long.MaxValue)
  require(maxEpochsPerTrigger >= 1, "maxEpochsPerTrigger must be >= 1")

  private val paced = maxEpochsPerTrigger != Long.MaxValue

  private val pinned: StructType =
    SnapshotStream.pinnedStoreSchema(spark, parameters)
  override val schema: StructType = SnapshotStream.streamSchema(pinned)

  // Last offset this source HANDED OUT — the pacing floor. The engine's
  // checkpoint, not this field, is the processed truth; pacing only
  // bounds how far PAST it a batch may reach. A paced source persists
  // the floor under the stream's own metadata dir so a RESTART against
  // a backlogged store does not hand the uncapped tip to the first
  // poll (the one batch pacing exists to bound); getBatch also seeds it
  // from every range the engine replays. A stale/lost floor file only
  // widens one batch — never skips data, because the engine pairs each
  // offered end with its own committed start.
  //
  // DELIBERATE EXEMPTION: a FRESH stream's first batch is the INITIAL
  // SNAPSHOT (fromE = None → the whole table at the tip) — the same
  // unpaced first batch Delta's source takes. Capping the first offset
  // would not shrink it (a snapshot at ANY epoch is roughly the whole
  // table) and could pin the stream to a vacuumed epoch; pacing
  // governs the epoch RANGE of every batch after the floor seeds.
  @volatile private var lastPolled: Option[Long] =
    if (paced) readPacingFloor() else None

  private def pacingFloorPath: Option[Path] =
    metadataPath.map(m => new Path(m, "graft_pacing_floor"))

  private def readPacingFloor(): Option[Long] =
    pacingFloorPath.flatMap { p =>
      try {
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          val text = try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
          finally in.close()
          scala.util.Try(text.toLong).toOption
        }
      } catch { case _: Throwable => None }
    }

  private def writePacingFloor(v: Long): Unit =
    pacingFloorPath.foreach { p =>
      try {
        // tmp + rename-overwrite, never truncate in place: a crash
        // between an in-place create and its write would leave an
        // EMPTY floor that reads back as "no floor" — the exact
        // unbounded recovery batch the file exists to prevent (r16
        // review; a merely stale floor only widens one batch)
        val conf = spark.sessionState.newHadoopConf()
        val fs = p.getFileSystem(conf)
        val tmp = new Path(p.getParent, s".${p.getName}.tmp")
        val out = fs.create(tmp, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch { case _: Throwable => () } // best-effort: pacing, not truth
    }

  private def advanceFloor(v: Long): Unit = {
    if (lastPolled.forall(_ < v)) {
      lastPolled = Some(v)
      if (paced) writePacingFloor(v)
    }
  }

  override def getOffset: Option[OffsetV1] = {
    val tip = SnapshotMerge.committedEpochs(spark, store).lastOption
    val capped = (tip, lastPolled) match {
      case (Some(t), Some(l)) if t - l > maxEpochsPerTrigger =>
        Some(math.max(l + maxEpochsPerTrigger, 1L))
      case (t, _) => t
    }
    capped.foreach(advanceFloor)
    capped.map(LongOffset(_))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val toE = epochOf(end)
    val fromE = start.map(epochOf)
    advanceFloor(toE) // recovery replays re-seed the pacing floor
    val have = SnapshotMerge.committedEpochs(spark, store).toSet
    (fromE.toSeq :+ toE).foreach { e =>
      require(have(e),
        s"epoch $e of $store is no longer committed (vacuumed?) — the " +
          "store's retention must cover the stream's checkpoint lag; " +
          "raise vacuum(keep) past the longest recovery window")
    }
    val batch = fromE match {
      case None => // initial snapshot: everything at toE is an insert
        SnapshotMerge.read(spark, store, Some(toE))
          .withColumn("_change_type", lit("insert"))
      case Some(f) =>
        SnapshotMerge.streamingChanges(spark, store, f, toE, withDeletes)
    }
    val out = batch
      .withColumn("_commit_epoch", lit(toE))
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    asStreamingFrame(out)
  }

  /** The v1-source contract requires the returned frame's plan to BE
    * streaming, but its INTERNALS must stay a batch plan — marking the
    * parquet leaves streaming would make `IncrementalExecution` plan
    * the diff's aggregates as STATEFUL streaming aggregates (state
    * stores accumulating across triggers — wrong results). The
    * `LogicalRDD(isStreaming = true)` barrier gives both: the node
    * reports streaming to the engine while its RDD lineage executes
    * the already-planned batch diff (the same shape `MemoryStream`
    * returns its batches with). */
  private def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true)(cs))
  }

  private def epochOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}
