package graft.sources

import org.apache.spark.sql.SparkSession

/** Engine-stamped commit marker for keyed parquet stores that are
  * bootstrapped once (Overwrite) and then maintained by MERGE — the
  * replay guard every foreachBatch upsert sink needs (reference:
  * delta-lake/delta_setup.py's MERGE tables rely on Delta's log for
  * this; plain parquet stores carry their own marker instead).
  *
  * Two object-store traps this closes (r13 verdict/ADVICE lineage):
  *  - a `java.io.File` probe silently answers "missing" for any
  *    non-local filesystem, so every restart would re-take the
  *    first-write Overwrite branch and wipe merged state — the probe
  *    must go through the Hadoop `FileSystem` resolved from the path's
  *    OWN scheme;
  *  - gating on `_SUCCESS` alone couples the guard to the committer's
  *    configuration: under
  *    `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` (a
  *    standard object-store tuning) no `_SUCCESS` ever lands and the
  *    same wipe happens. The engine's own marker — written strictly
  *    AFTER the bootstrap write returns — is committer-independent.
  *
  * A half-written bootstrap has NEITHER file, so its retry re-runs the
  * same Overwrite (idempotent); MERGE maintenance rewrites day
  * partitions, never the store root, so the root marker survives.
  *
  * MIGRATION BOUNDARY (one-time, r14 review): a store committed by a
  * PRE-marker version of this engine under
  * `marksuccessfuljobs=false` has neither file and is, by
  * construction, indistinguishable from a half-written bootstrap — the
  * next batch would re-run the Overwrite over its merged state. Any
  * heuristic "adopt" (e.g. treating a non-empty dir as committed)
  * recreates exactly the replay bug this marker closes, so the engine
  * refuses to guess: adopting such a store is the operator's explicit
  * one-line step — call [[mark]] on the store root (or touch
  * `_GRAFT_COMMITTED` there) before resuming the stream. Stores whose
  * committer writes `_SUCCESS` need nothing. */
object CommitMarker {

  private val MarkerFile = "_GRAFT_COMMITTED"

  /** Store readiness: `_SUCCESS` (when the committer writes one) OR the
    * engine's own marker, probed through the path's own FileSystem. */
  def committed(spark: SparkSession, store: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    Seq("_SUCCESS", MarkerFile).exists { m =>
      val p = new org.apache.hadoop.fs.Path(store, m)
      p.getFileSystem(conf).exists(p)
    }
  }

  /** Stamp the engine's marker — call strictly after the bootstrap
    * write returns. */
  def mark(spark: SparkSession, store: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(store, MarkerFile)
    p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true).close()
  }
}
