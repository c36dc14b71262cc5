package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.etl.Ingest

/** S4/S6 — partitioned batch writers (reference: batch_generator.py:276-339,
  * etl_framework.py:575-579). Partition columns are *data columns derived
  * from event time* (P3), so date-filtered queries downstream get
  * partition pruning for free.
  */
object Writers {

  /** One time-partitioned writer for every output format the reference's
    * generator produces (parquet/JSONL/CSV). */
  def writePartitioned(df: DataFrame, tsCol: String, path: String,
                       mode: SaveMode = SaveMode.Append,
                       withHour: Boolean = false,
                       format: String = "parquet"): Unit = {
    val cols = if (withHour) Seq("year", "month", "day", "hour") else Seq("year", "month", "day")
    val w = Ingest.withPartitionCols(df, tsCol, withHour)
      .write.mode(mode).partitionBy(cols: _*)
    (if (format == "csv") w.option("header", "true") else w).format(format).save(path)
  }

  def writeJsonl(df: DataFrame, tsCol: String, path: String,
                 mode: SaveMode = SaveMode.Append): Unit =
    writePartitioned(df, tsCol, path, mode, format = "json")

  def writeCsv(df: DataFrame, tsCol: String, path: String,
               mode: SaveMode = SaveMode.Append): Unit =
    writePartitioned(df, tsCol, path, mode, format = "csv")

  /** Bucketed+sorted managed table: two tables bucketed on the same join
    * key join with NO exchange and no sort — the co-located join that
    * makes repeated fact⋈fact joins affordable at 100 TB (pay the shuffle
    * once at write time, reuse it every query). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    writeBucketedSorted(df, tableName, bucketCol, numBuckets, Seq(bucketCol))

  /** Bucketed table with a declared IN-BUCKET sort order beyond the key
    * (e.g. (user_id, ts) for as-of/sessionization reads). Spark's scan
    * only trusts bucket sort metadata when each bucket holds EXACTLY ONE
    * file, so the frame is pre-shuffled to one task per bucket on the
    * bucket key — same hash function (`HashPartitioning` on the column),
    * so every row still lands in its declared bucket, and the write-side
    * sort is a per-task (= per-bucket) sort, not a global one. Readers
    * clustered AND ordered on these columns (merge as-of, SMJ,
    * sessionization windows) then plan ZERO exchanges and ZERO sorts on
    * this side. */
  def writeBucketedSorted(df: DataFrame, tableName: String, bucketCol: String,
                          numBuckets: Int, sortCols: Seq[String]): Unit =
    df.repartition(numBuckets, df(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
