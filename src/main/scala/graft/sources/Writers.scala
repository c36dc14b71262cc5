package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.etl.Ingest

/** S4/S6 — partitioned batch writers (reference: batch_generator.py:276-339,
  * etl_framework.py:575-579). Partition columns are *data columns derived
  * from event time* (P3), so date-filtered queries downstream get
  * partition pruning for free.
  */
object Writers {

  /** Append/overwrite a time-partitioned parquet table. */
  def writePartitioned(df: DataFrame, tsCol: String, path: String,
                       mode: SaveMode = SaveMode.Append,
                       withHour: Boolean = false): Unit = {
    val cols = if (withHour) Seq("year", "month", "day", "hour") else Seq("year", "month", "day")
    Ingest.withPartitionCols(df, tsCol, withHour)
      .write.mode(mode).partitionBy(cols: _*).parquet(path)
  }

  def writeJsonl(df: DataFrame, tsCol: String, path: String): Unit =
    Ingest.withPartitionCols(df, tsCol)
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month", "day").json(path)

  def writeCsv(df: DataFrame, tsCol: String, path: String): Unit =
    Ingest.withPartitionCols(df, tsCol)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .partitionBy("year", "month", "day").csv(path)

  /** Bucketed+sorted managed table: two tables bucketed on the same join
    * key join with NO exchange and no sort — the co-located join that
    * makes repeated fact⋈fact joins affordable at 100 TB (pay the shuffle
    * once at write time, reuse it every query). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
