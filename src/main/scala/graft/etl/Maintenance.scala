package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** S9 — compaction + Z-ORDER analog (reference: delta_setup.py:523-546,
  * 395-431). Spark has no OPTIMIZE; ours is an explicit rewrite job:
  * `repartitionByRange` on the clustering keys gives each output file a
  * tight key range, and `sortWithinPartitions` orders rows inside files —
  * parquet min/max row-group stats then give data skipping on those keys,
  * which is what Z-ORDER buys on Delta.
  */
object Maintenance {

  def compactAndCluster(df: DataFrame, clusterCols: Seq[String], numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)

  def rewriteClustered(spark: SparkSession, dir: String,
                       clusterCols: Seq[String], numFiles: Int): Unit = {
    val tmp = dir.stripSuffix("/") + "__compacted"
    compactAndCluster(spark.read.parquet(dir), clusterCols, numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    import org.apache.hadoop.fs.Path
    // swap via rename, never delete-before-rename: a crash mid-swap
    // leaves the data in either `dir` or `dir__old`, not gone
    val old = new Path(dir.stripSuffix("/") + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(new Path(dir), old)
    if (!fs.rename(new Path(tmp), new Path(dir))) {
      fs.rename(old, new Path(dir)) // roll back
      throw new java.io.IOException(s"compaction swap failed for $dir")
    }
    fs.delete(old, true)
  }
}
