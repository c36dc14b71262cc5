package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P15/A7 — incremental high-watermark processing
  * (reference: etl_framework.py:216-249).
  *
  * The `agg(max).head` here is the one sanctioned driver-side collect in
  * the engine: a single scalar per incremental run. Everything downstream
  * stays distributed, and the watermark predicate is a plain comparison
  * that pushes down to the parquet scan (min/max row-group skipping).
  */
object Incremental {

  /** Scalar high watermark of `target`, or None when the target is empty. */
  def highWatermark(target: DataFrame, watermarkCol: String): Option[java.sql.Timestamp] = {
    val row = target.agg(max(col(watermarkCol))).head()
    if (row.isNullAt(0)) None else Some(row.getTimestamp(0))
  }

  /** Rows of `source` strictly newer than the target's watermark. */
  def newRows(source: DataFrame, target: DataFrame, watermarkCol: String): DataFrame =
    highWatermark(target, watermarkCol) match {
      case Some(wm) => source.filter(col(watermarkCol) > lit(wm))
      case None     => source
    }
}
