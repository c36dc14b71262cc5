package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 — dedup-keep-latest (reference: etl_framework.py:251-277).
  *
  * `row_number()` over (partition by business keys, order by recency desc)
  * and keep rank 1. Scale notes: this is a single hash-partitioned shuffle
  * on the dedup keys; no driver-side state. Skewed keys are handled by AQE
  * (enabled in the session); the tie-breaker columns make the survivor
  * deterministic, which the reference's bare `orderBy(ts.desc)` is not.
  */
object Dedup {
  def keepLatest(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
