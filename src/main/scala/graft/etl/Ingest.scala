package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion-side projections and derivations
  * (reference: real_time_streaming.py:155-179, etl_framework.py:286-359).
  */
object Ingest {

  /** P1 — parse a JSON string column against a schema and star-expand it,
    * keeping provenance columns (reference: real_time_streaming.py:155-167). */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType,
                keep: Seq[String]): DataFrame = {
    df.withColumn("__parsed", from_json(col(jsonCol), schema))
      .select(keep.map(col) :+ col("__parsed.*"): _*)
  }

  /** P2 — ingestion timestamp stamp. */
  def stampIngestion(df: DataFrame): DataFrame =
    df.withColumn("ingestion_timestamp", current_timestamp())

  /** P3 — partition-column derivation from an event-time column
    * (reference: etl_framework.py:286-291). These become physical
    * partition dirs on write → partition pruning for every date-filtered
    * query downstream. */
  def withPartitionCols(df: DataFrame, tsCol: String, withHour: Boolean = false): DataFrame = {
    val base = df
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
    if (withHour) base.withColumn("hour", hour(col(tsCol))) else base
  }

  /** P9 — string cleaning: trim, empty→null, uppercase standardization
    * (reference: etl_framework.py:344-352, intended semantics). */
  def cleanString(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** P10 — IPv4-shaped validation via regexp, non-match → null
    * (reference: etl_framework.py:354-359). */
  def validIpOrNull(c: Column): Column = {
    val m = regexp_extract(c, "^(\\d{1,3}\\.){3}\\d{1,3}$", 0)
    when(m === "", lit(null)).otherwise(m)
  }
}
