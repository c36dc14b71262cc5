package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key. Spark has no built-in; the naive
  * formulation (non-equi join + max) is a BroadcastNestedLoop trap.
  *
  * This implementation is the scalable composition (brief preference (a)):
  * union both sides with a side marker, then one `last_value(...,
  * ignoreNulls)` window over (key, ts, marker) — a single hash shuffle on
  * the key, linear in total rows, ties resolved right-before-left so a
  * right row at exactly leftTs matches (DuckDB ASOF semantics).
  */
object AsOfJoin {

  /** `right` must be unique per (key, tsCol) — pre-dedup if not; payload
    * columns are taken from `valueCols`.
    *
    * The payloads travel as ONE struct (null for left rows, non-null —
    * even when its fields are null — for right rows), and a single
    * `last(..., ignoreNulls)` picks the latest right ROW as a unit. A
    * per-column fill would let a NULL field in the matched right row leak
    * an older row's value, or stitch fields from different rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    // Null keys never match under SQL ASOF equality, but Window.partitionBy
    // groups nulls together — filter null-key right rows so null-key left
    // rows correctly get a null payload.
    val rightTagged = right
      .filter(col(key).isNotNull)
      .select(col(key), col(tsCol), struct(valueCols.map(col): _*).as("__rv"))
      .withColumn("__side", lit(0))

    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // unionByName(allowMissingColumns) null-fills each side's missing
    // columns (left's payload slot, right's carried left columns)
    leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
