package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 — the reference delegates skew to
  * AQE; these are the explicit tools for when a hot key defeats even
  * AQE's skew-split, e.g. a power-law user or a null-heavy join key).
  */
object Skew {

  /** Two-phase salted aggregation: spread each hot group over `saltBuckets`
    * partial groups, aggregate, then merge. Correct for decomposable
    * aggregates (sum/count/min/max). The partial pass gets map-side
    * combine on (key, salt); the merge pass groups only #keys×salt rows.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Salted broadcast-side replication for a skewed join: explode the
    * small side `saltBuckets`× with a salt column, salt the big side's
    * key row-wise, join on (key, salt). Distributes one hot key across
    * `saltBuckets` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
