package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * tables. Oracle-less queries get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
