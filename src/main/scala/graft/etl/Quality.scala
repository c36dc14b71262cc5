package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11/P12/S13 — rule-driven data-quality validation
  * (reference: etl_framework.py:125-206, consumer.py:283-296).
  *
  * Each rule is (tag, violation predicate). `validate` appends
  * `_dq_errors` (comma-joined violated tags), `_dq_valid`, and a
  * `_dq_score` of 1 − violations/len(rules) — all pure column
  * expressions, fully codegen'd, no shuffle.
  */
object Quality {
  final case class Rule(tag: String, violated: Column)

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val tags = array(rules.map(r => when(r.violated, lit(r.tag))): _*)
    df.withColumn("_dq_errors", array_join(filter(tags, _.isNotNull), ","))
      .withColumn("_dq_valid", col("_dq_errors") === "")
      .withColumn("_dq_score",
        lit(1.0) - size(filter(tags, _.isNotNull)).cast("double") / rules.size.toDouble)
  }

  /** S13 — split a validated frame into (clean, quarantine). The
    * quarantine side keeps the error tags for later inspection. */
  def quarantine(validated: DataFrame): (DataFrame, DataFrame) =
    (validated.filter(col("_dq_valid")), validated.filter(!col("_dq_valid")))
}
