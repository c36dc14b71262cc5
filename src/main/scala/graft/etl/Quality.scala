package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    // no rules = nothing can be violated: score 1.0, not 0/0 = NaN
    if (rules.isEmpty)
      df.withColumn("_dq_errors", lit(""))
        .withColumn("_dq_valid", lit(true))
        .withColumn("_dq_score", lit(1.0))
    else {
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

  /** S13 — quarantine with the reference's dead-letter error-context
    * envelope (consumer.py:167-203: what failed, when, where from). The
    * clean side is returned untouched; the quarantine side gains
    * `_dlq_error_tags` / `_dlq_source` / `_dlq_quarantined_at` so a DLQ
    * table is self-describing without a join back to the job run. */
  def quarantineWithContext(validated: DataFrame, source: String): (DataFrame, DataFrame) = {
    val (clean, bad) = quarantine(validated)
    val dlq = bad
      .withColumn("_dlq_error_tags", split(col("_dq_errors"), ","))
      .withColumn("_dlq_source", lit(source))
      .withColumn("_dlq_quarantined_at", current_timestamp())
    (clean, dlq)
  }

  /** Derive conformance rules mechanically from a declared StructType
    * (reference: topics.py:599-663 per-topic JSON-Schema validation —
    * required fields + enum domains). Non-nullable fields become
    * `null_<field>` rules; supplied enum domains become
    * `domain_<field>` rules (violated when the value is present but
    * outside the domain — nullability is the separate rule's job). */
  def rulesFromSchema(schema: StructType,
                      enums: Map[String, Seq[String]] = Map.empty): Seq[Rule] = {
    val required = schema.fields.filterNot(_.nullable).map { f =>
      Rule(s"null_${f.name}", col(f.name).isNull)
    }
    val domains = enums.toSeq.sortBy(_._1).map { case (name, domain) =>
      Rule(s"domain_$name", col(name).isNotNull && !col(name).isin(domain: _*))
    }
    (required ++ domains).toSeq
  }
}
