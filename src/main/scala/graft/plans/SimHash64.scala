package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array (Charikar/Manku document
  * fingerprint; reference analog: the content-similarity dedup tier the
  * LSH pipelines feed): each DISTINCT token hash casts a ±1 vote on
  * every bit position, and the fingerprint sets bit b iff the summed
  * vote is positive.
  *
  * Semantically identical to the composed pipeline — explode
  * `array_distinct(transform(tokens, t -> xxhash64(t)))` to rows, run
  * 64 `SUM(IF(bit set, 1, -1))` aggregates per doc, reassemble the bits
  * — because the fingerprint is a pure function of the distinct
  * token-HASH set and this expression uses the same XxHash64/seed-42
  * hash. But the composed form pays an exploded-row blow-up (one row
  * per token), a doc_id shuffle, and a 64-column aggregate; this is one
  * MAP-SIDE pass with 64 counters of local state, inside whole-stage
  * codegen. At 100 TB the fingerprint stage becomes pure scan work —
  * the [[RollingMinHash]] posture for the simhash tier.
  *
  * Null array → null; null elements are skipped (token arrays from
  * `split` never contain them).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[SimHash64].getName
      s"${ev.value} = $cls.simhash($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("simhash64")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "simhash64")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "usage: simhash64(array<string> tokens)")
    SimHash64(args.head)
  }

  /** Static so interpreted eval and generated code share one definition
    * (the [[RollingMinHash]] pattern). `XxHash64Function.hash` is the
    * exact engine hash behind the `xxhash64` SQL function at its
    * default seed 42, so fingerprints are bit-identical to the composed
    * formulation. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        if (seen.add(h)) {
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) res |= (1L << b); b += 1 }
    res
  }
}
