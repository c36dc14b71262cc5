package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native ENGINE-PORTABLE SimHash over a token array: the md5-nibble
  * fingerprint the DuckDB oracle reproduces bit-for-bit (reference
  * analog: the content-similarity dedup tier), returned as the four
  * 16-bit band ints `[b_0, b_1, b_2, b_3]` the banded LSH join keys on
  * (bit j of band k = fingerprint bit 16k + j).
  *
  * Semantically identical to the composed pipeline — explode
  * `array_distinct(tokens)`, take the first 16 hex nibbles of each
  * token's md5 (hex char → value via ascii arithmetic), run 64
  * `SUM(IF(nibble bit set, 1, -1))` vote aggregates per doc, reassemble
  * band ints from the vote signs — because the fingerprint is a pure
  * function of the distinct token set and MessageDigest("MD5") is the
  * same digest `md5()` evaluates. But the composed form pays one
  * exploded row per (doc, token), a doc_id shuffle, and a 64-column
  * aggregate; this is one map-side pass with 64 local vote counters
  * inside whole-stage codegen — at 100 TB the portable fingerprint
  * stage becomes pure scan work (the [[SimHash64]] posture, applied to
  * the portable tier).
  *
  * Null array → null (the composed form's explode drops such docs —
  * callers filter the null rows to keep the frames identical); null
  * elements are skipped (`split` never produces them).
  */
case class Md5SimHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5_bands expects array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_md5_bands"

  override def nullSafeEval(input: Any): Any =
    Md5SimHashBands.bands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[Md5SimHashBands].getName
      s"${ev.value} = $cls.bands($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashBands =
    copy(child = newChild)
}

object Md5SimHashBands {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("simhash_md5_bands")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5SimHashBands].getName, "simhash_md5_bands")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "usage: simhash_md5_bands(array<string> tokens)")
    Md5SimHashBands(args.head)
  }

  /** Static so interpreted eval and generated code share one definition.
    * Dedup is on the token STRING (matching `array_distinct` before the
    * digest); fingerprint bit 4i+j is bit j of the md5's i-th hex nibble
    * — nibble i of the digest's first 8 bytes, high nibble first,
    * exactly the value `ascii(substring(hex, i+1, 1))` arithmetic
    * recovers from the lowercase hex string. */
  def bands(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t)) {
          val d = md.digest(t.getBytes) // digest() resets for the next token
          var b = 0
          while (b < 64) {
            val byte8 = d(b >> 3) & 0xff
            // even nibble index = high half of the byte (hex prints high first)
            val nib = if (((b >> 2) & 1) == 0) byte8 >>> 4 else byte8 & 0xf
            if (((nib >>> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Int](4)
    var k = 0
    while (k < 4) {
      var band = 0
      var j = 0
      while (j < 16) { if (votes(16 * k + j) > 0) band |= (1 << j); j += 1 }
      out(k) = band
      k += 1
    }
    new GenericArrayData(out)
  }
}
