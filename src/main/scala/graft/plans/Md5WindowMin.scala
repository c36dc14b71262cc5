package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native min-of-md5-over-windows document fingerprint: the minimum md5
  * hex digest over every `width`-CHARACTER window of a string
  * (winnowing-style robust content id; the l13 portable fingerprint).
  *
  * Semantically identical to the composed pipeline —
  * `array_min(transform(sequence(1, greatest(length(text)-w+1, 1)),
  * i -> md5(substring(text, i, w))))` — because the digest is the same
  * MD5 over the same SQL-substring character windows, and the string
  * minimum over equal-length lowercase hex is exactly the unsigned
  * byte-wise minimum over the digests, which is how this expression
  * tracks it (one 16-byte compare per window, hex-formatted once at the
  * end). The composed form materializes an index array and runs an
  * interpreted lambda with a substring + hex-string allocation per
  * window; this is one codegen'd pass. Strings shorter than `width`
  * fingerprint as the single window `substring(text, 1, w)` (the whole
  * string), like the composed form's `greatest(…, 1)` floor.
  */
case class Md5WindowMin(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1 && width <= 64, "window width must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_window_min expects a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_window_min"

  override def nullSafeEval(input: Any): Any =
    Md5WindowMin.winMin(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[Md5WindowMin].getName
      s"${ev.value} = $cls.winMin($s, $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5WindowMin =
    copy(child = newChild)
}

object Md5WindowMin {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("md5_window_min")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5WindowMin].getName, "md5_window_min")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2 && args(1).foldable,
      "usage: md5_window_min(text, <int literal window width>)")
    Md5WindowMin(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }

  private val HexDigits = "0123456789abcdef".getBytes

  /** Static so interpreted eval and generated code share one definition.
    * Windows are SQL-substring CHARACTER windows, so the values match
    * the composed formulation on any text, not just ASCII — but the
    * char→byte boundaries are computed in ONE pass over the doc
    * (per-window `substringSQL` re-scans from the string start, which
    * is quadratic in doc length), and each window digests a byte RANGE
    * with no substring allocation. */
  def winMin(text: UTF8String, width: Int): UTF8String = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // offs(c) = byte offset where character c starts; offs(nChars) = end
    var nChars = 0
    var b = 0
    while (b < nBytes) { b += UTF8String.numBytesForFirstByte(bytes(b)); nChars += 1 }
    val offs = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = nBytes
    val nWins = math.max(nChars - width + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    var i = 0
    while (i < nWins) {
      val start = offs(math.min(i, nChars))
      val end = offs(math.min(i + width, nChars))
      md.update(bytes, start, end - start)
      val d = md.digest() // resets for the next window
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    val hex = new Array[Byte](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HexDigits((min(k) >>> 4) & 0xf)
      hex(2 * k + 1) = HexDigits(min(k) & 0xf)
      k += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }
}
