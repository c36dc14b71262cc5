package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram generator: every `n`-CHARACTER window of a
  * string, as `array<string>` (the l50 heavy-trigram stream; the
  * lang-ID / boilerplate-detection feature space).
  *
  * Semantically identical to the composed form —
  * `transform(sequence(1, length(text)-n+1), i -> substring(text, i, n))`
  * for `length(text) >= n` (and the empty array below `n`, where the
  * composed form's descending sequence is never evaluated because every
  * caller filters `length >= n` first). Windows are SQL-substring
  * CHARACTER windows, so values match DuckDB's `substring(text, i, n)`
  * replay on any text, not just ASCII.
  *
  * Why native: each `substring(text, i, n)` call locates character `i`
  * by scanning UTF-8 bytes from the string START — the composed stream
  * is O(len²) per document plus an interpreted lambda per window. This
  * expression decodes the char→byte boundary table in ONE pass and
  * emits each window as a zero-copy slice of the parent byte array:
  * O(len) decode + O(1) per window.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, "ngram width must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[CharNgrams].getName
      s"${ev.value} = $cls.ngrams($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("char_ngrams")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharNgrams].getName, "char_ngrams")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2 && args(1).foldable,
      "usage: char_ngrams(text, <int literal ngram width>)")
    CharNgrams(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }

  /** Static so interpreted eval and generated code share one definition. */
  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var nChars = 0
    var b = 0
    while (b < nBytes) { b += UTF8String.numBytesForFirstByte(bytes(b)); nChars += 1 }
    val nWins = nChars - n + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    // offs(c) = byte offset where character c starts; offs(nChars) = end
    val offs = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < nBytes) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = nBytes
    val out = new Array[Any](nWins)
    var i = 0
    while (i < nWins) {
      val start = offs(i)
      out(i) = UTF8String.fromBytes(bytes, start, offs(i + n) - start)
      i += 1
    }
    new GenericArrayData(out)
  }
}
