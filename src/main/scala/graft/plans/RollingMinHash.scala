package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint: the minimum of a Karp–Rabin rolling hash
  * over every `width`-byte window of a string, in one codegen'd pass.
  *
  * The composed form (`array_min(transform(sequence(...), i ->
  * hash(substring(text, i, w))))`) materializes an index array, runs the
  * lambda in the interpreted evaluator, and allocates a fresh substring
  * per window — measured ~24 s per GB of text regardless of the hash
  * inside, because the window plumbing dominates. This expression keeps
  * O(1) state per window (one multiply-add in, one multiply-subtract
  * out), no allocation, and stays inside whole-stage codegen — the shape
  * a per-ingest-batch fingerprint needs at 100 TB.
  *
  * Windows slide over UTF-8 BYTES (fixed-width windows over code points
  * would need a per-window scan again); a string shorter than `width`
  * hashes as a single window. Wrapping two's-complement arithmetic —
  * deterministic everywhere, immune to ANSI overflow checks.
  */
case class RollingMinHash(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1 && width <= 64, "window width must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash expects a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingMinHash.minHash(bytes, width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[RollingMinHash].getName
      s"${ev.value} = $cls.minHash($s.getBytes(), $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("rolling_min_hash")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingMinHash].getName, "rolling_min_hash")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2 && args(1).foldable,
      "usage: rolling_min_hash(text, <int literal window width>)")
    RollingMinHash(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }

  /** FNV-1a 64-bit prime as the polynomial base: odd (invertible mod
    * 2^64, so windows don't collapse) and empirically well-mixing. */
  final val Mult: Long = 0x100000001b3L

  /** Static so both interpreted eval and generated code share one
    * implementation (the codegen emits a single call — the JIT inlines
    * the loop, and there is exactly one definition of the semantics). */
  def minHash(bytes: Array[Byte], width: Int): Long = {
    val n = bytes.length
    var h = 0L
    var i = 0
    if (n <= width) { // single window over the whole (possibly empty) string
      while (i < n) { h = h * Mult + (bytes(i) & 0xffL); i += 1 }
      return h
    }
    // seed window [0, width)
    while (i < width) { h = h * Mult + (bytes(i) & 0xffL); i += 1 }
    var minH = h
    // Mult^(width-1), for removing the outgoing byte
    var bw = 1L
    var k = 1
    while (k < width) { bw *= Mult; k += 1 }
    while (i < n) {
      h = (h - (bytes(i - width) & 0xffL) * bw) * Mult + (bytes(i) & 0xffL)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  /** The argmin twin of [[minHash]]: the WINDOW BYTES achieving the
    * rolling minimum (first occurrence on hash ties — every occurrence
    * of the same window string hashes equally, so the returned bytes are
    * a pure function of the text whenever distinct windows don't collide
    * at 64 bits). Same loop, same hash, one extra position register. */
  def argminWindow(bytes: Array[Byte], width: Int): UTF8String = {
    val n = bytes.length
    if (n <= width) return UTF8String.fromBytes(bytes)
    var h = 0L
    var i = 0
    while (i < width) { h = h * Mult + (bytes(i) & 0xffL); i += 1 }
    var minH = h
    var minPos = 0
    var bw = 1L
    var k = 1
    while (k < width) { bw *= Mult; k += 1 }
    while (i < n) {
      h = (h - (bytes(i - width) & 0xffL) * bw) * Mult + (bytes(i) & 0xffL)
      if (h < minH) { minH = h; minPos = i - width + 1 }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, minPos, minPos + width))
  }
}

/** `rolling_argmin_window(text, w)` — the window SUBSTRING behind
  * [[RollingMinHash]]'s minimum (byte windows, like the hash; on ASCII
  * text byte and character windows coincide). Lets an audit reason about
  * fast-fingerprint classes in O(corpus) — docs with equal
  * `rolling_min_hash` must (collision-free) carry the identical argmin
  * window, so class soundness becomes a per-class distinct count instead
  * of an all-pairs window-overlap join. */
case class RollingArgminWindow(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1 && width <= 64, "window width must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_argmin_window expects a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_argmin_window"

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.argminWindow(input.asInstanceOf[UTF8String].getBytes, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[RollingMinHash].getName
      s"${ev.value} = $cls.argminWindow($s.getBytes(), $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingArgminWindow =
    copy(child = newChild)
}

object RollingArgminWindow {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("rolling_argmin_window")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingArgminWindow].getName, "rolling_argmin_window")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2 && args(1).foldable,
      "usage: rolling_argmin_window(text, <int literal window width>)")
    RollingArgminWindow(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }
}
