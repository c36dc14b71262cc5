package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native ENGINE-PORTABLE 16-slot MinHash over a token array: the
  * md5-substring signature the DuckDB oracle reproduces bit-for-bit
  * (reference analog: the LSH dedup tier, in its portable clothing).
  *
  * Semantically identical to the composed pipeline — word-3-gram
  * shingle strings (`concat_ws(' ', t1, t2, t3)`), `array_distinct`,
  * explode to rows, then slot 4j+w = `min(substring(md5('j:' || sh),
  * 1 + 8w, 8))` — because the digest is the same MD5 and the
  * lexicographic minimum over fixed-width lowercase hex strings is
  * exactly the numeric minimum over the unsigned 32-bit words they
  * encode (same total order), which is how this expression computes it:
  * four digests per distinct shingle, sixteen running uint32 minima,
  * hex-formatted once at the end. But the composed form pays one
  * exploded row per (doc, shingle), a doc_id shuffle, a 16-column
  * string-min aggregate, and per-row md5/substring expression overhead;
  * this is one map-side pass inside whole-stage codegen. At 100 TB the
  * portable signature stage — the dominant dedup cost — becomes pure
  * scan work (the [[MinHash16]] posture, applied to the portable tier).
  *
  * Arrays with fewer than 3 tokens (no shingle exists) and null arrays
  * return null — the composed form's `size >= 3` filter drops such
  * docs; callers filter the null rows to keep frames identical. Null
  * elements are skipped by the shingle join (`concat_ws` semantics;
  * `split` never produces them).
  */
case class MinHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 expects array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5"

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[MinHashMd5].getName
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = $cls.signature($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHashMd5 {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("minhash_md5")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashMd5].getName, "minhash_md5")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "usage: minhash_md5(array<string> tokens)")
    MinHashMd5(args.head)
  }

  private val HexDigits = "0123456789abcdef".getBytes

  /** Static so interpreted eval and generated code share one definition.
    * Returns null (drop the doc) below 3 tokens. */
  def signature(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    // token byte slices once; null tokens skipped like concat_ws does
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(16)(0xffffffffL)
    val seen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i <= n - 3) {
      val sh = joinWs(toks, i) // concat_ws(' ', t_i, t_i+1, t_i+2) bytes
      if (seen.add(UTF8String.fromBytes(sh))) {
        var j = 0
        while (j < 4) {
          // md5('j:' || sh)
          md.update(('0' + j).toByte)
          md.update(':'.toByte)
          md.update(sh)
          val d = md.digest() // resets for the next shingle
          var w = 0
          while (w < 4) {
            // substring(hex, 1 + 8w, 8) as its unsigned 32-bit value —
            // lexicographic min over the hex IS numeric min over this
            val v = ((d(4 * w) & 0xffL) << 24) | ((d(4 * w + 1) & 0xffL) << 16) |
              ((d(4 * w + 2) & 0xffL) << 8) | (d(4 * w + 3) & 0xffL)
            val s = 4 * j + w
            if (v < mins(s)) mins(s) = v
            w += 1
          }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](16)
    var s = 0
    while (s < 16) {
      val hex = new Array[Byte](8)
      var k = 0
      while (k < 8) {
        hex(k) = HexDigits(((mins(s) >>> (4 * (7 - k))) & 0xf).toInt)
        k += 1
      }
      out(s) = UTF8String.fromBytes(hex)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** `concat_ws(' ', …)` over three token slots: null slots are skipped
    * entirely (no separator), exactly the SQL semantics. */
  private def joinWs(toks: Array[Array[Byte]], i: Int): Array[Byte] = {
    var len = 0
    var parts = 0
    var k = i
    while (k < i + 3) {
      if (toks(k) != null) { len += toks(k).length; parts += 1 }
      k += 1
    }
    val out = new Array[Byte](len + math.max(0, parts - 1))
    var pos = 0
    var first = true
    k = i
    while (k < i + 3) {
      val t = toks(k)
      if (t != null) {
        if (!first) { out(pos) = ' '.toByte; pos += 1 }
        System.arraycopy(t, 0, out, pos, t.length)
        pos += t.length
        first = false
      }
      k += 1
    }
    out
  }
}
