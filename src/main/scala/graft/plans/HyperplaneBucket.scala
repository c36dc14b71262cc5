package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sign-random-hyperplane LSH bucket assignment for `array<float>`
  * vectors (≤64 dims per sign word). Each plane's ±1 weights are packed
  * into one long of sign bits fixed at plan time; codegen emits a compact
  * double loop, which keeps janino compile time negligible — the unrolled
  * 512-term column-expression form of this computation cost ~4.5 s of
  * one-time codegen compilation per session at 8 planes × 64 dims.
  */
case class HyperplaneBucket(child: Expression, signBits: Seq[Long])
    extends UnaryExpression {

  require(signBits.nonEmpty && signBits.size <= 30, "1..30 planes supported")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float>, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  private lazy val signs: Array[Long] = signBits.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), 64)
    var bucket = 0
    var p = 0
    while (p < signs.length) {
      val sb = signs(p)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = v.getFloat(d).toDouble
        dot += (if (((sb >>> d) & 1L) == 1L) x else -x)
        d += 1
      }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val sb = ctx.freshName("sb")
      val bucket = ctx.freshName("bucket"); val x = ctx.freshName("x")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), 64);
         |int $bucket = 0;
         |for (int $p = 0; $p < ${signs.length}; $p++) {
         |  long $sb = $signsRef[$p];
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $x = (double) $v.getFloat($d);
         |    $dot += ((($sb >>> $d) & 1L) == 1L) ? $x : -$x;
         |  }
         |  if ($dot > 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Deterministic pseudo-random sign words (seed fixed → stable buckets
    * across runs and stages). */
  def randomSigns(planes: Int, seed: Long = 42L): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(rnd.nextLong())
  }
}
