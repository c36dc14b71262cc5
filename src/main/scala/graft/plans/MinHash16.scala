package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native 16-slot MinHash over a token array (Broder resemblance
  * sketch; reference analog: the LSH dedup tier's fast signatures):
  * word-3-gram shingle ids from the engine's xxhash64, one permutation
  * per slot via a salted rehash, minimum per slot.
  *
  * Semantically identical to the composed pipeline — hash each token
  * (`xxhash64(t)`), shingle id = `xxhash64(h1, h2, h3)` over each
  * consecutive triple, `array_distinct`, explode to rows, sixteen
  * `min(xxhash64(i, sh))` aggregates per doc — because every hash here
  * is the same XxHash64/seed-42 fold the SQL function evaluates
  * (integer salt hashed first, then the shingle long). But the composed
  * form pays one exploded row per (doc, shingle), a doc_id shuffle, and
  * a 16-column aggregate; this is one map-side pass with 16 running
  * minima inside whole-stage codegen. At 100 TB the signature stage —
  * the dominant dedup cost — becomes pure scan work.
  *
  * Arrays with fewer than 3 tokens (no shingle exists) and null arrays
  * return null — the composed form's `size >= 3` filter and explode
  * drop such docs; callers filter the null rows to keep frames
  * identical. Null elements are skipped (`split` never produces them).
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash16 expects array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash16"

  override def nullSafeEval(input: Any): Any =
    MinHash16.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[MinHash16].getName
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = $cls.signature($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val identifier: FunctionIdentifier = FunctionIdentifier("minhash16")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHash16].getName, "minhash16")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "usage: minhash16(array<string> tokens)")
    MinHash16(args.head)
  }

  private val NumHashes = 16

  /** `xxhash64(i, sh)`'s salt prefix: the engine folds the integer
    * literal into the seed first, so the per-slot seed is a constant. */
  private val SlotSeeds: Array[Long] =
    Array.tabulate(NumHashes)(i => XXH64.hashInt(i, 42L))

  /** Static so interpreted eval and generated code share one definition.
    * `XxHash64Function.hash` / `XXH64.hashLong` are the exact engine
    * hashes behind the `xxhash64` SQL function's string and long folds
    * at the default seed 42, so signatures are bit-identical to the
    * composed formulation. Returns null (drop the doc) below 3 tokens. */
  def signature(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 42L // xxhash64(null) leaves the seed untouched
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      // xxhash64(h1, h2, h3): seed 42, longs folded left to right
      val sh = XXH64.hashLong(th(i + 2),
        XXH64.hashLong(th(i + 1), XXH64.hashLong(th(i), 42L)))
      if (seen.add(sh)) {
        var s = 0
        while (s < NumHashes) {
          val v = XXH64.hashLong(sh, SlotSeeds(s))
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
