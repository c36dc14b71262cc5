package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector operations over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so Catalyst sees through them and the hot path stays in the
  * optimized expression interpreter.
  */
object VectorOps {

  /** Dot product with per-element promotion to double (float*float in
    * single precision would lose bits). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. Assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-hyperplane LSH bucket id in [0, 2^planes). The plane
    * weights are pseudo-random ±1 derived from xxhash64(plane*dim + dim) —
    * deterministic across runs and engines, no trained state. Vectors
    * close in cosine land in the same bucket with high probability; used
    * to prune candidate pairs from O(n²) to near-linear.
    */
  def lshBucket(vecCol: String, planes: Int, dims: Int): Column = expr(
    s"""aggregate(sequence(0, ${planes - 1}), 0, (acc, p) ->
       |  acc + IF(aggregate(sequence(0, ${dims - 1}), cast(0.0 as double), (s, d) ->
       |    s + IF((xxhash64(p * $dims + d) & 1) = 1,
       |           cast(element_at($vecCol, d + 1) as double),
       |           -cast(element_at($vecCol, d + 1) as double))) > 0,
       |    shiftleft(1, p), 0))""".stripMargin)
}
