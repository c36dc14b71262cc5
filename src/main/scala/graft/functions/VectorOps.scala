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

  /** Cosine similarity via the native codegen'd expression
    * (graft.plans.CosineSimilarity) — one fused loop per row instead of
    * three interpreted HOF aggregates. Requires the function registered
    * (Tables.configure / GraftExtensions). Assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** HOF composition form, kept as the no-extension fallback. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-hyperplane LSH bucket id in [0, 2^planes), via the
    * native graft.plans.HyperplaneBucket expression: plane signs are
    * fixed at plan time (seeded PRNG), codegen emits a compact loop.
    * Vectors close in cosine land in the same bucket with high
    * probability; prunes candidate pairs from O(n²) to near-linear.
    * Supports up to 64 dims per sign word.
    */
  def lshBucket(vecCol: String, planes: Int, dims: Int): Column = {
    require(dims <= 64, "one sign word per plane: dims <= 64")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.HyperplaneBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
        graft.plans.HyperplaneBucket.randomSigns(planes)))
  }
}
