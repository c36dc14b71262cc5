package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (len-64 float vectors).
  *
  *  - `cosinePairs` — fixed-pair cosine with an exact SQL oracle: the dot
  *    product is an explicit left-associated 64-term chain so Spark and
  *    DuckDB execute the identical IEEE operation sequence (bit-equal).
  *  - `bruteTopK` — the correctness baseline: O(probes × n), probes
  *    broadcast, never an n×n cross join.
  *  - `lshNearDup` / `ivfTopK` — the scale path: sign-random-hyperplane
  *    buckets prune candidates; at 1000 executors the bucket join shuffles
  *    ~n rows instead of n² pairs.
  */
object Similarity {

  private val Dims = 64
  private val Planes = 8
  // The fixed audit pair set shared by l06 and l46: (id, id+1) for
  // id < PairCutoff. l46's claim of auditing "the l06 pair set" holds
  // exactly as long as both read this constant.
  private val PairCutoff = 50

  /** Left-associated explicit dot chain — used where cross-engine
    * bit-identity matters (the SQL oracle mirrors the same chain). */
  private def dotChain(a: String, b: String) =
    (0 until Dims).map(i =>
      element_at(col(a), i + 1).cast("double") * element_at(col(b), i + 1).cast("double"))
      .reduce(_ + _)

  private def sqlDotChain(a: String, b: String) =
    (1 to Dims).map(i =>
      s"cast($a.embedding[$i] as double)*cast($b.embedding[$i] as double)").mkString(" + ")

  /** l06 — cosine for adjacent-id pairs (exact oracle). */
  def cosinePairs(embeddings: DataFrame): DataFrame = {
    val a = embeddings.filter(col("vec_id") < PairCutoff)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("cosine",
        dotChain("emb_a", "emb_b") /
          (sqrt(dotChain("emb_a", "emb_a")) * sqrt(dotChain("emb_b", "emb_b"))))
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a")
  }

  private val l06Sql =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       | (${sqlDotChain("a", "b")})
       |   / (sqrt(${sqlDotChain("a", "a")}) * sqrt(${sqlDotChain("b", "b")})) AS cosine
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
       |WHERE a.vec_id < $PairCutoff ORDER BY id_a""".stripMargin

  /** l07 — brute-force cosine top-k for a probe set. The probe side is
    * tiny and broadcast; cost is O(probes × n), fully parallel over n. */
  def bruteTopK(embeddings: DataFrame, numProbes: Int = 20, k: Int = 10): DataFrame = {
    val probes = embeddings.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val cands = embeddings
      .select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    cands.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("cos", VectorOps.cosine(col("probe_emb"), col("cand_emb")))
      .withColumn("nn_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))))
      .filter(col("nn_rank") <= k)
      .select("probe_id", "nn_rank", "cand_id", "cos")
      .orderBy("probe_id", "nn_rank")
  }

  // The native cosine_sim expression accumulates dot/na/nb in index order
  // (left-associated, double precision) — the identical IEEE sequence to
  // this explicit chain, so the oracle matches bit-for-bit (l06 proved
  // the chain form; the fused loop performs the same operations).
  private val l07Sql =
    s"""WITH s AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |    (${sqlDotChain("p", "c")})
       |      / (sqrt(${sqlDotChain("p", "p")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |  FROM embeddings p JOIN embeddings c ON p.vec_id < 20 AND p.vec_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS nn_rank
       |      FROM s)
       |SELECT probe_id, nn_rank, cand_id, cos FROM r WHERE nn_rank <= 10
       |ORDER BY probe_id, nn_rank""".stripMargin

  /** The native hyperplane_bucket expression's exact SQL mirror: its sign
    * words are plan-time-fixed from a seeded PRNG, so the oracle builder
    * reads THE SAME signs and emits each plane's ±term chain literally.
    * Accumulation order matches the expression's index-order loop, and
    * only the `dot > 0` comparison is consumed, so ±0.0 edge cases cannot
    * flip a bucket differently across engines. */
  private def sqlBucket(tbl: String): String = {
    val signs = graft.plans.HyperplaneBucket.randomSigns(Planes)
    val planes = signs.zipWithIndex.map { case (sb, p) =>
      val chain = (0 until Dims).map { d =>
        val t = s"cast($tbl.embedding[${d + 1}] as double)"
        if (((sb >>> d) & 1L) == 1L) t else s"(- $t)"
      }.mkString(" + ")
      s"(CASE WHEN ($chain) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("\n    + ")
    s"cast($planes as int)"
  }

  /** l05 — embedding-cosine near-dup: LSH bucket self-join, cosine verify,
    * top pairs. Bucket count (2^planes) bounds the per-bucket quadratic
    * work. */
  def lshNearDup(embeddings: DataFrame): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", VectorOps.lshBucket("embedding", Planes, Dims))
    val a = bucketed.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("emb_a"), col("emb_b")))
      .select("id_a", "id_b", "cos")
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  private val l05Sql =
    s"""WITH b AS (SELECT vec_id, embedding, ${sqlBucket("embeddings")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |        (${sqlDotChain("a", "c")})
       |          / (sqrt(${sqlDotChain("a", "a")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |SELECT id_a, id_b, cos FROM p ORDER BY cos DESC, id_a, id_b LIMIT 100""".stripMargin

  /** l08 — IVF-style pruned top-k: the LSH bucket acts as the coarse
    * quantizer; each probe searches only its own cell. */
  def ivfTopK(embeddings: DataFrame, numProbes: Int = 20, k: Int = 10): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", VectorOps.lshBucket("embedding", Planes, Dims))
    val probes = bucketed.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"), col("bucket"))
    val cands = bucketed
      .select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"), col("bucket"))
    cands.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos", VectorOps.cosine(col("probe_emb"), col("cand_emb")))
      .withColumn("nn_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))))
      .filter(col("nn_rank") <= k)
      .select("probe_id", "nn_rank", "cand_id", "cos")
      .orderBy("probe_id", "nn_rank")
  }

  private val l08Sql =
    s"""WITH b AS (SELECT vec_id, embedding, ${sqlBucket("embeddings")} AS bucket FROM embeddings),
       |s AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |        (${sqlDotChain("p", "c")})
       |          / (sqrt(${sqlDotChain("p", "p")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |      FROM b p JOIN b c ON p.bucket = c.bucket AND p.vec_id < 20 AND p.vec_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS nn_rank
       |      FROM s)
       |SELECT probe_id, nn_rank, cand_id, cos FROM r WHERE nn_rank <= 10
       |ORDER BY probe_id, nn_rank""".stripMargin

  /** l31 — ANN recall audit: per probe, how many of the exact brute-force
    * top-k ([[bruteTopK]], the correctness baseline) the IVF-pruned path
    * ([[ivfTopK]], the scale path) actually returned. This is the quality
    * gate a pipeline runs on a sample whenever the coarse quantizer
    * changes — at 100 TB you can never afford the exact pass over the
    * full corpus, so recall is measured on a probe subset exactly like
    * this and the sampled bound is what licenses the approximate index.
    * Both sides are the existing oracle-exact pipelines, so the recall
    * join is oracle-exact too. */
  def annRecall(embeddings: DataFrame, numProbes: Int = 20, k: Int = 10): DataFrame = {
    val truth = bruteTopK(embeddings, numProbes, k).select("probe_id", "cand_id")
    val approx = ivfTopK(embeddings, numProbes, k).select("probe_id", "cand_id")
      .withColumn("hit", lit(1))
    truth.join(approx, Seq("probe_id", "cand_id"), "left_outer")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("k_true"),
        sum(coalesce(col("hit"), lit(0))).as("k_hit"))
      .withColumn("recall", col("k_hit").cast("double") / col("k_true"))
      .orderBy("probe_id")
  }

  private val l31Sql =
    s"""WITH s1 AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |    (${sqlDotChain("p", "c")})
       |      / (sqrt(${sqlDotChain("p", "p")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |  FROM embeddings p JOIN embeddings c ON p.vec_id < 20 AND p.vec_id <> c.vec_id),
       |r1 AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS nn_rank
       |       FROM s1),
       |bt AS (SELECT probe_id, cand_id FROM r1 WHERE nn_rank <= 10),
       |b AS (SELECT vec_id, embedding, ${sqlBucket("embeddings")} AS bucket FROM embeddings),
       |s2 AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |        (${sqlDotChain("p", "c")})
       |          / (sqrt(${sqlDotChain("p", "p")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |      FROM b p JOIN b c ON p.bucket = c.bucket AND p.vec_id < 20 AND p.vec_id <> c.vec_id),
       |r2 AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS nn_rank
       |       FROM s2),
       |iv AS (SELECT probe_id, cand_id FROM r2 WHERE nn_rank <= 10),
       |g AS (
       |  SELECT bt.probe_id, count(*) AS k_true,
       |         sum(CASE WHEN iv.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS k_hit
       |  FROM bt LEFT JOIN iv ON bt.probe_id = iv.probe_id AND bt.cand_id = iv.cand_id
       |  GROUP BY 1)
       |SELECT probe_id, k_true, cast(k_hit as bigint) AS k_hit,
       |  cast(k_hit as double) / k_true AS recall
       |FROM g ORDER BY probe_id""".stripMargin

  /** l36 — embedding-space dup CLUSTERS: connected components over the
    * hyperplane-LSH cosine graph (edges = bucket-sharing pairs with
    * cosine ≥ threshold), the embedding analog of l26's text clusters —
    * same min-label propagation, same recursive-closure oracle. This is
    * the semantic-dedup step run after text-level dedup: paraphrases
    * and re-encodes that share no n-grams but embed together. The
    * threshold is corpus-calibrated; 0.35 yields non-trivial clusters on
    * the synthetic fixture (whose vectors are random — real corpora sit
    * near 1.0). */
  def embedDupComponents(embeddings: DataFrame, minCos: Double = 0.35): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", VectorOps.lshBucket("embedding", Planes, Dims))
    val a = bucketed.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    // no distinct: each vector lives in exactly ONE hyperplane bucket,
    // so a pair can surface at most once — the dedup shuffle the
    // multi-band text tiers need has nothing to do here
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b")
    TextDedup.propagateMinLabels(pairs)
      .groupBy("comp").agg(count(lit(1)).as("n_vecs"))
      .select(col("comp").as("cluster_id"), col("n_vecs"),
        (col("n_vecs") - 1).as("removable"))
      .orderBy("cluster_id")
  }

  // cosine pair chain + the shared reachability closure (TextDedup owns
  // the closure text — same `pairs` contract as the text-side oracles)
  private lazy val l36Sql =
    s"""WITH RECURSIVE b AS (SELECT vec_id, embedding, ${sqlBucket("embeddings")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |        (${sqlDotChain("a", "c")})
       |          / (sqrt(${sqlDotChain("a", "a")}) * sqrt(${sqlDotChain("c", "c")})) AS cos
       |      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
       |pairs AS (SELECT DISTINCT id_a, id_b FROM p WHERE cos >= cast(0.35 as double)),
       |""".stripMargin + TextDedup.closureCtesSql + "\n" +
      """SELECT comp AS cluster_id, count(*) AS n_vecs,
        |       cast(count(*) - 1 as bigint) AS removable
        |FROM (SELECT src, min(dst) AS comp FROM reach GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin

  /** l18 — per-label centroid vectors via dimension explosion: the
    * vector-aggregation primitive behind IVF coarse-quantizer training
    * (posexplode → groupBy(label, dim) → decimal-exact mean). One shuffle
    * keyed by (label, dim); linear in n×dims; oracle-exact. */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    import graft.functions.Det._
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(col("v")).as("n"), davg(col("v").cast("double")).as("centroid_v"))
      .orderBy("label", "dim")
  }

  private val l18Sql = {
    val dsumV = "cast(sum(cast((cast(v as double)) as decimal(38,6))) as double)"
    s"""SELECT label, cast(ord - 1 as int) AS dim, count(v) AS n, $dsumV/count(v) AS centroid_v
       |FROM (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS ord
       |      FROM embeddings)
       |GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  }

  /** l19 — unit-normalization + int8 quantization of embedding vectors
    * (the storage/serving transform for ANN indexes: 4× smaller than
    * float32, dot products stay rank-faithful after normalization).
    * Summary per label, oracle-exact (the norm chain, the round-half-up
    * quantizer, and the decimal-accumulated avg are all mirrored in the
    * SQL); the L2≈1 invariant is additionally asserted in LlmSpec. */
  def normalizeQuantize(embeddings: DataFrame): DataFrame = {
    import graft.functions.Det._
    val normed = embeddings
      .withColumn("norm", VectorOps.norm(col("embedding")))
      .withColumn("unit", expr("transform(embedding, x -> cast(x as double) / norm)"))
      .withColumn("q8", expr("transform(unit, x -> cast(round(x * 127.0) as int))"))
    normed.groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        davg(col("norm")).as("avg_norm"),
        max(expr("array_max(q8)")).as("max_q8"),
        min(expr("array_min(q8)")).as("min_q8"))
      .orderBy("label")
  }

  private val l19Sql = {
    val sq = (1 to Dims).map(i =>
      s"cast(embedding[$i] as double)*cast(embedding[$i] as double)").mkString(" + ")
    val q8 = "list_transform(embedding, x -> " +
      "cast(round(cast(x as double)/norm*cast(127.0 as double)) as int))"
    s"""WITH base AS (SELECT label, embedding, sqrt($sq) AS norm FROM embeddings),
       |q AS (SELECT label, norm, list_max($q8) AS mx, list_min($q8) AS mn FROM base)
       |SELECT label, count(*) AS n_vectors,
       |  ${graft.functions.Det.sqlDavg("norm")} AS avg_norm,
       |  max(mx) AS max_q8, min(mn) AS min_q8
       |FROM q GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** l46 — quantization-distortion audit: how much cosine similarity
    * does l19's int8 storage transform actually cost? For the l06 pair
    * set, cosine on the original floats vs cosine on the quantized
    * vectors, summarized as avg/max absolute error — the quality gate a
    * serving stack checks before switching its ANN index to int8. Wholly
    * oracle-exact: the float cosine is the proven left-associated chain;
    * the quantized cosine is built from EXACT integer dot products
    * (int8×int8 sums are order-independent integers, so both engines
    * can sum them any way they like), and the error rollup goes through
    * the decimal accumulator. */
  def quantizationError(embeddings: DataFrame): DataFrame = {
    import graft.functions.Det._
    // norm > 0 guard: a zero vector has no quantized direction, and the
    // engines disagree on 0/0 (Spark non-ANSI nulls, DuckDB infs) — both
    // sides exclude it so the audit stays total AND oracle-exact.
    val q = embeddings
      .withColumn("norm", VectorOps.norm(col("embedding")))
      .filter(col("norm") > 0)
      .withColumn("q8", expr(
        "transform(embedding, x -> cast(round(cast(x as double) / norm * 127.0D) as int))"))
    val a = q.filter(col("vec_id") < PairCutoff)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("q8").as("q8_a"))
    val b = q.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("q8").as("q8_b"))
    def intDot(x: String, y: String) = expr(
      s"cast(aggregate(zip_with($x, $y, (p, r) -> cast(p as bigint) * r), 0L, (acc, v) -> acc + v) as double)")
    val pairs = a.join(b, col("id_b") === col("id_a") + 1)
      .withColumn("cos_f",
        dotChain("emb_a", "emb_b") /
          (sqrt(dotChain("emb_a", "emb_a")) * sqrt(dotChain("emb_b", "emb_b"))))
      .withColumn("cos_q",
        intDot("q8_a", "q8_b") /
          (sqrt(intDot("q8_a", "q8_a")) * sqrt(intDot("q8_b", "q8_b"))))
      .withColumn("err", abs(col("cos_f") - col("cos_q")))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      davg(col("err")).as("avg_abs_err"),
      max(col("err")).as("max_abs_err"))
  }

  private val l46Sql = {
    val sq = (1 to Dims).map(i =>
      s"cast(embedding[$i] as double)*cast(embedding[$i] as double)").mkString(" + ")
    def chain(x: String, y: String) = (1 to Dims).map(i =>
      s"cast($x[$i] as double)*cast($y[$i] as double)").mkString(" + ")
    def intDot(x: String, y: String) =
      s"cast(list_sum(list_transform(range(1, ${Dims + 1}), i -> cast($x[i] as bigint)*$y[i])) as double)"
    s"""WITH base AS (SELECT vec_id, embedding, sqrt($sq) AS norm FROM embeddings
       |              WHERE sqrt($sq) > cast(0.0 as double)),
       |qv AS (SELECT vec_id, embedding,
       |         list_transform(embedding, x ->
       |           cast(round(cast(x as double)/norm*cast(127.0 as double)) as int)) AS q8
       |       FROM base),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        a.embedding AS ea, b.embedding AS eb, a.q8 AS qa, b.q8 AS qb
       |      FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1 WHERE a.vec_id < $PairCutoff),
       |c AS (SELECT id_a,
       |        (${chain("ea", "eb")})
       |          / (sqrt(${chain("ea", "ea")}) * sqrt(${chain("eb", "eb")})) AS cos_f,
       |        ${intDot("qa", "qb")}
       |          / (sqrt(${intDot("qa", "qa")}) * sqrt(${intDot("qb", "qb")})) AS cos_q
       |      FROM p)
       |SELECT count(*) AS n_pairs,
       |  ${graft.functions.Det.sqlDavg("abs(cos_f - cos_q)")} AS avg_abs_err,
       |  max(abs(cos_f - cos_q)) AS max_abs_err
       |FROM c""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("l05_embed_neardup", (s, d) => lshNearDup(Tables.embeddings(s, d)), Some(l05Sql)),
    Q("l06_cosine_pairs", (s, d) => cosinePairs(Tables.embeddings(s, d)), Some(l06Sql)),
    Q("l07_ann_brute_topk", (s, d) => bruteTopK(Tables.embeddings(s, d)), Some(l07Sql)),
    Q("l08_ann_ivf_topk", (s, d) => ivfTopK(Tables.embeddings(s, d)), Some(l08Sql)),
    Q("l18_label_centroids", (s, d) => labelCentroids(Tables.embeddings(s, d)), Some(l18Sql)),
    Q("l19_normalize_quantize", (s, d) => normalizeQuantize(Tables.embeddings(s, d)), Some(l19Sql)),
    Q("l31_ann_recall", (s, d) => annRecall(Tables.embeddings(s, d)), Some(l31Sql)),
    Q("l36_embed_dup_clusters", (s, d) => embedDupComponents(Tables.embeddings(s, d)), Some(l36Sql)),
    Q("l46_quantization_error", (s, d) => quantizationError(Tables.embeddings(s, d)), Some(l46Sql)))
}
