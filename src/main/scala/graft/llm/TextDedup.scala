package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Large-scale text deduplication for training-data pipelines, over the
  * `documents` fixture. Four tiers:
  *
  *  - exact: normalize → md5 → group (one shuffle on the hash);
  *  - MinHash + LSH banding: per-doc signatures (embarrassingly parallel),
  *    band-bucket self-join for candidates — never all-pairs;
  *  - SimHash: 64-bit fingerprints, 16-bit band join, hamming verify;
  *  - exact n-gram Jaccard verification on LSH candidates only.
  *
  * At 100 TB the candidate-join cardinality is governed by band width, not
  * corpus size — the only O(n²) work happens inside buckets.
  */
object TextDedup {

  private val NumHashes = 16
  private val NumBands = 8 // 2 rows per band

  /** Exact dedup: whitespace-collapse + lowercase + md5. */
  def exactDedupStats(documents: DataFrame): DataFrame = {
    val norm = md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
    val grouped = documents.withColumn("text_hash", norm)
      .groupBy("text_hash").agg(count(lit(1)).as("cnt"))
    grouped.agg(
      sum(col("cnt")).as("total_docs"),
      count(lit(1)).as("distinct_texts"),
      coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("docs_in_dup_groups"),
      sum(col("cnt") - 1).as("removable_dups"))
  }

  private val l01Sql =
    """SELECT cast(sum(cnt) as bigint) AS total_docs,
      | count(*) AS distinct_texts,
      | cast(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) as bigint) AS docs_in_dup_groups,
      | cast(sum(cnt - 1) as bigint) AS removable_dups
      |FROM (SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS text_hash, count(*) AS cnt
      |      FROM documents GROUP BY 1)""".stripMargin

  /** Word-3-gram shingle sets + 16-hash MinHash signatures.
    *
    * Perf shape (this was the round's hottest path): token strings are
    * hashed to longs exactly once, shingle ids are fixed-width hashes of
    * three token longs, and — critically — the 16 signature minima are
    * computed by EXPLODING shingles to rows and taking 16 `min()` columns
    * in one codegen'd HashAggregate with map-side partial aggregation.
    * Computing the minima as higher-order-function lambdas instead leaves
    * them in the interpreted evaluator AND invites Catalyst's
    * CollapseProject to inline the whole token pipeline once per
    * signature slot — measured 10×+ slower at sf0.1. The explode adds one
    * shuffle keyed by doc_id, which is also what distributes per-doc work
    * evenly at 100 TB. */
  private def withSignatures(documents: DataFrame,
                             keepShingles: Boolean = false): DataFrame = {
    val shingled = documents
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("tokens_h", expr("transform(tokens, t -> xxhash64(t))"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(tokens_h)-3),
          |  i -> xxhash64(element_at(tokens_h, i+1), element_at(tokens_h, i+2), element_at(tokens_h, i+3))))""".stripMargin))
        .as("sh"))
    val minCols = (0 until NumHashes).map(i => min(expr(s"xxhash64($i, sh)")).as(s"mh_$i"))
    // collect_set of full shingle sets is the dominant aggregation-state
    // cost at scale — only the exact-Jaccard verify needs it
    val aggCols =
      if (keepShingles) collect_set(col("sh")).as("shingles") +: minCols else minCols
    shingled.groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("sig", array((0 until NumHashes).map(i => col(s"mh_$i")): _*))
      .drop((0 until NumHashes).map(i => s"mh_$i"): _*)
  }

  /** LSH candidate pairs (id_a, id_b): docs sharing any (band, band-hash)
    * bucket. Only the ids ride through the self-join + distinct — the
    * 16-long signatures are functionally dependent on doc_id and would
    * add ~256 B/row to the distinct's shuffle for nothing; consumers that
    * need them re-join against `sigs`. */
  private def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .withColumn("bands", array((0 until NumBands).map(b =>
        expr(s"hash($b, sig[${2 * b}], sig[${2 * b + 1}])")): _*))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("doc_id").as("id_a"), col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("id_b"), col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Estimated Jaccard = matching-signature fraction (single definition
    * shared by detection and removal so the scores can't drift apart). */
  private def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / NumHashes

  /** Candidate pairs scored by estimated Jaccard. `sigs` is persisted by
    * the caller-facing entry points: it feeds the band join and two
    * payload re-joins, and recomputing the explode+aggregate pipeline —
    * the module's dominant cost — per consumer would triple it. */
  private def scoredCandidates(sigs: DataFrame): DataFrame =
    lshCandidatePairs(sigs)
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b")))

  /** MinHash near-dup: candidates ranked by estimated Jaccard (matching
    * signature fraction). Top-100 — not SQL-oracle-expressible; driver
    * does the rows-only check. */
  def minhashNearDup(documents: DataFrame): DataFrame =
    scoredCandidates(graft.CacheScope.manage(withSignatures(documents).persist()))
      .select("id_a", "id_b", "est_jaccard")
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)

  /** SimHash fingerprint: per-token 64-bit hashes vote per bit position;
    * candidates share one of four 16-bit bands; ranked by hamming. */
  def simhashNearDup(documents: DataFrame): DataFrame = {
    // Binary-weight simhash over the distinct-token set. Same perf shape
    // as MinHash: explode token hashes to rows and take the 64 per-bit
    // votes as codegen'd SUM aggregates (the nested-lambda form evaluates
    // ~64×tokens interpreted closures per doc and was 5× slower).
    val tok = documents
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(split(text, ' '), t -> xxhash64(t)))")).as("h"))
    val voteCols = (0 until 64).map(b =>
      sum(expr(s"IF((shiftright(h, $b) & 1) = 1, 1, -1)")).as(s"v_$b"))
    val sims = tok.groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .withColumn("simhash", expr(
        (0 until 64).map(b => s"IF(v_$b > 0, shiftleft(1L, $b), 0L)").mkString(" + ")))
      .drop((0 until 64).map(b => s"v_$b"): _*)
      .withColumn("bands", array((0 until 4).map(k =>
        expr(s"shiftright(simhash, ${16 * k}) & 65535")): _*))
      .select(col("doc_id"), col("simhash"), posexplode(col("bands")).as(Seq("band_id", "band_val")))
    val a = sims.select(col("doc_id").as("id_a"), col("simhash").as("sim_a"),
      col("band_id"), col("band_val"))
    val b = sims.select(col("doc_id").as("id_b"), col("simhash").as("sim_b"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .select("id_a", "id_b", "hamming")
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(100)
  }

  /** Exact n-gram Jaccard, verified only on LSH candidate pairs. */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sigs = graft.CacheScope.manage(withSignatures(documents, keepShingles = true).persist())
    val shingleSets = sigs.select(col("doc_id"), col("shingles"))
    lshCandidatePairs(sigs)
      .join(shingleSets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  /** Near-dup REMOVAL (the pipeline step after detection): drop every doc
    * that has a candidate near-dup with a smaller doc_id (est. Jaccard ≥
    * threshold), keeping one representative per dup pair chain. One
    * anti-join against the candidate pairs — no transitive closure pass,
    * which matches the greedy keep-first policy common in corpus dedup. */
  def dedupFilter(documents: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val toDrop = scoredCandidates(graft.CacheScope.manage(withSignatures(documents).persist()))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("id_b").as("doc_id")).distinct()
    documents.join(toDrop, Seq("doc_id"), "left_anti")
  }

  /** l17 — dedup-filter rollup: per-lang kept/removed counts. */
  def dedupFilterStats(documents: DataFrame): DataFrame = {
    val kept = dedupFilter(documents)
      .groupBy("lang").agg(count(lit(1)).as("kept_docs"))
    val total = documents.groupBy("lang").agg(count(lit(1)).as("total_docs"))
    total.join(kept, Seq("lang"), "left_outer")
      .withColumn("kept_docs", coalesce(col("kept_docs"), lit(0L)))
      .withColumn("removed_docs", col("total_docs") - col("kept_docs"))
      .orderBy("lang")
  }

  def all: Seq[Q] = Seq(
    Q("l01_dedup_exact", (s, d) => exactDedupStats(Tables.documents(s, d)), Some(l01Sql)),
    Q("l02_dedup_minhash_lsh", (s, d) => minhashNearDup(Tables.documents(s, d)), None),
    Q("l03_dedup_simhash", (s, d) => simhashNearDup(Tables.documents(s, d)), None),
    Q("l04_ngram_jaccard", (s, d) => ngramJaccard(Tables.documents(s, d)), None),
    Q("l17_dedup_filter", (s, d) => dedupFilterStats(Tables.documents(s, d)), None))
}
