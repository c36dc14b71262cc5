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

  /** Word-3-gram shingle sets + 16-hash MinHash signatures. */
  private def withSignatures(documents: DataFrame): DataFrame =
    documents
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(tokens)-3), i -> concat_ws(' ', slice(tokens, i+1, 3))))"))
      .withColumn("sig", array((0 until NumHashes).map(i =>
        expr(s"array_min(transform(shingles, s -> xxhash64($i, s)))")): _*))

  /** LSH candidate pairs: docs sharing any (band, band-hash) bucket. */
  private def lshCandidates(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .withColumn("bands", array((0 until NumBands).map(b =>
        expr(s"hash($b, sig[${2 * b}], sig[${2 * b + 1}])")): _*))
      .select(col("doc_id"), col("sig"), posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
  }

  /** MinHash near-dup: candidates ranked by estimated Jaccard (matching
    * signature fraction). Top-100 — not SQL-oracle-expressible; driver
    * does the rows-only check. */
  def minhashNearDup(documents: DataFrame): DataFrame =
    lshCandidates(withSignatures(documents))
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / NumHashes)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)

  /** SimHash fingerprint: per-token 64-bit hashes vote per bit position;
    * candidates share one of four 16-bit bands; ranked by hamming. */
  def simhashNearDup(documents: DataFrame): DataFrame = {
    val sims = documents
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 1)
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
          |  acc + IF(aggregate(tokens, 0L, (a2, t) ->
          |           a2 + IF((shiftright(xxhash64(t), b) & 1) = 1, 1L, -1L)) > 0,
          |         shiftleft(1L, b), 0L))""".stripMargin))
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
    val sigs = withSignatures(documents)
    val shingleSets = sigs.select(col("doc_id"), col("shingles"))
    lshCandidates(sigs)
      .select("id_a", "id_b")
      .join(shingleSets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  def all: Seq[Q] = Seq(
    Q("l01_dedup_exact", (s, d) => exactDedupStats(Tables.documents(s, d)), Some(l01Sql)),
    Q("l02_dedup_minhash_lsh", (s, d) => minhashNearDup(Tables.documents(s, d)), None),
    Q("l03_dedup_simhash", (s, d) => simhashNearDup(Tables.documents(s, d)), None),
    Q("l04_ngram_jaccard", (s, d) => ngramJaccard(Tables.documents(s, d)), None))
}
