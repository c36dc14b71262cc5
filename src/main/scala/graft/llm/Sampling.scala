package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Det

/** Deterministic dataset splitting and downsampling for training-data
  * pipelines. Split assignment is a pure function of the row key (md5 →
  * bucket 0..99), so it is reproducible across runs, engines, cluster
  * layouts, and data re-partitioning — the property `df.sample()` (seeded
  * per-partition RNG) does NOT have, and the reason every serious corpus
  * pipeline splits by content hash instead.
  */
object Sampling {

  /** Hash bucket in [0,100) from the md5 of a key column; `offset` picks
    * an independent 8-hex-digit window so multiple independent buckets
    * can be derived from one digest. Built from Column functions — no SQL
    * string splicing, so any expression (qualified names, concats) works. */
  def hashBucket(key: Column, offset: Int = 1): Column =
    conv(substring(md5(key.cast("string")), offset, 8), 16, 10).cast("long") % 100

  def withSplit(df: DataFrame, keyCol: String,
                trainPct: Int = 80, valPct: Int = 15): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct% val=$valPct% leaves test=${100 - trainPct - valPct}%")
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "validation")
          .otherwise("test"))
  }

  /** l16 — split + independent 10% downsample, rolled up per (split,
    * lang). Oracle-exact: DuckDB derives identical buckets via
    * `('0x' || substr(md5(..)))::BIGINT`. */
  def datasetSplit(documents: DataFrame): DataFrame =
    withSplit(documents, "doc_id")
      .withColumn("bucket2", hashBucket(col("doc_id"), offset = 9))
      .groupBy("split", "lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("bucket2") < 10, 1).otherwise(0)).as("sampled_docs"))
      .orderBy("split", "lang")

  private val l16Sql =
    """SELECT split, lang, count(*) AS docs,
      | cast(sum(n_chars) as bigint) AS total_chars,
      | cast(sum(CASE WHEN bucket2 < 10 THEN 1 ELSE 0 END) as bigint) AS sampled_docs
      |FROM (SELECT lang, n_chars,
      |        CASE WHEN bucket < 80 THEN 'train'
      |             WHEN bucket < 95 THEN 'validation'
      |             ELSE 'test' END AS split,
      |        bucket2
      |      FROM (SELECT lang, n_chars,
      |              CAST(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) AS BIGINT) % 100 AS bucket,
      |              CAST(('0x' || substr(md5(cast(doc_id as varchar)), 9, 8)) AS BIGINT) % 100 AS bucket2
      |            FROM documents))
      |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** l27 — balanced (stratified-quota) downsample: cap every language at
    * the size of the smallest one — the standard rebalancing step before
    * multilingual training. Selection is "the n_min smallest-md5 docs per
    * lang" (tie-broken by doc_id): a pure function of content keys, so
    * the SAME docs are chosen on any engine, run, or partitioning
    * (sample() can't promise that).
    *
    * Shape — distributed exact selection, NO per-stratum sort of the
    * relation (a row_number window over each lang would funnel every
    * stratum through one partition, the classic 100 TB killer):
    *   1. histogram the leading 4 hex chars of the selection key per
    *      stratum → a metadata-sized frame (≤ strata × 65536 rows);
    *      a window over THAT finds the bucket holding the n_min-th key;
    *   2. rank only the boundary-bucket slice (~1/65536 of a stratum)
    *      to pin the exact per-stratum threshold (hkey, doc_id) pair;
    *   3. one broadcast join filters the full relation by the threshold
    *      — all earlier buckets satisfy it lexicographically for free.
    * Total cost: two small aggregates + one pass over the data with a
    * broadcast filter; every window input is either aggregated metadata
    * or a 65536×-reduced slice. */
  def balancedSample(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nMin = documents.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .agg(min(col("n_lang")).as("n_min"))
    val docs = documents
      .withColumn("hkey", substring(md5(col("doc_id").cast("string")), 1, 16))
      .withColumn("hb", substring(col("hkey"), 1, 4))
    // (1) per-stratum histogram over the 65536 key-prefix buckets; the
    // running count locates the bucket containing the n_min-th key
    val hist = docs.groupBy("lang", "hb").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("lang").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = hist
      .withColumn("cum_before", coalesce(sum(col("c")).over(cumW), lit(0L)))
      .crossJoin(broadcast(nMin))
      .filter(col("cum_before") < col("n_min") &&
        col("n_min") <= col("cum_before") + col("c"))
      .select(col("lang"), col("hb"),
        (col("n_min") - col("cum_before")).as("rank_in_bucket"))
    // (2) exact threshold: the rank_in_bucket-th smallest key inside the
    // boundary bucket only (the one window that touches row data rides a
    // 65536×-pruned slice)
    val sliceW = Window.partitionBy("lang").orderBy(col("hkey"), col("doc_id"))
    val thresholds = docs.join(broadcast(boundary), Seq("lang", "hb"))
      .withColumn("rn", row_number().over(sliceW))
      .filter(col("rn") === col("rank_in_bucket"))
      .select(col("lang"), col("hkey").as("t_hkey"), col("doc_id").as("t_doc_id"))
    // (3) quota filter = key ≤ per-stratum threshold (1 row/stratum, broadcast)
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter(col("hkey") < col("t_hkey") ||
        (col("hkey") === col("t_hkey") && col("doc_id") <= col("t_doc_id")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("kept_docs"),
        sum(col("n_chars")).as("kept_chars"),
        max(col("hkey")).as("max_hkey"))
      .orderBy("lang")
  }

  private val l27Sql =
    """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
      |m AS (SELECT min(n_lang) AS n_min FROM c),
      |r AS (SELECT lang, n_chars,
      |        substr(md5(cast(doc_id as varchar)), 1, 16) AS hkey,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY substr(md5(cast(doc_id as varchar)), 1, 16), doc_id) AS rn
      |      FROM documents)
      |SELECT lang, count(*) AS kept_docs,
      | cast(sum(n_chars) as bigint) AS kept_chars,
      | max(hkey) AS max_hkey
      |FROM r CROSS JOIN m WHERE rn <= n_min
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-doc split assignment that cannot leak near-duplicates across
    * splits: the hash key is the doc's near-dup CLUSTER representative
    * (its [[TextDedup.componentLabels]] component = min reachable doc_id
    * in the candidate graph) rather than the doc itself, so an entire
    * dup family lands in one split by construction — the classic
    * train/test contamination guard (a near-copy of a training doc in
    * the test split silently inflates eval scores). Docs outside any
    * cluster fall back to their own id, i.e. exactly [[withSplit]].
    *
    * Scale shape: the label frame holds only docs that appear in a
    * near-dup pair; the join back to `documents` is a plain equi-join on
    * doc_id (AQE broadcasts it when small — no hint, because on a dirty
    * corpus the clustered fraction can be large). */
  def withLeakageSafeSplit(documents: DataFrame, minJaccard: Double = 0.5,
                           maxBucket: Int = TextDedup.MaxBucketDefault,
                           sigsOpt: Option[DataFrame] = None,
                           candsOpt: Option[DataFrame] = None,
                           labelsOpt: Option[DataFrame] = None): DataFrame = {
    require(labelsOpt.isEmpty ||
        (minJaccard == 0.5 && maxBucket == TextDedup.MaxBucketDefault),
      "labelsOpt carries labels propagated at the default knobs; custom knobs need labelsOpt=None")
    val labels = labelsOpt.getOrElse(
      TextDedup.componentLabels(documents, minJaccard, maxBucket, sigsOpt, candsOpt))
    documents
      .join(labels.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left_outer")
      .withColumn("rep_id", coalesce(col("comp"), col("doc_id")))
      .withColumn("bucket", hashBucket(col("rep_id")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 95, "validation")
          .otherwise("test"))
  }

  /** l29 — leakage-safe split rollup: per split, how many docs, how many
    * of them are members of a near-dup cluster, how many distinct
    * clusters landed there, and total chars. Composes l26's components
    * with l16's hash split; the DuckDB oracle replays the recursive
    * reachability closure and the same bucket arithmetic. */
  def leakageSafeSplit(documents: DataFrame,
                       sigsOpt: Option[DataFrame] = None,
                       candsOpt: Option[DataFrame] = None,
                       labelsOpt: Option[DataFrame] = None): DataFrame =
    withLeakageSafeSplit(documents, sigsOpt = sigsOpt, candsOpt = candsOpt,
        labelsOpt = labelsOpt)
      .groupBy("split")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("comp").isNotNull, 1).otherwise(0)).as("clustered_docs"),
        count_distinct(col("comp")).as("n_clusters"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("split")

  private val l29Sql =
    TextDedup.reachCtesSql + ",\n" +
      """labels AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY 1),
        |rep AS (
        |  SELECT d.doc_id, d.n_chars, l.comp,
        |         coalesce(l.comp, d.doc_id) AS rep_id
        |  FROM documents d LEFT JOIN labels l USING (doc_id)),
        |s AS (
        |  SELECT *, CASE WHEN bucket < 80 THEN 'train'
        |                 WHEN bucket < 95 THEN 'validation'
        |                 ELSE 'test' END AS split
        |  FROM (SELECT *,
        |          CAST(('0x' || substr(md5(cast(rep_id as varchar)), 1, 8)) AS BIGINT) % 100 AS bucket
        |        FROM rep))
        |SELECT split, count(*) AS docs,
        |  cast(sum(CASE WHEN comp IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS clustered_docs,
        |  count(DISTINCT comp) AS n_clusters,
        |  cast(sum(n_chars) as bigint) AS total_chars
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** l30 — residual-contamination audit of the NAIVE per-doc hash split
    * (the failure mode [[withLeakageSafeSplit]] exists to prevent): for
    * every validation/test doc, the fraction of its distinct word-3-gram
    * shingles that also occur anywhere in the train split; rolled up per
    * split as (docs, contaminated_docs at overlap ≥ 0.5, avg overlap).
    * This is the standard eval-decontamination report run before
    * publishing benchmark numbers.
    *
    * Scale shape: one distinct over train shingles and one equi-join of
    * non-train shingles against it — both shuffle on the shingle string,
    * exactly how an n-gram decontamination pass distributes at 100 TB
    * (no per-doc broadcast of the train set anywhere). The avg rides the
    * Det decimal accumulator so the rollup is order-independent. */
  def splitContamination(documents: DataFrame): DataFrame = {
    val sp = withSplit(documents, "doc_id").select(col("doc_id"), col("split"))
    // persisted: the explode pipeline (the dominant cost) feeds both the
    // train-distinct and the overlap join
    val sh = graft.CacheScope.manage(
      TextDedup.portableShingles(documents).join(sp, Seq("doc_id")).persist())
    val trainSh = sh.filter(col("split") === "train").select("sh").distinct()
    val overlap = sh.filter(col("split") =!= "train")
      .join(trainSh.withColumn("hit", lit(1)), Seq("sh"), "left_outer")
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .withColumn("overlap", col("n_hit").cast("double") / col("n_sh"))
    overlap.groupBy("split").agg(
        count(lit(1)).as("docs"),
        sum(when(col("overlap") >= 0.5, 1).otherwise(0)).as("contaminated_docs"),
        Det.davg(col("overlap")).as("avg_overlap"))
      .orderBy("split")
  }

  private val l30Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |shg AS (
       |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts)-1)) AS i FROM toks)),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN bucket < 80 THEN 'train'
       |         WHEN bucket < 95 THEN 'validation'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          CAST(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) AS BIGINT) % 100 AS bucket
       |        FROM documents)),
       |shs AS (SELECT s.doc_id, s.sh, p.split FROM shg s JOIN sp p USING (doc_id)),
       |tr AS (SELECT DISTINCT sh FROM shs WHERE split = 'train'),
       |ov AS (
       |  SELECT s.doc_id, s.split, count(*) AS n_sh,
       |         sum(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |  FROM shs s LEFT JOIN tr t ON s.sh = t.sh
       |  WHERE s.split <> 'train'
       |  GROUP BY 1, 2)
       |SELECT split, count(*) AS docs,
       |  cast(sum(CASE WHEN overlap >= cast(0.5 as double) THEN 1 ELSE 0 END) as bigint) AS contaminated_docs,
       |  ${graft.functions.Det.sqlDsum("overlap")} / count(overlap) AS avg_overlap
       |FROM (SELECT *, cast(n_hit as double) / n_sh AS overlap FROM ov)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** l38 — training-mix plan: given per-language token mass and a target
    * mix (uniform here — the common de-biasing default), the sampling
    * rate each language needs and the effective epoch count that implies
    * (rate > 1 means upsampling = repeating data; the epochs column is
    * what flags languages that would repeat too often to be useful).
    * This is the datamix report an LLM data team signs off before a
    * run. One aggregation shuffle + a broadcast 1-row total; all
    * arithmetic is post-aggregate and exact. */
  def trainingMixPlan(documents: DataFrame): DataFrame = {
    val toks = documents
      .withColumn("tokens",
        expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").cast("long"))
      .groupBy("lang").agg(
        count(lit(1)).as("docs"),
        sum(col("tokens")).as("lang_tokens"))
    val totals = toks.agg(
      sum(col("lang_tokens")).as("total_tokens"),
      count(lit(1)).as("n_langs"))
    toks.crossJoin(broadcast(totals))
      .withColumn("share", col("lang_tokens").cast("double") / col("total_tokens"))
      .withColumn("target_share", lit(1.0) / col("n_langs"))
      .withColumn("sample_rate", col("target_share") / col("share"))
      .withColumn("effective_epochs", greatest(col("sample_rate"), lit(1.0)))
      .select("lang", "docs", "lang_tokens", "share", "target_share",
        "sample_rate", "effective_epochs")
      .orderBy("lang")
  }

  private val l38Sql =
    """WITH t AS (
      |  SELECT lang, count(*) AS docs,
      |    cast(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) as bigint) AS lang_tokens
      |  FROM documents GROUP BY 1),
      |g AS (SELECT cast(sum(lang_tokens) as bigint) AS total_tokens,
      |             count(*) AS n_langs FROM t)
      |SELECT lang, docs, lang_tokens,
      |  cast(lang_tokens as double) / total_tokens AS share,
      |  cast(1.0 as double) / n_langs AS target_share,
      |  (cast(1.0 as double) / n_langs) / (cast(lang_tokens as double) / total_tokens) AS sample_rate,
      |  greatest((cast(1.0 as double) / n_langs) / (cast(lang_tokens as double) / total_tokens),
      |           cast(1.0 as double)) AS effective_epochs
      |FROM t CROSS JOIN g ORDER BY lang""".stripMargin

  def all: Seq[Q] = Seq(
    Q("l16_dataset_split", (s, d) => datasetSplit(Tables.documents(s, d)), Some(l16Sql)),
    Q("l27_balanced_sample", (s, d) => balancedSample(Tables.documents(s, d)), Some(l27Sql)),
    Q("l29_leakage_safe_split", (s, d) =>
      leakageSafeSplit(Tables.documents(s, d), Some(SigStore.portable(s, d)),
        candsOpt = Some(SigStore.portableCands(s, d)),
        labelsOpt = Some(SigStore.compLabels(s, d))), Some(l29Sql)),
    Q("l30_split_contamination", (s, d) => splitContamination(Tables.documents(s, d)), Some(l30Sql)),
    Q("l38_training_mix", (s, d) => trainingMixPlan(Tables.documents(s, d)), Some(l38Sql)))
}
