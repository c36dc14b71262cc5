package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Det._

/** Text analysis for training-data curation over `documents`: corpus
  * stats, heuristic language ID, regex tokenization, quality scoring, and
  * rolling-hash document fingerprints. All pure column expressions — no
  * UDFs, single aggregation shuffle each.
  */
object TextStats {

  /** l09 — per-language corpus statistics. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("wc", size(split(col("text"), " ")))
      .withColumn("nospace", length(expr("replace(text, ' ', '')")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("wc")).as("total_words"),
        sum(col("nospace")).as("total_nospace"))
      .withColumn("avg_chars", col("total_chars").cast("double") / col("docs"))
      .withColumn("avg_word_len", col("total_nospace").cast("double") / col("total_words"))
      .drop("total_nospace")
      .orderBy("lang")

  private val l09Sql =
    """SELECT lang, docs, total_chars, total_words,
      | cast(total_chars as double)/docs AS avg_chars,
      | cast(total_nospace as double)/total_words AS avg_word_len
      |FROM (SELECT lang, count(*) AS docs,
      |       cast(sum(n_chars) as bigint) AS total_chars,
      |       cast(sum(len(string_split(text, ' '))) as bigint) AS total_words,
      |       cast(sum(len(replace(text, ' ', ''))) as bigint) AS total_nospace
      |      FROM documents GROUP BY 1) ORDER BY lang""".stripMargin

  /** l10 — n-gram/stopword-heuristic language ID, cross-tabbed against the
    * labeled lang column (confusion-matrix shape). */
  def langId(documents: DataFrame): DataFrame =
    documents
      .withColumn("predicted_lang",
        when(col("text").like("% the %"), "en")
          .when(col("text").like("% der %"), "de")
          .when(col("text").like("% le %"), "fr")
          .when(col("text").like("% el %"), "es")
          .otherwise("other"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("docs"))
      .orderBy("lang", "predicted_lang")

  private val l10Sql =
    """SELECT lang,
      | CASE WHEN text LIKE '% the %' THEN 'en'
      |      WHEN text LIKE '% der %' THEN 'de'
      |      WHEN text LIKE '% le %' THEN 'fr'
      |      WHEN text LIKE '% el %' THEN 'es'
      |      ELSE 'other' END AS predicted_lang,
      | count(*) AS docs
      |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** l11 — BPE-ish regex token counting (words | digit runs | single
    * punctuation), per source. */
  def tokenCount(documents: DataFrame): DataFrame =
    documents
      .withColumn("tokens", expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum(col("tokens")).as("total_tokens"))
      .withColumn("avg_tokens", col("total_tokens").cast("double") / col("docs"))
      .orderBy("source")

  private val l11Sql =
    """SELECT source, count(*) AS docs,
      | cast(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) as bigint) AS total_tokens,
      | cast(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) as double)/count(*) AS avg_tokens
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** l12 — document quality scoring: length score + lexical diversity,
    * bucketed (reference quality-score shape: consumer.py:283-296). */
  def qualityScore(documents: DataFrame): DataFrame = {
    val lenScore = least(lit(1.0), col("n_chars").cast("double") / lit(500.0))
    val words = split(col("text"), " ")
    val diversity = size(array_distinct(words)).cast("double") / size(words)
    documents
      .withColumn("score", lenScore * lit(0.5) + diversity * lit(0.5))
      .withColumn("quality_bucket",
        when(col("score") >= 0.75, "high")
          .when(col("score") >= 0.5, "medium")
          .otherwise("low"))
      .groupBy("quality_bucket")
      .agg(count(lit(1)).as("docs"), davg(col("score")).as("avg_score"))
      .orderBy("quality_bucket")
  }

  private val l12Sql =
    s"""SELECT quality_bucket, count(*) AS docs, ${sqlDavg("score")} AS avg_score
       |FROM (SELECT CASE WHEN score >= cast(0.75 as double) THEN 'high'
       |             WHEN score >= cast(0.5 as double) THEN 'medium'
       |             ELSE 'low' END AS quality_bucket, score
       |      FROM (SELECT least(cast(1.0 as double), n_chars/cast(500.0 as double))*cast(0.5 as double)
       |                 + (cast(len(list_distinct(string_split(text, ' '))) as double)
       |                    / len(string_split(text, ' ')))*cast(0.5 as double) AS score
       |            FROM documents))
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** l13 — rolling-hash document fingerprint: min md5 over all 8-char
    * windows (winnowing-style robust content id). Computed by the native
    * codegen'd expression ([[graft.plans.Md5WindowMin]]) — bit-identical
    * to the composed `array_min(transform(...))` md5-HOF chain the
    * DuckDB oracle runs (LlmSpec pins the equivalence), without the
    * per-window interpreted lambda + substring + hex allocations. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .withColumn("fingerprint", expr("md5_window_min(text, 8)"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  private val l13Sql =
    """SELECT doc_id,
      | list_min([md5(substr(text, i, 8)) for i in range(1, greatest(len(text)-7, 1)+1)]) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** l25 — the fast-path twin of l13: the same min-over-all-8-byte-windows
    * winnowing shape, computed by the native codegen'd Karp–Rabin
    * expression (graft.plans.RollingMinHash) instead of an md5 per
    * window. The composed HOF form pays ~24 s/GB in window plumbing alone
    * (interpreted lambda + a substring allocation per position, hash
    * choice irrelevant); the rolling form is one multiply-add per byte —
    * measured >40× cheaper — which is what a per-ingest-batch fingerprint
    * needs at 100 TB. No oracle (engine-native hash) — l13 stays the
    * bit-checked variant, l02/l04-style — but l49's agreement audit
    * ([[fingerprintAgreement]]) puts this tier's soundness and
    * discrimination parity under the driver gate. */
  def fingerprintFast(documents: DataFrame): DataFrame =
    documents
      .withColumn("fingerprint", expr("rolling_min_hash(text, 8)"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  /** l49 — the fast fingerprint tier's agreement audit (the l47 pattern
    * applied to l25, so a native-expression regression fails the DRIVER
    * gate, not just LlmSpec's brute-force spec). One row, three columns:
    *
    *  - `portable_classes` — distinct l13 fingerprints; oracle-exact
    *    (DuckDB computes the same md5-HOF expression).
    *  - `fast_sound` — the STRUCTURAL soundness invariant of l25, in
    *    its strict form: absent a 64-bit window collision, docs with
    *    equal fast fingerprints carry the IDENTICAL minimizing window
    *    (`rolling_argmin_window` — the hash is a function of the window
    *    bytes, so equal min hash ⟹ equal argmin window), hence every
    *    fast class must hold exactly one distinct argmin window. Any
    *    mis-rolled hash, wrong min, argmin/min divergence, or
    *    nondeterminism across the corpus trips this — pinned true, with
    *    the same ~2⁻⁶⁴ collision caveat. Strictly stronger than the
    *    earlier any-shared-window pair check, and O(corpus) instead of
    *    O(class²) pairs dragging window arrays through a self-join —
    *    the form that runs at 100 TB with no class sampling.
    *  - `fast_class_band_ok` — discrimination parity: the fast tier's
    *    class count stays within ±30% of the portable tier's. Both
    *    counts are fixture-deterministic; the max observed deviation is
    *    15.5% across all three fixture scales (101/115, 98/116,
    *    266/266), so the band carries ~2× headroom (the q39 pattern:
    *    audit bound ≫ expected deviation). */
  def fingerprintAgreement(documents: DataFrame): DataFrame = {
    val fps = graft.CacheScope.manage(documents.select(
      expr("md5_window_min(text, 8)").as("pfp"),
      expr("rolling_min_hash(text, 8)").as("ffp"),
      expr("rolling_argmin_window(text, 8)").as("amw")).persist())
    val counts = fps.agg(
      countDistinct(col("pfp")).as("portable_classes"),
      countDistinct(col("ffp")).as("fast_classes"))
    val badClasses = fps.groupBy("ffp")
      .agg(countDistinct(col("amw")).as("n_wins"))
      .filter(col("n_wins") > 1)
      .agg(count(lit(1)).as("bad_classes"))
    counts.crossJoin(badClasses).select(
      col("portable_classes"),
      (col("bad_classes") === 0).as("fast_sound"),
      (abs(col("fast_classes") - col("portable_classes")) <=
        col("portable_classes") * 0.30).as("fast_class_band_ok"))
  }

  private val l49Sql =
    """WITH fp AS (
      |  SELECT list_min([md5(substr(text, i, 8)) for i in range(1, greatest(len(text)-7, 1)+1)]) AS pfp
      |  FROM documents)
      |SELECT count(DISTINCT pfp) AS portable_classes,
      |       true AS fast_sound, true AS fast_class_band_ok
      |FROM fp""".stripMargin

  /** l20 — scrub pipeline (PII/stopword-removal shape): regexp-deletion
    * passes with per-language removed-character accounting. */
  def scrubStats(documents: DataFrame): DataFrame = {
    val scrubbed = expr(
      """regexp_replace(regexp_replace(regexp_replace(text,
        | '[a-z0-9.]+@[a-z0-9.]+', ''),
        | 'https?://[^ ]+', ''),
        | '\\bthe\\b', '')""".stripMargin.replace("\n", ""))
    documents
      .withColumn("removed_chars", length(col("text")) - length(scrubbed))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("removed_chars")).as("total_removed"),
        sum(when(col("removed_chars") > 0, 1).otherwise(0)).as("docs_touched"))
      .orderBy("lang")
  }

  private val l20Sql =
    """SELECT lang, count(*) AS docs,
      | cast(sum(removed_chars) as bigint) AS total_removed,
      | cast(sum(CASE WHEN removed_chars > 0 THEN 1 ELSE 0 END) as bigint) AS docs_touched
      |FROM (SELECT lang,
      |        len(text) - len(regexp_replace(regexp_replace(regexp_replace(text,
      |          '[a-z0-9.]+@[a-z0-9.]+', '', 'g'),
      |          'https?://[^ ]+', '', 'g'),
      |          '\bthe\b', '', 'g')) AS removed_chars
      |      FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** l21 — corpus vocabulary: global top-20 terms by frequency
    * (explode → count; ties broken by term for a total order). */
  def topTerms(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(20)

  private val l21Sql =
    """SELECT term, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |WHERE term <> ''
      |GROUP BY 1 ORDER BY cnt DESC, term LIMIT 20""".stripMargin

  /** l22 — distinctive terms per language: df-normalized term weighting
    * (TF-IDF shape with a rational idf `n_docs/df` instead of a log, so
    * the score is exact integer arithmetic + one division and therefore
    * bit-identical cross-engine), with per-group top-k via a partitioned
    * row_number — the windowed variant of q11's global top-k. Two
    * aggregation shuffles (tf, df) + a broadcast 1-row corpus count. */
  def tfidfTerms(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val dfreq = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tfreq = toks.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    tfreq.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("term_rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("score").desc, col("term"))))
      .filter(col("term_rank") <= 5)
      .select("lang", "term_rank", "term", "tf", "df", "score")
      .orderBy("lang", "term_rank")
  }

  private val l22Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT * FROM t WHERE term <> ''),
      |dfreq AS (SELECT term, count(*) AS df
      |          FROM (SELECT DISTINCT doc_id, term FROM tk) GROUP BY 1),
      |tfreq AS (SELECT lang, term, count(*) AS tf FROM tk GROUP BY 1,2),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT lang, term, tf, df, cast(tf*n_docs as double)/df AS score
      |  FROM tfreq JOIN dfreq USING (term) CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS term_rank
      |      FROM scored)
      |SELECT lang, term_rank, term, cast(tf as bigint) AS tf, cast(df as bigint) AS df, score
      |FROM r WHERE term_rank <= 5 ORDER BY lang, term_rank""".stripMargin

  /** l32 — repetition signals, the quality dimension [[qualityScore]]'s
    * length/diversity score misses: boilerplate and generated spam pass a
    * lexical-diversity check while repeating the same phrases. Per doc:
    * the fraction of word-2-grams taken by the single most frequent one
    * (`top_frac`) and the fraction occurring more than once (`dup_frac`)
    * — the standard repetition rules in published corpus-curation
    * pipelines. Flag = top_frac > 0.2 OR dup_frac > 0.5; rolled up per
    * language.
    *
    * Shape: explode 2-grams (NOT distinct — multiplicity is the signal),
    * one (doc, gram) count, one per-doc aggregate, one per-lang rollup —
    * three shuffles, each on progressively smaller keys; linear in corpus
    * size with map-side combine everywhere. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val grams = documents
      .withColumn("ts", split(col("text"), " "))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(0, size(ts)-2),
          |  i -> concat_ws(' ', element_at(ts, i+1), element_at(ts, i+2)))""".stripMargin)).as("g"))
    val perDoc = grams.groupBy("doc_id", "lang", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "lang")
      .agg(
        sum(col("cnt")).as("n_grams"),
        max(col("cnt")).as("top_cnt"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_grams"))
      .withColumn("top_frac", col("top_cnt").cast("double") / col("n_grams"))
      .withColumn("dup_frac", col("dup_grams").cast("double") / col("n_grams"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("top_frac") > 0.2 || col("dup_frac") > 0.5, 1).otherwise(0))
          .as("flagged_docs"),
        davg(col("top_frac")).as("avg_top_frac"),
        davg(col("dup_frac")).as("avg_dup_frac"))
      .orderBy("lang")
  }

  private val l32Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |g AS (
       |  SELECT doc_id, lang, ts[i] || ' ' || ts[i+1] AS g
       |  FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts))) AS i FROM toks)),
       |pd AS (
       |  SELECT doc_id, lang, sum(cnt) AS n_grams, max(cnt) AS top_cnt,
       |         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_grams
       |  FROM (SELECT doc_id, lang, g, count(*) AS cnt FROM g GROUP BY 1,2,3)
       |  GROUP BY 1,2),
       |f AS (
       |  SELECT lang,
       |         cast(top_cnt as double)/n_grams AS top_frac,
       |         cast(dup_grams as double)/n_grams AS dup_frac
       |  FROM pd)
       |SELECT lang, count(*) AS docs,
       |  cast(sum(CASE WHEN top_frac > cast(0.2 as double)
       |                  OR dup_frac > cast(0.5 as double) THEN 1 ELSE 0 END) as bigint) AS flagged_docs,
       |  ${sqlDavg("top_frac")} AS avg_top_frac,
       |  ${sqlDavg("dup_frac")} AS avg_dup_frac
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** l33 — context-window packing plan: what tokenized training actually
    * pays at a fixed sequence length. Per doc, `n_seqs = ceil(tokens/ctx)`
    * sequences (one-doc-per-sequence padding policy); per language the
    * rollup reports total sequences, the perfect-packing lower bound
    * `ceil(sum(tokens)/ctx)`, and the padding fraction — the number that
    * tells a pipeline whether sequence packing is worth turning on before
    * burning accelerator-hours. Integer `div` arithmetic end to end, so
    * the oracle is exact; one aggregation shuffle. */
  def packingPlan(documents: DataFrame, ctx: Int = 512): DataFrame = {
    val t = documents
      .withColumn("tokens",
        expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").cast("long"))
      .filter(col("tokens") > 0)
      .withColumn("n_seqs", expr(s"(tokens + ${ctx - 1}) div $ctx"))
    t.groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("tokens")).as("total_tokens"),
        sum(col("n_seqs")).as("total_seqs"))
      .withColumn("packed_seqs_lb", expr(s"(total_tokens + ${ctx - 1}) div $ctx"))
      .withColumn("padding_frac",
        (col("total_seqs") * ctx - col("total_tokens")).cast("double") /
          (col("total_seqs") * ctx))
      .orderBy("lang")
  }

  private val l33Sql =
    """WITH t AS (
      |  SELECT lang, len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS tokens
      |  FROM documents),
      |tt AS (SELECT lang, tokens, (tokens + 511) // 512 AS n_seqs FROM t WHERE tokens > 0)
      |SELECT lang, count(*) AS docs,
      |  cast(sum(tokens) as bigint) AS total_tokens,
      |  cast(sum(n_seqs) as bigint) AS total_seqs,
      |  cast((sum(tokens) + 511) // 512 as bigint) AS packed_seqs_lb,
      |  cast(sum(n_seqs)*512 - sum(tokens) as double) / (sum(n_seqs)*512) AS padding_frac
      |FROM tt GROUP BY 1 ORDER BY 1""".stripMargin

  /** l34 — vocabulary coverage / OOV rate: build the top-1000 corpus
    * vocabulary by frequency (ties broken by term for a total order) and
    * report, per language, how many token occurrences it covers — the
    * report that sizes a tokenizer's vocab and shows which languages it
    * under-serves. The vocab is bounded (1000 rows) and broadcast, so
    * the coverage pass is a broadcast probe over the exploded tokens —
    * no shuffle grows with corpus size except the two token aggregates.
    * The exploded token stream is deliberately recomputed rather than
    * persisted: at 100 TB caching it would dwarf executor storage, while
    * re-reading rides the scan. */
  def vocabCoverage(documents: DataFrame, vocabSize: Int = 1000): DataFrame = {
    def toks = documents
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(coalesce(col("in_vocab"), lit(0))).as("covered_tokens"))
      .withColumn("oov_rate",
        (col("total_tokens") - col("covered_tokens")).cast("double") / col("total_tokens"))
      .orderBy("lang")
  }

  private val l34Sql =
    """WITH tk AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |t AS (SELECT * FROM tk WHERE term <> ''),
      |v AS (SELECT term FROM (
      |  SELECT term, count(*) AS cnt FROM t GROUP BY 1
      |  ORDER BY cnt DESC, term LIMIT 1000)),
      |j AS (SELECT t.lang, CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END AS iv
      |      FROM t LEFT JOIN v ON t.term = v.term)
      |SELECT lang, count(*) AS total_tokens,
      |  cast(sum(iv) as bigint) AS covered_tokens,
      |  cast(count(*) - sum(iv) as double) / count(*) AS oov_rate
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** l37 — overlapping chunk plan: split every doc into fixed 256-char
    * windows at a 224-char stride (32-char overlap), the standard prep
    * for embedding/RAG indexing where context must not be cut mid-
    * sentence at a window edge. Reports, per language, the chunk count,
    * average chunk length, and the expansion factor (chunked chars over
    * raw chars — what the overlap costs in storage and embedding
    * compute). One explode + one aggregation shuffle; the chunk list is
    * computed per row with no shuffle of the raw text. */
  def chunkPlan(documents: DataFrame, size: Int = 256, stride: Int = 224): DataFrame = {
    val chunks = documents
      .select(col("lang"), col("doc_id"), explode(expr(
        s"transform(sequence(1, greatest(length(text), 1), $stride), i -> substring(text, i, $size))"))
        .as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
    chunks.groupBy("lang")
      .agg(
        count_distinct(col("doc_id")).as("docs"),
        count(lit(1)).as("total_chunks"),
        davg(col("chunk_chars").cast("double")).as("avg_chunk_chars"),
        sum(col("chunk_chars")).as("chunked_chars"))
      .join(documents.groupBy("lang").agg(sum(length(col("text"))).as("raw_chars")), Seq("lang"))
      .withColumn("expansion", col("chunked_chars").cast("double") / col("raw_chars"))
      .orderBy("lang")
  }

  private val l37Sql = {
    val davgC = "cast(sum(cast((cast(chunk_chars as double)) as decimal(38,6))) as double)/count(chunk_chars)"
    s"""WITH ch AS (
       |  SELECT lang, doc_id, len(chunk) AS chunk_chars
       |  FROM (SELECT lang, doc_id,
       |          unnest([substr(text, i, 256) for i in range(1, greatest(len(text), 1) + 1, 224)]) AS chunk
       |        FROM documents)),
       |agg AS (
       |  SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS total_chunks,
       |         $davgC AS avg_chunk_chars,
       |         cast(sum(chunk_chars) as bigint) AS chunked_chars
       |  FROM ch GROUP BY 1),
       |raw AS (SELECT lang, cast(sum(len(text)) as bigint) AS raw_chars FROM documents GROUP BY 1)
       |SELECT lang, docs, total_chunks, avg_chunk_chars, chunked_chars,
       |       raw_chars, cast(chunked_chars as double) / raw_chars AS expansion
       |FROM agg JOIN raw USING (lang) ORDER BY lang""".stripMargin
  }

  /** Extract visible text from HTML-ish content: drop script/style
    * blocks wholesale, strip tags, decode the common entities, collapse
    * whitespace — the first transform every web-corpus pipeline runs.
    * Pure regexp column expressions (codegen'd, no UDF); patterns stay
    * in the regex subset Java and RE2 agree on so the oracle is exact. */
  def htmlToText(text: Column): Column = {
    val noBlocks = regexp_replace(text,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** l40 — HTML extraction rollup: per language, how many docs carry
    * markup, and how much of their length survives extraction (the
    * boilerplate ratio a crawler monitors). */
  def htmlExtractStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("is_html", col("text").rlike("<[a-zA-Z!/][^>]*>"))
      .withColumn("extracted_len", length(htmlToText(col("text"))).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("is_html"), 1).otherwise(0)).as("html_docs"),
        sum(length(col("text"))).as("raw_len"),
        sum(col("extracted_len")).as("extracted_len"))
      .withColumn("keep_ratio",
        col("extracted_len").cast("double") / col("raw_len"))
      .orderBy("lang")

  private val l40Sql = {
    val ent = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ")
    val decoded = ent.foldLeft(
      "regexp_replace(regexp_replace(text, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'), '<[^>]*>', ' ', 'g')") {
      case (c, (e, r)) => s"regexp_replace($c, '$e', '$r', 'g')"
    }
    s"""SELECT lang, count(*) AS docs,
       |  cast(sum(CASE WHEN regexp_matches(text, '<[a-zA-Z!/][^>]*>') THEN 1 ELSE 0 END) as bigint) AS html_docs,
       |  cast(sum(len(text)) as bigint) AS raw_len,
       |  cast(sum(len(trim(regexp_replace($decoded, '\\s+', ' ', 'g')))) as bigint) AS extracted_len,
       |  cast(sum(len(trim(regexp_replace($decoded, '\\s+', ' ', 'g')))) as double)
       |    / sum(len(text)) AS keep_ratio
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** l43 — corpus-level bigram novelty: per doc, the share of its
    * distinct word-2-grams that occur in NO other document (`doc_freq
    * == 1`), rolled up per language with a boilerplate flag for docs
    * whose bigrams are mostly corpus-shared. This is the n-gram-overlap
    * memorization/boilerplate proxy published curation pipelines run
    * beside l32's within-doc repetition: l32 catches a doc repeating
    * itself, l43 catches a doc repeating the corpus. All-integer counts
    * — no transcendentals — so the oracle is bit-exact (a log-prob LM
    * score would hang cross-engine determinism on libm's uncorrectly-
    * rounded log).
    *
    * Shape: explode 2-grams, one (doc, gram) count, one gram-level
    * doc-frequency aggregate, one gram-keyed equi-join back, then doc
    * and lang rollups — every shuffle keyed on the gram or doc_id,
    * linear in corpus size, map-side combine throughout. The gram join
    * key stays the raw two-word string: it is short and bounded (unlike
    * l41's full segments, where md5 keying pays for itself). */
  def bigramNovelty(documents: DataFrame): DataFrame = {
    val grams = documents
      .withColumn("ts", split(col("text"), " "))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(0, size(ts)-2),
          |  i -> concat_ws(' ', element_at(ts, i+1), element_at(ts, i+2)))""".stripMargin)).as("g"))
    val perDocGram = grams.distinct()
    val docFreq = perDocGram.groupBy("g").agg(count(lit(1)).as("doc_freq"))
    val perDoc = perDocGram.join(docFreq, "g")
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(when(col("doc_freq") === 1, 1).otherwise(0)).as("n_unique"))
      .withColumn("novelty", col("n_unique").cast("double") / col("n_distinct"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        davg(col("novelty")).as("avg_novelty"),
        sum(when(col("novelty") < 0.5, 1).otherwise(0)).as("boilerplate_docs"))
      .orderBy("lang")
  }

  private val l43Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |g AS (
       |  SELECT doc_id, lang, ts[i] || ' ' || ts[i+1] AS g
       |  FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts))) AS i FROM toks)),
       |pdg AS (SELECT DISTINCT doc_id, lang, g FROM g),
       |df AS (SELECT g, count(*) AS doc_freq FROM pdg GROUP BY 1),
       |pd AS (
       |  SELECT doc_id, lang, count(*) AS n_distinct,
       |         sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END) AS n_unique
       |  FROM pdg JOIN df USING (g) GROUP BY 1,2),
       |f AS (SELECT lang, cast(n_unique as double)/n_distinct AS novelty FROM pd)
       |SELECT lang, count(*) AS docs,
       |  ${sqlDavg("novelty")} AS avg_novelty,
       |  cast(sum(CASE WHEN novelty < cast(0.5 as double) THEN 1 ELSE 0 END) as bigint) AS boilerplate_docs
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** The character-trigram stream of the corpus (SQL-substring character
    * windows, so DuckDB's `substring(text, i, 3)` replays it exactly —
    * [[graft.plans.CharNgrams]] is the one-pass form of exactly that
    * composed `transform(sequence(...), i -> substring(text, i, 3))`,
    * whose per-window start-of-string UTF-8 scan is quadratic per doc). */
  private def trigramStream(documents: DataFrame): DataFrame =
    documents
      .filter(length(col("text")) >= 3)
      .select(explode(expr("char_ngrams(text, 3)")).as("g"))

  /** l50 — heavy-hitter character trigrams via the [[graft.plans.MisraGries]]
    * aggregate: dominant n-grams are the signal behind the l10 lang-ID
    * heuristic and boilerplate detection, and "keys owning > 1/m of the
    * stream" is the hot-key question the reference's trending-content
    * tier asks of content ids.
    *
    * Two scan-bound passes, no key-universe shuffle:
    *  1. ONE aggregation computes the stream length and the m-capacity
    *     Misra–Gries summary (map-side partials, m-1 counters per task,
    *     merged associatively).
    *  2. The ≤ m-1 surfaced candidates are broadcast back and ONLY their
    *     exact counts computed; `exact·m > n` keeps precisely the true
    *     heavy hitters (the MG superset guarantee makes the filter
    *     lossless), so the result is deterministic — merge-order and
    *     partition-layout invariant — and hash-exact under the oracle's
    *     plain GROUP BY … HAVING, which DuckDB can afford at fixture
    *     scale but a 100 TB engine cannot.
    */
  def heavyTrigrams(documents: DataFrame, capacity: Int = 128): DataFrame = {
    val grams = trigramStream(documents)
    val sketch = grams.agg(
      count(lit(1)).as("n"),
      expr(s"misra_gries(g, $capacity)").as("sk"))
    val cands = sketch
      .select(col("n"), explode(col("sk")).as("c"))
      .select(col("n"), col("c.key").as("g"))
    grams
      .join(broadcast(cands), Seq("g"))
      .groupBy("g", "n")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(capacity.toLong) > col("n"))
      .select(col("g").as("trigram"), col("cnt"))
      .orderBy(col("cnt").desc, col("trigram"))
  }

  private val l50Sql =
    """WITH g AS (SELECT substring(text, i, 3) AS trigram
      |           FROM (SELECT text, unnest(range(1, length(text)-1)) AS i
      |                 FROM documents WHERE length(text) >= 3))
      |SELECT trigram, count(*) AS cnt
      |FROM g GROUP BY 1
      |HAVING count(*) * 128 > (SELECT count(*) FROM g)
      |ORDER BY cnt DESC, trigram""".stripMargin

  /** l51 — bigram-LM familiarity filter: the perplexity-style quality gate
    * (the CCNet/KenLM wellformedness filter; reference quality scoring:
    * consumer.py:283-296) re-expressed in exact rational arithmetic. A
    * Laplace-smoothed bigram model is fit on the corpus itself —
    * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + |V|)` — and each document is
    * scored by its mean transition probability ("familiarity"). Ranking by
    * familiarity is the monotone inverse of ranking by perplexity over the
    * same model, without the libm `log` whose uncorrectly-rounded results
    * l43's note rules out for cross-engine hashes. Low-familiarity docs
    * (improbable transitions under the corpus model) are what a curation
    * pipeline drops or down-weights; smoothing is what keeps a doc of
    * hapax bigrams from degenerately scoring 1.0 under the ML estimate.
    *
    * Shape: one explode to bigrams; vocab²-bounded count tables; the
    * scalar |V| attached via a broadcast 1-row cross join (q17's sanctioned
    * pattern); one gram-keyed equi-join back to the exploded corpus
    * (linear, map-side combine); doc- then source-level rollups. Each p is
    * one exact double division, then quantized to integer micro-probs via
    * `floor(p * 1e6)` — floor has no rounding ties (the decimal
    * accumulator's HALF_UP cast disagrees with DuckDB's half-even exactly
    * when a dyadic p like odd/128 lands on the 6-decimal halfway point),
    * so every reduction after the division is exact integer arithmetic
    * and bit-identical cross-engine by construction. */
  def lmFamiliarity(documents: DataFrame): DataFrame = {
    // persisted: the bigram stream feeds BOTH the model fit (bc/pc) and
    // the per-doc scoring join — uncached the tokenize+explode runs twice
    val bg = graft.CacheScope.manage(documents
      .withColumn("ts", split(col("text"), " "))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(0, size(ts)-2),
          |  i -> struct(element_at(ts, i+1) AS w1, element_at(ts, i+2) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1"), col("b.w2"))
      .persist())
    val vocab = documents
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .agg(countDistinct(col("t")).as("vsz"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val pc = bc.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val p = bc.join(pc, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        floor((col("c2") + 1).cast("double") / (col("c1") + col("vsz")) * 1e6)
          .as("micro_p"))
    val doc = bg.join(p, Seq("w1", "w2"))
      .groupBy("doc_id", "source")
      .agg(expr("sum(micro_p) div count(micro_p)").as("micro_fam"))
    doc.groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        (sum(col("micro_fam")).cast("double") / count(lit(1))).as("avg_microfam"),
        min(col("micro_fam")).as("min_microfam"),
        sum(when(col("micro_fam") < 33000L, 1L).otherwise(0L)).as("filtered_docs"))
      .orderBy("source")
  }

  private val l51Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |v AS (
       |  SELECT count(DISTINCT t) AS vsz
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |bg AS (
       |  SELECT doc_id, source, ts[i] AS w1, ts[i+1] AS w2
       |  FROM (SELECT doc_id, source, ts, unnest(range(1, len(ts))) AS i FROM toks)),
       |bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
       |pc AS (SELECT w1, cast(sum(c2) as bigint) AS c1 FROM bc GROUP BY 1),
       |p AS (
       |  SELECT bc.w1, bc.w2,
       |    cast(floor(cast(c2 + 1 as double) / (c1 + vsz) * 1e6) as bigint) AS micro_p
       |  FROM bc JOIN pc ON bc.w1 = pc.w1 CROSS JOIN v),
       |doc AS (
       |  SELECT doc_id, source,
       |    cast(sum(micro_p) as bigint) // count(micro_p) AS micro_fam
       |  FROM bg JOIN p ON bg.w1 = p.w1 AND bg.w2 = p.w2
       |  GROUP BY 1, 2)
       |SELECT source, count(*) AS docs,
       |  cast(sum(micro_fam) as double) / count(*) AS avg_microfam,
       |  min(micro_fam) AS min_microfam,
       |  cast(sum(CASE WHEN micro_fam < 33000 THEN 1 ELSE 0 END) as bigint) AS filtered_docs
       |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("l09_corpus_stats", (s, d) => corpusStats(Tables.documents(s, d)), Some(l09Sql)),
    Q("l10_lang_id", (s, d) => langId(Tables.documents(s, d)), Some(l10Sql)),
    Q("l11_token_count", (s, d) => tokenCount(Tables.documents(s, d)), Some(l11Sql)),
    Q("l12_quality_score", (s, d) => qualityScore(Tables.documents(s, d)), Some(l12Sql)),
    Q("l13_fingerprint", (s, d) => fingerprint(Tables.documents(s, d)), Some(l13Sql)),
    Q("l25_fingerprint_fast", (s, d) => fingerprintFast(Tables.documents(s, d)), None),
    Q("l49_fingerprint_agreement",
      (s, d) => fingerprintAgreement(Tables.documents(s, d)), Some(l49Sql)),
    Q("l20_scrub_stats", (s, d) => scrubStats(Tables.documents(s, d)), Some(l20Sql)),
    Q("l21_top_terms", (s, d) => topTerms(Tables.documents(s, d)), Some(l21Sql)),
    Q("l22_tfidf_terms", (s, d) => tfidfTerms(Tables.documents(s, d)), Some(l22Sql)),
    Q("l32_repetition_stats", (s, d) => repetitionStats(Tables.documents(s, d)), Some(l32Sql)),
    Q("l33_packing_plan", (s, d) => packingPlan(Tables.documents(s, d)), Some(l33Sql)),
    Q("l34_vocab_coverage", (s, d) => vocabCoverage(Tables.documents(s, d)), Some(l34Sql)),
    Q("l37_chunk_plan", (s, d) => chunkPlan(Tables.documents(s, d)), Some(l37Sql)),
    Q("l40_html_extract", (s, d) => htmlExtractStats(Tables.documents(s, d)), Some(l40Sql)),
    Q("l43_bigram_novelty", (s, d) => bigramNovelty(Tables.documents(s, d)), Some(l43Sql)),
    Q("l50_heavy_trigrams", (s, d) => heavyTrigrams(Tables.documents(s, d)), Some(l50Sql)),
    Q("l51_lm_familiarity", (s, d) => lmFamiliarity(Tables.documents(s, d)), Some(l51Sql)))
}
