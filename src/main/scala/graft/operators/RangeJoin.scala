package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Det.{dsum, sqlDsum}

/** Binned range join — the pure range join (NO equi key) Spark cannot
  * plan efficiently: `L.pt BETWEEN R.start AND R.end` with no equality
  * conjunct falls to BroadcastNestedLoopJoin (one side must fit in
  * memory) or a full CartesianProduct — the classic 100 TB trap, and
  * the "range join" entry on the brief's list of operators Spark lacks
  * (as-of ✓, range ✓ here, sketches ✓). The reference's session/anomaly
  * correlation queries (spark-jobs/real_time_streaming.py's
  * window-overlap checks) are this shape once the windows stop being
  * per-key.
  *
  * The rewrite is the standard bin trick, built from existing operators
  * (brief preference (a)): quantize time into fixed-width bins, explode
  * each interval onto every bin it overlaps, tag each point with its
  * single bin, equi-join on the bin, then keep the exact residual
  * predicate. The equi-join shuffles both sides by bin — distributed,
  * AQE-coalesced, skew-salvageable like any groupBy key — and the
  * residual runs inside the joined stage.
  *
  * Correctness does not depend on the bin width; COST does:
  *  - a point lives in exactly ONE bin → point-in-interval pairs can
  *    never duplicate, no dedup pass;
  *  - an interval spanning k bins is replicated k times, k ≤
  *    ⌈length/width⌉ + 1 — pick the width near the typical interval
  *    length (p95 is the robust choice) so k stays ≤ 2;
  *  - interval×interval overlap CAN see one pair in several shared
  *    bins; instead of a distinct pass, a pair is counted only in the
  *    bin containing the overlap's START (`greatest(l.start, r.start)`
  *    lies inside both intervals, so exactly one shared bin qualifies)
  *    — dedup for free, in the residual filter.
  *
  * Bin ids use exact integer arithmetic: `(µs − µs mod w) / w` divides
  * an exact multiple, so the double division is lossless for any epoch
  * < 2⁵³ µs — no floating floor at bin boundaries.
  */
object RangeJoin {

  /** 10-minute bins in microseconds — near the p95 of the registry
    * queries' 1–11 minute windows, so each interval lands in ≤ 2 bins. */
  val DefaultBinMicros: Long = 10L * 60 * 1000 * 1000

  /** Hard cap on bins per interval. The bin trick replicates an interval
    * once per touched bin, so an interval long relative to `binWidth` —
    * or a caller-chosen tiny width — multiplies rows by k = length/width;
    * unguarded, a single pathological interval could exceed Spark's max
    * array length inside `sequence()` and fail the whole query. The API
    * contract is k ≲ 2 (pick the width near the p95 interval length);
    * 65 536 is ~4 orders of magnitude of headroom beyond that, and past
    * it the query is mis-configured, so the guard fails FAST with an
    * actionable message instead of an opaque codegen/array error. */
  val MaxBinsPerInterval: Long = 65536L

  /** Exact bin index of a long-domain magnitude column. */
  private def binIdx(mag: Column, w: Long): Column =
    ((mag - pmod(mag, lit(w))) / lit(w)).cast("long")

  /** Columns the salt hash spreads over: the caller's explicit pick, or
    * every hash-able column (xxhash64 rejects MapType children at
    * analysis time; maps are excluded so a map-carrying frame still
    * salts). Prefer naming the key/ts/id columns — hashing a wide
    * payload spreads no better and costs per-row work. Shared by
    * [[pointInIntervalSalted]] and [[AsOfJoin.asofJoinSalted]]. */
  private[operators] def saltHashCols(df: DataFrame, explicit: Seq[String]): Seq[Column] = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val names =
      if (explicit.nonEmpty) explicit
      else df.schema.fields.collect { case f if !hasMap(f.dataType) => f.name }.toSeq
    require(names.nonEmpty, "salted join: no hash-able columns to salt over")
    names.map(col)
  }

  /** The column's long-domain magnitude — the join works over ANY
    * totally-ordered domain with a long embedding: timestamps bin in
    * microseconds, dates in days, integral/floating domains as their
    * floor (IP-as-long blocks, value bands, id ranges). Bin width is in
    * the SAME units. */
  private def magnitude(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case DateType => datediff(col(c), to_date(lit("1970-01-01"))).cast("long")
      case _ => floor(col(c)).cast("long")
    }
  }

  /** All bins [start, end) touches, as one exploded column. Empty and
    * inverted intervals are dropped (they can contain nothing).
    *
    * The last touched bin: for EXACTLY-embedded domains (timestamps,
    * dates, integrals — magnitude is lossless) the largest contained
    * value is `end − 1`, so its bin is tight. For FRACTIONAL domains
    * the magnitude floors, and `floor(end) − 1` can fall BELOW the last
    * touched bin (e.g. [2.5, 3.2) touches bin 3, but floor(3.2)−1 = 2)
    * — there the last bin is `floor(end)`'s, over-covering by one bin
    * only when `end` sits exactly on a boundary; the extra candidates
    * die in the residual, trading a sliver of work for correctness. */
  private def intervalBins(iv: DataFrame, startCol: String, endCol: String,
                           w: Long): Column = {
    val endMag = magnitude(iv, endCol)
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
    val lastMag = iv.schema(endCol).dataType match {
      case DoubleType | FloatType | _: DecimalType => endMag
      case _ => endMag - 1
    }
    val firstBin = binIdx(magnitude(iv, startCol), w)
    val lastBin = binIdx(lastMag, w)
    // guard the replication factor BEFORE sequence() materializes it —
    // see MaxBinsPerInterval. Null-safe: a NULL start/end keeps the old
    // contract (sequence() over a null bound yields null → explode drops
    // the row) instead of routing to raise_error via a null condition.
    val guardedLast = when(
      lastBin.isNull || firstBin.isNull ||
        lastBin - firstBin < lit(MaxBinsPerInterval), lastBin)
      .otherwise(raise_error(concat(
        lit(s"graft.RangeJoin: interval spans more than $MaxBinsPerInterval bins "),
        lit("(length "), (lastMag - magnitude(iv, startCol) + 1).cast("string"),
        lit(s" over binWidth $w) — widen binWidth toward the p95 interval length")))
        .cast("long"))
    explode(sequence(firstBin, guardedLast))
  }

  /** Point-in-interval join: rows of `points` × rows of `intervals`
    * with `start <= pt < end` (half-open), no key required. Output =
    * point columns ++ interval columns; callers pre-project to disjoint
    * names. Each matched pair appears exactly once. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long = DefaultBinMicros): DataFrame = {
    val pts = points.withColumn("__bin", binIdx(magnitude(points, pointCol), binWidth))
    val ivs = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bin", intervalBins(intervals, startCol, endCol, binWidth))
    pts.join(ivs, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** [[pointInInterval]] with SALTED bin keys — the skew recipe (q49/q50's
    * composition proven on the range join): a bursty workload can
    * concentrate half the intervals in ONE time bin (an incident window,
    * a flash sale), and the bin equi-join then ships that entire bin to
    * one shuffle partition — the straggler task that decides the job's
    * wall clock at 100 TB. Salting splits each bin's INTERVALS into
    * `saltBuckets` deterministic groups (hash of the whole interval row,
    * so equal-start duplicates still spread) and replicates each POINT
    * across all groups, turning the hot bin into `saltBuckets` evenly
    * sized join partitions. Each matched pair still appears exactly
    * once: an interval holds one salt, a point meets every salt once.
    *
    * Cost: point-side rows × saltBuckets extra shuffle volume — pick a
    * small S (8 here) and, at production scale, salt only bins a stats
    * pass flags as hot; correctness is salt-invariant either way
    * (RangeJoinSpec pins salted == unsalted row-for-row). */
  def pointInIntervalSalted(points: DataFrame, pointCol: String,
                            intervals: DataFrame, startCol: String, endCol: String,
                            binWidth: Long = DefaultBinMicros,
                            saltBuckets: Int = 8,
                            saltCols: Seq[String] = Nil): DataFrame = {
    val pts = points
      .withColumn("__bin", binIdx(magnitude(points, pointCol), binWidth))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val ivs = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bin", intervalBins(intervals, startCol, endCol, binWidth))
      .withColumn("__salt",
        pmod(xxhash64(saltHashCols(intervals, saltCols): _*), lit(saltBuckets))
          .cast("int"))
    pts.join(ivs, Seq("__bin", "__salt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin", "__salt")
  }

  // ---- engine-selected stats (round 12) -----------------------------
  //
  // Round 11 shipped the scale-safe VARIANTS (salted join, capped bins)
  // but left both caller-selected; a 100 TB user doesn't know their key
  // is hot (or their p95 interval length) until the straggler. These
  // stats passes close that gap: a cheap sampled pre-pass over the
  // NARROW stats column (start/length/key only — column pruning reaches
  // the scan) picks the bin width from the p95 interval length and
  // flags hot bins/keys above a concentration threshold, so the engine
  // selects the salted plan exactly when the data needs it. The
  // decision only chooses between row-identical plans (RangeJoinSpec /
  // AsOfJoinPlanSpec pin salted ≡ unsalted), so sampling jitter can
  // affect cost, never results. The two scalar collects are the
  // sanctioned watermark pattern (aggregated stats, never data) — the
  // same trade Spark itself makes driver-side in JoinSelection.

  /** Receipts of the last [[pointInIntervalAuto]] /
    * [[intervalOverlapAuto]] decision — the chosen width also appears
    * verbatim in the plan (the `pmod(ts, width)` literal). */
  /** `mode`: "plain" (no hot bin), "partial" (only hot bins salted), or
    * "global" (hot bins own ≥ [[GlobalSaltCutover]] of the join — one
    * uniformly salted exec); `salted` = mode != plain. */
  final case class AutoRangeStats(binWidth: Long, hotBinShare: Double,
                                  salted: Boolean, hotBins: Seq[Any] = Nil,
                                  mode: String = "plain")
  @volatile var lastAutoRange: Option[AutoRangeStats] = None

  /** Hottest-bin/key concentration above which the salted plan is
    * selected: one bin/key owning ≥20% of rows pins ≥20% of the join on
    * one shuffle partition — far above uniform noise (~1/#bins), far
    * below any real burst (the q94/q98 fixtures sit at ~50%). */
  val HotShareThreshold: Double = 0.2

  /** Stats-pass sample fraction: enough rows that a ≥20% concentration
    * is unmissable (a 10% sample of any realistic fixture leaves
    * thousands of rows on the hot value), a small multiple of the
    * narrow column's scan cost. */
  val StatsSampleFraction: Double = 0.1

  /** Sampled hot-value histogram of `keyCol` in `df`: the values whose
    * share crosses `threshold` (at most ⌈1/threshold⌉ of them — the
    * collect is bounded metadata, like the q08 watermark scalar) plus
    * the hottest single share. Deterministic seed — reproducible plans.
    * Returns (Nil, 0.0) on an empty sample. */
  private[operators] def hotValues(df: DataFrame, keyCol: Column,
                                   sampleFraction: Double,
                                   threshold: Double): HotStats = {
    val base = df.select(keyCol.as("__k")).filter(col("__k").isNotNull)
    val s = if (sampleFraction >= 1.0) base
            else base.sample(withReplacement = false, sampleFraction, 42L)
    val stats = hotValuesFromKeys(s, threshold)
    // tiny sample → noise-dominated estimate → redo on the full frame
    if (sampleFraction < 1.0 && stats.sampledRows < MinStatsRows)
      hotValuesFromKeys(base, threshold)
    else stats
  }

  /** Combined-hot-share above which GLOBAL salting beats PARTIAL: when
    * the hot values own this much of the join, nearly every row rides
    * the salted branch anyway, so the partial split's second join
    * (plan + shuffle fixed costs) buys little avoided replication —
    * one uniformly-salted exec is the cheaper plan. Below it the hot
    * slice is thin and partial's savings (only the sliver replicates)
    * dominate. */
  val GlobalSaltCutover: Double = 0.4

  /** Sampled histogram receipts: the hot values (share ≥ threshold),
    * the hottest single share, the hot values' COMBINED share (the
    * number the plan ladder cuts over on), and how many sampled rows
    * backed the estimate. */
  private[operators] final case class HotStats(
      hot: Seq[Any], maxShare: Double, hotSumShare: Double, sampledRows: Long)

  /** Below this many sampled rows the share estimate is noise-dominated
    * (a 10% sample of a tiny frame), so the stats pass re-runs on the
    * FULL frame — which at that size costs next to nothing. */
  val MinStatsRows: Long = 5000L

  /** The histogram tail of [[hotValues]] over an already-sampled key
    * frame (column `__k`). */
  private def hotValuesFromKeys(keys: DataFrame, threshold: Double): HotStats = {
    val counts = keys.filter(col("__k").isNotNull).groupBy("__k").count().persist()
    try {
      val r = counts.agg(max("count").as("mx"), sum("count").as("tot")).head()
      if (r.isNullAt(1) || r.getLong(1) == 0L) HotStats(Nil, 0.0, 0.0, 0L)
      else {
        val tot = r.getLong(1)
        val hotRows = counts.filter(col("count") >= lit(threshold * tot))
          .select(col("__k"), col("count")).collect()
        HotStats(hotRows.map(_.get(0)).toSeq, r.getLong(0).toDouble / tot,
          hotRows.map(_.getLong(1)).sum.toDouble / tot, tot)
      }
    } finally { counts.unpersist(); () }
  }

  /** Engine-chosen bin width: the sampled p95 interval length (the
    * robust pick the [[MaxBinsPerInterval]] cap error has always told
    * users to make — now computed instead of hand-tuned), clamped to
    * ≥1 unit; falls back to [[DefaultBinMicros]] when no valid
    * intervals exist. At width = p95, 95% of intervals replicate onto
    * ≤2 bins and the long tail is bounded by the cap guard. */
  def autoBinWidth(intervals: DataFrame, startCol: String, endCol: String,
                   sampleFraction: Double = StatsSampleFraction): Long = {
    val base = intervals.filter(col(startCol) < col(endCol))
      .select((magnitude(intervals, endCol) - magnitude(intervals, startCol)).as("__len"))
    val s = if (sampleFraction >= 1.0) base
            else base.sample(withReplacement = false, sampleFraction, 42L)
    val r = s.agg(percentile_approx(col("__len"), lit(0.95), lit(10000)).as("p95")).head()
    if (r.isNullAt(0)) DefaultBinMicros else math.max(1L, r.getLong(0))
  }

  /** [[pointInInterval]] with the salt applied ONLY inside the listed
    * hot bins — the per-bin form of [[pointInIntervalSalted]] and the
    * shape a 100 TB burst actually wants: the global variant replicates
    * EVERY point `saltBuckets`×, where the burst only needs the hot
    * bins' points replicated (typically a sliver of the fact — one
    * incident window out of months of data). Exactness: a (point,
    * interval) pair meets in exactly ONE bin — the point's — so routing
    * by that bin's hotness partitions the pair space between the two
    * branches; the salted branch repeats the q94 argument per hot bin.
    * Null-bin rows match nothing in either branch, exactly like the
    * plain equi-join. */
  def pointInIntervalSaltedPartial(points: DataFrame, pointCol: String,
                                   intervals: DataFrame, startCol: String, endCol: String,
                                   hotBins: Seq[Any],
                                   binWidth: Long = DefaultBinMicros,
                                   saltBuckets: Int = 8,
                                   saltCols: Seq[String] = Nil): DataFrame = {
    require(hotBins.nonEmpty, "partial salting needs a non-empty hot-bin list")
    val pts = points.withColumn("__bin", binIdx(magnitude(points, pointCol), binWidth))
    val ivs = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bin", intervalBins(intervals, startCol, endCol, binWidth))
    val hot = col("__bin").isin(hotBins: _*)
    val plainPart = pts.filter(!hot).join(ivs.filter(!hot), Seq("__bin"))
    val saltedPart = pts.filter(hot)
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .join(ivs.filter(hot).withColumn("__salt",
        pmod(xxhash64(saltHashCols(intervals, saltCols): _*), lit(saltBuckets))
          .cast("int")),
        Seq("__bin", "__salt"))
      .drop("__salt")
    plainPart.unionByName(saltedPart)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** [[pointInInterval]] with BOTH knobs engine-selected: bin width from
    * the sampled p95 interval length, and the salt applied only to the
    * BINS the stats pass flags hot (share ≥ `hotShareThreshold`) —
    * uniform data keeps the plain (cheaper) plan, a burst salts just
    * its own bins ([[pointInIntervalSaltedPartial]]). Results are
    * identical in all three regimes; the decision is recorded in
    * [[lastAutoRange]]. */
  def pointInIntervalAuto(points: DataFrame, pointCol: String,
                          intervals: DataFrame, startCol: String, endCol: String,
                          binWidth: Option[Long] = None,
                          saltBuckets: Int = 8,
                          hotShareThreshold: Double = HotShareThreshold,
                          sampleFraction: Double = StatsSampleFraction): DataFrame = {
    // ONE sampled pass over the interval side's two magnitude columns,
    // cached: both the p95 width and the hot-bin histogram derive from
    // this tiny frame — the stats cost is one pruned sampled scan plus
    // kilobyte-scale jobs, not repeated full scans of the interval side
    // (measured: 3 full scans → 1 sampled scan cut q88's auto overhead
    // ~3×).
    val mags0 = intervals.filter(col(startCol) < col(endCol))
      .select(magnitude(intervals, startCol).as("__s"), magnitude(intervals, endCol).as("__e"))
    val mags = graft.CacheScope.manage(
      (if (sampleFraction >= 1.0) mags0
       else mags0.sample(withReplacement = false, sampleFraction, 42L)).persist())
    val w = binWidth.getOrElse {
      val r = mags.agg(percentile_approx(col("__e") - col("__s"), lit(0.95), lit(10000))
        .as("p95")).head()
      if (r.isNullAt(0)) DefaultBinMicros else math.max(1L, r.getLong(0))
    }
    // the hot-bin histogram keys on the interval side's EXPLODED bins —
    // the actual distribution of the equi-join key, so it catches both
    // a pile-up of starts (the burst) and long intervals stacking over
    // one bin. Stats-only bin walk: truncated at 64 bins/interval (a
    // longer tail cannot change which bin is ≥20% hot).
    val firstBin = floor(col("__s") / w).cast("long")
    val lastBin = floor((col("__e") - 1) / w).cast("long")
    def binKeys(src: DataFrame) = src.select(explode(sequence(firstBin,
      least(greatest(lastBin, firstBin), firstBin + 63))).as("__k"))
    val stats0 = hotValuesFromKeys(binKeys(mags), hotShareThreshold)
    // tiny sample → noise-dominated estimate → redo on the full frame
    val stats =
      if (sampleFraction < 1.0 && stats0.sampledRows < MinStatsRows)
        hotValuesFromKeys(binKeys(mags0), hotShareThreshold)
      else stats0
    // the three-way plan ladder: no hot bin → plain; a thin hot sliver
    // → salt just those bins; a burst owning most of the join → one
    // globally salted exec (see GlobalSaltCutover)
    val mode =
      if (stats.hot.isEmpty) "plain"
      else if (stats.hotSumShare >= GlobalSaltCutover) "global"
      else "partial"
    lastAutoRange = Some(AutoRangeStats(w, stats.maxShare, mode != "plain",
      stats.hot, mode))
    mode match {
      case "global" =>
        pointInIntervalSalted(points, pointCol, intervals, startCol, endCol, w, saltBuckets)
      case "partial" =>
        pointInIntervalSaltedPartial(points, pointCol, intervals, startCol, endCol,
          stats.hot, w, saltBuckets)
      case _ =>
        pointInInterval(points, pointCol, intervals, startCol, endCol, w)
    }
  }

  /** [[intervalOverlap]] on an engine-chosen width: the larger of the
    * two sides' p95 lengths (the wider side dominates replication). */
  def intervalOverlapAuto(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          sampleFraction: Double = StatsSampleFraction): DataFrame = {
    val w = math.max(autoBinWidth(left, lStart, lEnd, sampleFraction),
      autoBinWidth(right, rStart, rEnd, sampleFraction))
    lastAutoRange = Some(AutoRangeStats(w, 0.0, salted = false))
    intervalOverlap(left, lStart, lEnd, right, rStart, rEnd, w)
  }

  /** Interval-overlap join: pairs with a POSITIVE overlap between
    * half-open [lStart, lEnd) and [rStart, rEnd). The residual keeps a
    * pair only in the bin holding `greatest(lStart, rStart)` — the
    * overlap's first instant, inside both intervals — so a pair sharing
    * several bins still appears exactly once, with no distinct. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long = DefaultBinMicros): DataFrame = {
    val l = left.filter(col(lStart) < col(lEnd))
      .withColumn("__bin", intervalBins(left, lStart, lEnd, binWidth))
    val r = right.filter(col(rStart) < col(rEnd))
      .withColumn("__bin", intervalBins(right, rStart, rEnd, binWidth))
    l.join(r, Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(binIdx(greatest(magnitude(left, lStart), magnitude(right, rStart)),
        binWidth) === col("__bin"))
      .drop("__bin")
  }

  // ---- registry queries over the events fixture -----------------------

  /** Purchase attention windows: [ts, ts + (event_id%7 + 1) minutes). */
  private[graft] def purchaseWindows(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("w_id"),
        ((col("event_id") % 7) + 1).cast("int").as("w_len"),
        col("ts").as("w_start"),
        (col("ts") + expr("make_dt_interval(0, 0, cast(event_id % 7 + 1 as int), 0)"))
          .as("w_end"))

  /** Error blast windows: [ts, ts + (event_id%11 + 1) minutes). */
  private[graft] def errorWindows(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "error")
      .select(
        col("event_id").as("e_id"),
        col("ts").as("e_start"),
        (col("ts") + expr("make_dt_interval(0, 0, cast(event_id % 11 + 1 as int), 0)"))
          .as("e_end"))

  /** The shared q88/q94/q100 rollup over a point-in-window join. */
  private def windowHitRollup(joined: DataFrame): DataFrame =
    joined.groupBy("w_len")
      .agg(
        count(lit(1)).as("n_hits"),
        countDistinct(col("w_id")).as("windows_hit"),
        dsum(col("value")).as("value_sum"))
      .orderBy("w_len")

  /** q88 — events landing inside ANY purchase window (no key: global
    * time correlation), rolled up by window length. The naive form is a
    * BroadcastNestedLoopJoin; the binned form is an equi-join on the
    * time bin (RangeJoinSpec pins both plans and row equality). Round
    * 12: the width comes from [[autoBinWidth]] (sampled p95 window
    * length) and the stats pass leaves this UNIFORM window set on the
    * plain unsalted plan — both knobs engine-selected. */
  def pointInWindowRollup(events: DataFrame): DataFrame =
    windowHitRollup(pointInIntervalAuto(
      events.select(col("event_id"), col("ts"), col("value")), "ts",
      purchaseWindows(events), "w_start", "w_end"))

  private[graft] val q88Sql =
    s"""WITH w AS (
       |  SELECT event_id AS w_id, cast(event_id % 7 + 1 as int) AS w_len,
       |         ts AS w_start,
       |         ts + (event_id % 7 + 1) * INTERVAL 1 MINUTE AS w_end
       |  FROM events WHERE event_type = 'purchase')
       |SELECT w_len, cast(count(*) as bigint) AS n_hits,
       |  cast(count(DISTINCT w_id) as bigint) AS windows_hit,
       |  ${sqlDsum("value")} AS value_sum
       |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q89 — purchase windows overlapping error windows (incident
    * correlation), with the exact overlap mass in microseconds. The
    * overlap-start residual replaces a distinct over multi-bin pairs.
    * Round 12: width engine-chosen from both sides' sampled p95. */
  def windowOverlapRollup(events: DataFrame): DataFrame =
    intervalOverlapAuto(
      purchaseWindows(events), "w_start", "w_end",
      errorWindows(events), "e_start", "e_end")
      .groupBy("w_len")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(unix_micros(least(col("w_end"), col("e_end"))) -
          unix_micros(greatest(col("w_start"), col("e_start")))).as("overlap_micros"))
      .orderBy("w_len")

  private val q89Sql =
    s"""WITH w AS (
       |  SELECT event_id AS w_id, cast(event_id % 7 + 1 as int) AS w_len,
       |         ts AS w_start,
       |         ts + (event_id % 7 + 1) * INTERVAL 1 MINUTE AS w_end
       |  FROM events WHERE event_type = 'purchase'),
       |er AS (
       |  SELECT event_id AS e_id, ts AS e_start,
       |         ts + (event_id % 11 + 1) * INTERVAL 1 MINUTE AS e_end
       |  FROM events WHERE event_type = 'error')
       |SELECT w_len, cast(count(*) as bigint) AS n_pairs,
       |  cast(sum(epoch_us(least(w_end, e_end)) - epoch_us(greatest(w_start, e_start))) as bigint)
       |    AS overlap_micros
       |FROM w JOIN er ON w.w_start < er.e_end AND er.e_start < w.w_end
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Skewed window set: HALF the purchase windows start at one fixed
    * instant (an incident burst), so their bins concentrate in one
    * shuffle partition under the plain bin join — the q94 fixture. */
  private[graft] def skewedWindows(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("w_id"),
        ((col("event_id") % 7) + 1).cast("int").as("w_len"),
        when(col("event_id") % 2 === 0, to_timestamp(lit("2024-01-15 12:00:00")))
          .otherwise(col("ts")).as("w_start"))
      .withColumn("w_end",
        col("w_start") + expr("make_dt_interval(0, 0, w_len, 0)"))

  /** q94 — the q88 rollup over the BURSTY window set through the SALTED
    * bin join: one 10-minute bin carries ~half of all windows, the
    * shape where the plain bin equi-join degrades to one straggler
    * partition; the salt splits that bin's windows into 8 even groups
    * (RangeJoinSpec pins salted ≡ unsalted rows and the composite join
    * key). */
  def skewedPointInWindowRollup(events: DataFrame): DataFrame =
    windowHitRollup(pointInIntervalSalted(
      events.select(col("event_id"), col("ts"), col("value")), "ts",
      skewedWindows(events), "w_start", "w_end"))

  /** q100 — the q94 burst fixture through the FULLY ENGINE-SELECTED
    * path ([[pointInIntervalAuto]]): the stats pass measures the ~50%
    * hot-bin concentration and applies the salt itself; same oracle,
    * same hashes as q94 (RangeJoinSpec pins the decision on both the
    * skewed and uniform fixtures, the controlled bench pins the
    * auto-vs-hand-picked cost). q94 stays registered as the
    * hand-picked baseline so the stats-pass overhead remains a
    * measured number, not a claim. */
  def autoSkewedPointInWindowRollup(events: DataFrame): DataFrame =
    windowHitRollup(pointInIntervalAuto(
      events.select(col("event_id"), col("ts"), col("value")), "ts",
      skewedWindows(events), "w_start", "w_end"))

  private val q94Sql =
    s"""WITH w AS (
       |  SELECT event_id AS w_id, cast(event_id % 7 + 1 as int) AS w_len,
       |         CASE WHEN event_id % 2 = 0 THEN TIMESTAMP '2024-01-15 12:00:00'
       |              ELSE ts END AS w_start
       |  FROM events WHERE event_type = 'purchase')
       |SELECT w_len, cast(count(*) as bigint) AS n_hits,
       |  cast(count(DISTINCT w_id) as bigint) AS windows_hit,
       |  ${sqlDsum("value")} AS value_sum
       |FROM events e JOIN w
       |  ON e.ts >= w.w_start AND e.ts < w.w_start + w_len * INTERVAL 1 MINUTE
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q88_range_bin_join", (s, d) =>
      pointInWindowRollup(graft.Tables.events(s, d)), Some(q88Sql)),
    Q("q89_interval_overlap", (s, d) =>
      windowOverlapRollup(graft.Tables.events(s, d)), Some(q89Sql)),
    Q("q94_range_join_skew_salted", (s, d) =>
      skewedPointInWindowRollup(graft.Tables.events(s, d)), Some(q94Sql)),
    Q("q100_range_join_auto_salt", (s, d) =>
      autoSkewedPointInWindowRollup(graft.Tables.events(s, d)), Some(q94Sql)))
}
