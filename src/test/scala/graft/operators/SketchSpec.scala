package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SketchSpec extends SparkSuite {

  test("HLL sketch rollup: union of daily sketches estimates period DAU within 5%") {
    val ev = graft.Tables.events(spark, sfDir("0.01"))
    val out = SurfaceQueries.hllRollup(ev)
    val total = out.filter(col("day").isNull).head()
    val approx = total.getAs[Long]("approx_dau").toDouble
    val exact = total.getAs[Long]("exact_dau").toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
    // every daily estimate is also within bound
    out.filter(col("day").isNotNull).collect().foreach { r =>
      val a = r.getAs[Long]("approx_dau").toDouble
      val e = r.getAs[Long]("exact_dau").toDouble
      assert(math.abs(a - e) / e <= 0.05)
    }
  }

  test("q39 driver gate stays in its ±10% band on the current fixture (re-validate on drift)") {
    // The driver pins q39's approx_ok column to literal `true`, so a
    // fixture whose realized HLL error drifts past 10% would surface as
    // an opaque hash mismatch in CORRECTNESS. This check fails FIRST,
    // with the instruction: the band is ≳6σ at lgConfigK=12 (see
    // hllRollupAudit's Scaladoc), so an out-of-band estimate on a fresh
    // fixture means a real regression in the sketch pipeline — not a
    // band to widen. Re-validate by re-running this suite against the
    // regenerated fixtures before touching the 0.10 constant.
    for (sf <- Seq("0.001", "0.01")) {
      val bad = SurfaceQueries.hllRollupAudit(graft.Tables.events(spark, sfDir(sf)))
        .filter(!col("approx_ok")).collect()
      assert(bad.isEmpty,
        s"q39 HLL estimate out of the ±10% driver band at sf$sf for days " +
          s"${bad.map(_.get(0)).mkString(", ")} — the CORRECTNESS q39 row will " +
          "hash-mismatch; investigate the sketch pipeline (hllRollupAudit Scaladoc) " +
          "rather than widening the band")
    }
  }

  test("HLL estimates are partition-layout invariant (q39's oracle rests on this determinism)") {
    val ev = graft.Tables.events(spark, sfDir("0.01"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      SurfaceQueries.hllRollup(df).collect().map(_.toString).toSeq
    assert(rollup(ev) === rollup(ev.repartition(17, col("event_id"))),
      "the HLL register state must be a pure function of the value set, " +
        "not of how rows are partitioned or merged")
  }

  test("the quartile session store is a pure cache: q57 via store equals the direct computation") {
    val d = sfDir("0.01")
    val li = graft.Tables.lineitem(spark, d)
    val direct = SurfaceQueries.iqrOutliers(li).collect().toSeq
    val viaStore = graft.SparkEntry.queries("q57_iqr_outliers")(spark, d).collect().toSeq
    assert(viaStore === direct, "the store must change performance, never results")
  }

  test("q63 approx fences track q57's exact quartiles within 1% and agree on outlier mass") {
    val li = graft.Tables.lineitem(spark, sfDir("0.01"))
    def byFlag(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("q1"), r.getAs[Double]("q3"), r.getAs[Double]("outlier_frac")))).toMap
    val exact = byFlag(SurfaceQueries.iqrOutliers(li))
    val approx = byFlag(SurfaceQueries.iqrOutliersApprox(li))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (flag, (q1e, q3e, fracE)) =>
      val (q1a, q3a, fracA) = approx(flag)
      assert(math.abs(q1a - q1e) / q1e <= 0.01, s"$flag q1: approx=$q1a exact=$q1e")
      assert(math.abs(q3a - q3e) / q3e <= 0.01, s"$flag q3: approx=$q3a exact=$q3e")
      // a ≤1% fence shift may only move a sliver of the tail
      assert(math.abs(fracA - fracE) <= 0.01, s"$flag frac: approx=$fracA exact=$fracE")
    }
  }
}
