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
}
