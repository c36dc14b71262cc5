package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val skewed =
    ((1 to 1000).map(i => ("hot", i.toDouble)) ++ (1 to 50).map(i => (s"k$i", i.toDouble)))
      .toDF("k", "v")

  test("salted aggregation matches the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted join matches the direct join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k2", "K2")).toDF("k", "label")
    val direct = skewed.join(dim, "k").groupBy("label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy("label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === direct)
  }
}
