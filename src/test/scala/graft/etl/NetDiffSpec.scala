package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins [[NetDiff.tagged]]'s contract: multiset-identical to the
  * exceptAll pair it replaced (r19 optimization — the CDF diff phase now
  * runs ONE netted aggregation instead of two exceptAlls). The reference
  * formulation is executed literally here so a future change to either
  * side fails loudly. */
class NetDiffSpec extends SparkSuite {
  import spark.implicits._

  private def referencePair(after: DataFrame, before: DataFrame): DataFrame =
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))

  private def assertSameMultiset(after: DataFrame, before: DataFrame): Unit = {
    val got = NetDiff.tagged(after, before)
    val want = referencePair(after, before)
    assert(got.columns.toSeq === want.columns.toSeq, "column order must match")
    assert(got.schema === want.schema, "schema must match")
    // multiset compare: group by every column and count
    val g = got.groupBy(got.columns.map(col): _*).count()
    val w = want.groupBy(want.columns.map(col): _*).count()
    assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty,
      s"diff mismatch:\n got=${got.collect().toSeq}\nwant=${want.collect().toSeq}")
  }

  test("plain inserts + deletes + updates match the exceptAll pair") {
    val before = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "k", "v")
    val after = Seq((2L, "b", 2.0), (3L, "c", 30.0), (4L, "d", 4.0))
      .toDF("id", "k", "v")
    assertSameMultiset(after, before)
  }

  test("null keys and null values diff null-safely, like exceptAll") {
    val before = Seq[(java.lang.Long, String)]((1L, null), (null, "x"), (null, null))
      .toDF("id", "k")
    val after = Seq[(java.lang.Long, String)]((null, "x"), (null, "y"), (2L, null))
      .toDF("id", "k")
    assertSameMultiset(after, before)
  }

  test("full-row duplicates net by multiplicity (3 vs 1 -> 2 inserts)") {
    val before = Seq((1L, "a"), (2L, "b"), (2L, "b"), (9L, "z")).toDF("id", "k")
    val after = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "k")
    // nets: (1,a): 3-1=+2 inserts; (2,b): 1-2=-1 delete; (9,z): -1 delete
    assertSameMultiset(after, before)
    val got = NetDiff.tagged(after.toDF(), before.toDF()).collect()
    assert(got.count(r => r.getString(2) == "insert") === 2)
    assert(got.count(r => r.getString(2) == "delete") === 2)
  }

  test("identical sides diff to empty") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    assert(NetDiff.tagged(df, df).isEmpty)
  }

  test("double edge values (NaN, -0.0) group the way exceptAll groups them") {
    val before = Seq(Double.NaN, -0.0, 1.5).toDF("v")
    val after = Seq(Double.NaN, 0.0, 2.5).toDF("v")
    assertSameMultiset(after, before)
  }
}
