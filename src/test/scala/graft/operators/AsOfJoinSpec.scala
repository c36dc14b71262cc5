package graft.operators

import java.sql.Timestamp
import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest order at-or-before each event, max key on date ties") {
    val events = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L, "view", 1.0, "{}"),  // after all → order 13
      (2L, ts("2024-01-05 00:00:00"), 100L, "view", 1.0, "{}"),  // equal ts visible; tie → max key 12
      (3L, ts("2024-01-01 00:00:00"), 100L, "view", 1.0, "{}"),  // before all → unmatched
      (4L, ts("2024-01-10 00:00:00"), 200L, "click", 1.0, "{}")  // user with no orders
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val orders = Seq(
      (11L, 100L, "O", 10.0, ts("2024-01-05 00:00:00"), "1-URGENT"),
      (12L, 100L, "O", 20.0, ts("2024-01-05 00:00:00"), "1-URGENT"),
      (13L, 100L, "O", 30.0, ts("2024-01-08 00:00:00"), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

    val out = AsOfJoin.asofEnrich(events, orders).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("asof_orderkey")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble))))
      .toMap
    assert(out(1L) === ((Some(13L), Some(30.0))))
    assert(out(2L) === ((Some(12L), Some(20.0))), "same-timestamp order visible; tie → max key")
    assert(out(3L) === ((None, None)))
    assert(out(4L) === ((None, None)))

    val roll = AsOfJoin.asofRollup(events, orders).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("matched_events")))).toMap
    assert(roll("view") === ((3L, 2L)))
    assert(roll("click") === ((1L, 0L)))
  }

  test("asof join is layout-independent (repartitioning changes nothing)") {
    val events = Tables.events
    val orders = Tables.orders
    def run(e: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asofRollup(e, o).collect().map(_.toSeq).toSeq
    assert(run(events, orders) === run(events.repartition(13), orders.repartition(5)))
  }

  private object Tables {
    val events = graft.Tables.events(spark, sfDir("0.001"))
    val orders = graft.Tables.orders(spark, sfDir("0.001"))
  }
}
