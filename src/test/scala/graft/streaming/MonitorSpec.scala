package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSuite

class MonitorSpec extends SparkSuite {
  import spark.implicits._

  test("listener tracks batches, input rows, and termination") {
    implicit val sqlCtx = spark.sqlContext
    val monitor = Monitor.attach(spark)
    try {
      val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = df.writeStream.format("memory").queryName("monitored")
        .outputMode("append").start()
      input.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0),
                    (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(10000)
      // listener events are async — wait for them to drain
      var tries = 0
      def h = monitor.health.find(_.name == "monitored")
      while (tries < 50 && !h.exists(x => x.terminated && x.totalInputRows >= 2)) {
        Thread.sleep(100); tries += 1
      }
      val qh = h.get
      assert(qh.totalInputRows === 2)
      assert(qh.batches >= 1)
      assert(qh.terminated)
      assert(qh.error.isEmpty)
      assert(monitor.failed.isEmpty)
    } finally spark.streams.listListeners().foreach(spark.streams.removeListener)
  }
}
