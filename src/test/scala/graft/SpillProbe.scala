package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Executor-physics receipt for scale-smoke ratio outliers (r15 verdict
  * #6: q86/q87 read 4.9–5.1× at 10× — "documented as bytes-linear merge
  * sorts past the spill point, plausible but unverified"). This probe
  * runs named registry queries at 1× and the amplified 10× with a
  * listener summing the engine's OWN task metrics — memory/disk spill
  * bytes and shuffle I/O — so the super-linear ratio is either pinned
  * to measured spill (the sorts crossed execution memory at 10×, each
  * spilled byte is written+re-read) or refuted.
  *
  * Run: sbt "Test/runMain graft.SpillProbe q86_asof_forward q87_asof_nearest"
  */
object SpillProbe {

  private final class Acc {
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val shuffleRead = new AtomicLong(0)
    val peakExecMem = new AtomicLong(0)
    def reset(): Unit = Seq(memSpill, diskSpill, shuffleWrite, shuffleRead,
      peakExecMem).foreach(_.set(0))
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    val acc = new Acc
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          acc.memSpill.addAndGet(m.memoryBytesSpilled)
          acc.diskSpill.addAndGet(m.diskBytesSpilled)
          acc.shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          acc.shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          acc.peakExecMem.updateAndGet(p =>
            math.max(p, m.peakExecutionMemory))
        }
      }
    })

    val x10 = ScaleSmoke.build10x(spark, base)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q86_asof_forward", "q87_asof_nearest")
    val registry = SparkEntry.queries

    println("query,scale,sec,mem_spill_mb,disk_spill_mb,shuffle_write_mb," +
      "shuffle_read_mb,peak_task_exec_mb")
    names.foreach { n =>
      Seq(("1x", base), ("10x", x10)).foreach { case (tag, dir) =>
        registry(n)(spark, dir).count() // warm-up (codegen, footers)
        CacheScope.releaseAll()
        Thread.sleep(1500) // listener events drain asynchronously — settle
        acc.reset()
        val t0 = System.nanoTime()
        registry(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        CacheScope.releaseAll()
        Thread.sleep(1500) // drain the async listener before reading
        def mb(x: AtomicLong): Double = x.get() / 1048576.0
        println(f"$n,$tag,$sec%.2f,${mb(acc.memSpill)}%.1f,${mb(acc.diskSpill)}%.1f," +
          f"${mb(acc.shuffleWrite)}%.1f,${mb(acc.shuffleRead)}%.1f," +
          f"${mb(acc.peakExecMem)}%.1f")
        Console.flush()
      }
    }
    spark.stop()
  }
}
