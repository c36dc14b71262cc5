package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session
  /** Fixture dir for a scale factor, e.g. `sfDir("0.001")`. */
  protected def sfDir(sf: String): String = s"${SparkSuite.testData}/sf$sf"
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSuite {
  /** Fixture root — env-overridable so the suite runs on any checkout
    * layout, not just this machine's /root/testdata. */
  val testData: String = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.configure(s)
    s
  }
}

class ConfSpec extends SparkSuite {
  test("profiles apply AQE + shuffle sizing and register engine functions") {
    val s2 = spark.newSession()
    Conf(s2, Conf.Prod)
    assert(s2.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(s2.conf.get("spark.sql.shuffle.partitions") === "400")
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    // engine functions registered by configure
    assert(s2.sql("SELECT cosine_sim(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .head().getDouble(0) === 1.0)
    Conf(s2, Conf.Dev)
    assert(s2.conf.get("spark.sql.shuffle.partitions") === "32")
  }
}
