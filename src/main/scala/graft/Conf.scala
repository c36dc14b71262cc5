package graft

import org.apache.spark.sql.SparkSession

/** Engine configuration profiles (reference: config/config.py:360-379,
  * development.yaml / production.yaml spark blocks). The reference tunes
  * Spark through YAML; ours is code so profiles are type-checked and the
  * settings ship with the engine.
  */
object Conf {

  sealed trait Profile { def shufflePartitions: Int; def maxFilesPerTrigger: Int }
  /** Laptop/CI — small shuffles, tight triggers (development.yaml). */
  case object Dev extends Profile { val shufflePartitions = 32; val maxFilesPerTrigger = 20 }
  /** Cluster — wide shuffles sized for executor memory at the target SF
    * (production.yaml: 400 partitions for 10×4 cores). */
  case object Prod extends Profile { val shufflePartitions = 400; val maxFilesPerTrigger = 100 }

  /** Apply a profile + the engine's invariant settings: AQE with
    * coalescing and skew-join splitting (the reference's
    * sql_adaptive_* flags, config.py:365-367), UTC, and the
    * nanos-timestamp read compatibility. */
  /** Session key Streams.fileStreamSource reads its default trigger
    * rate from. */
  val MaxFilesPerTriggerKey = "spark.graft.maxFilesPerTrigger"

  def apply(spark: SparkSession, profile: Profile): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", profile.shufflePartitions.toString)
    spark.conf.set(MaxFilesPerTriggerKey, profile.maxFilesPerTrigger.toString)
    Tables.configure(spark)
  }
}
