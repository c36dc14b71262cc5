package graft

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted inside query builders so harness entry
  * points (Verify, Bench, tests) can release them once the consuming
  * action has materialized its result. Without this, a session that runs
  * all ~75 registered queries accumulates every LSH-signature / sketch
  * cache in executor storage memory for its whole lifetime (ADVICE r2).
  *
  * The frames stay lazily cached until release — laziness of the query
  * plans is unchanged; only the cache *lifetime* is scoped.
  */
object CacheScope {
  private val live = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Register an already-`.persist()`ed frame for later release. */
  def manage(df: DataFrame): DataFrame = synchronized { live += df; df }

  /** Unpersist everything registered since the last release. Safe to call
    * after any action on the consuming query (results are materialized;
    * re-running the plan would simply recompute). */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
