package graft

import org.apache.spark.sql.SparkSession

/** One-line entry point for library users: a SparkSession wired the way
  * every graft operator expects — custom SQL functions injected at build
  * time (GraftExtensions), UTC session time zone (the engine's
  * determinism rules assume it), nanosecond-parquet acceptance for event
  * tables, and the bounded-buffer aggregate tuning.
  *
  * The harness mains (Verify/Bench) build their sessions THROUGH this
  * factory, so it is the single source of truth for engine session
  * settings (TestSpark mirrors it minus the static extensions conf,
  * which cannot apply to the shared test-JVM session).
  */
object GraftSession {

  /** Pre-configured builder — callers may still override any setting or
    * add their own before `getOrCreate()`. */
  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "1000000")
    shufflePartitions.fold(b)(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
  }
}
