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
      // NEGATIVE RESULT (round-15, recorded per guide §1): flipping AQE to
      // parallelismFirst=false (coalesce toward an advisory partition
      // size instead of the 1 MB minPartitionSize chunks) was measured as
      // a heavy LOSS at fixture scale on 32 cores — back-to-back 20-query
      // slice 31.8 → 48.8 s wall at advisory 16m (35.9 s at 4m): the
      // advisory-size targets collapse the 5–20 MB CPU-heavy reduces
      // (degree_dist's pair distinct, frequent_pairs' pair aggregate) to
      // 1–2 tasks that serialize seconds of aggregation work while the
      // other cores idle (task CPU DOWN 155 → 128 s, task wall UP 273 →
      // 391 s — the waiting-not-working signature). Stock AQE coalescing
      // already data-derives tiny-exchange widths (sub-1MB exchanges
      // collapse to one task at any core count), so the defaults stand.
    shufflePartitions.fold(b)(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
  }
}
