package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, StreamingBatch}

/** The streaming twins re-run on the RocksDB state store provider — the
  * configuration a 100 TB deployment actually ships (per-key state far
  * beyond executor heap lives off-heap in RocksDB, checkpointed by
  * changelog). The in-memory (default) provider backs the other
  * streaming suites; this one proves the engine's stateful operators —
  * aggregation, flatMapGroupsWithState + event-time timers, and the
  * cascaded stream-stream join — are provider-agnostic: same results,
  * same state-boundedness metrics, under RocksDB.
  *
  * One representative per state family keeps the suite fast; parity
  * across every twin is pinned by StreamingSpec on the default store,
  * and the execution path difference between providers is the store,
  * not the operator. */
class RocksDbStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("complete-mode aggregation: RocksDB-backed running totals equal " +
       "the batch GROUP BY") {
    withRocksDb {
      val got = StreamingBatch.streamingTotals(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val want = Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got.nonEmpty && got === want)
    }
  }

  test("fMGWS + event-time timers: range-frame state stays " +
       "horizon-bounded on RocksDB (numRowsTotal from the store metrics)") {
    withRocksDb {
      val q = EventStream.rangeFrameStream(spark, dir)
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_state_horizon").start()
      try {
        q.processAllAvailable()
        val prog = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        assert(prog.nonEmpty, "no stateOperators progress recorded")
        assert(prog.get.stateOperators.forall(o =>
          o.customMetrics.keySet.stream.anyMatch(_.startsWith("rocksdb"))),
          "query did not run on the RocksDB provider")
        val keys = prog.get.stateOperators.map(_.numRowsTotal).sum
        val e = Tables.events(spark, dir)
        val mx = e.agg(max(col("ts"))).collect()(0).getTimestamp(0)
        val horizon =
          new java.sql.Timestamp(mx.getTime - 3L * 3600 * 1000 - 600000L)
        val live = e.filter(col("ts") >= lit(horizon))
          .select(col("user_id")).distinct().count()
        assert(keys > 0 && keys <= live,
          s"state keys $keys exceed the $live horizon-live users")
      } finally q.stop()
    }
  }

  test("resample cursor state == distinct users on RocksDB") {
    withRocksDb {
      val q = EventStream.resampleStream(spark, dir)
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_state_cursor").start()
      try {
        q.processAllAvailable()
        val prog = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        assert(prog.nonEmpty, "no stateOperators progress recorded")
        val keys = prog.get.stateOperators.map(_.numRowsTotal).sum
        val users = Tables.events(spark, dir)
          .select(col("user_id")).distinct().count()
        assert(keys === users,
          s"state rows $keys != $users distinct users")
      } finally q.stop()
    }
  }

  test("cascaded stream-stream funnel join (parquet sink) matches the " +
       "batch cascade on RocksDB") {
    withRocksDb {
      val got = StreamingBatch.streamingFunnel(spark, dir).count()
      val ev = Tables.events(spark, dir)
      def leg(t: String, n: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id").as(s"${t}_u"), col("ts").as(n))
      val want = leg("view", "view_ts")
        .join(leg("click", "click_ts"),
          col("view_u") === col("click_u") &&
            col("click_ts") >= col("view_ts") &&
            col("click_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
        .join(leg("purchase", "purchase_ts"),
          col("click_u") === col("purchase_u") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 12 HOURS"))
        .count()
      assert(got === want && want > 0)
    }
  }
}
