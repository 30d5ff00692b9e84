package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.streaming.EventStream
import graft.ops.Relational

/** Watermark late-data semantics + exactly-once-style foreachBatch upsert
  * sink, driven file-by-file so micro-batch boundaries are controlled. */
class StreamingLateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ns(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000000L

  private def eventsDf(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"),
        (unix_micros(col("tss").cast("timestamp")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))

  /** Drop one parquet part-file per call into the stream's events dir
    * (readEvents watches <dir>/events.parquet/). */
  private def addFile(df: DataFrame, streamDir: String, n: Int): Unit = {
    val staging = Files.createTempDirectory("graft_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val target = Paths.get(streamDir, "events.parquet")
    Files.createDirectories(target)
    Files.move(Paths.get(part), target.resolve(s"batch$n.parquet"))
  }

  test("rows behind the watermark are dropped; finalized windows emit " +
       "exactly once") {
    val streamDir = Files.createTempDirectory("graft_late").toString
    addFile(eventsDf(
      (1L, "2024-01-01 09:30:00", 1L, "click", 1.0),
      (2L, "2024-01-01 14:00:00", 1L, "click", 1.0)), streamDir, 1)
    val q = EventStream.tumbling(spark, streamDir)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_test").start()
    try {
      q.processAllAvailable()
      // watermark after batch 1 = 14:00 - 2h = 12:00
      // batch 2: a LATE row at 09:45 (behind the 12:00 watermark) plus an
      // on-time row
      addFile(eventsDf(
        (3L, "2024-01-01 09:45:00", 1L, "click", 1.0),
        (4L, "2024-01-01 15:00:00", 1L, "click", 1.0)), streamDir, 2)
      q.processAllAvailable()
      // batch 3: advance the watermark far enough to finalize everything
      addFile(eventsDf(
        (5L, "2024-01-01 19:00:00", 1L, "click", 1.0)), streamDir, 3)
      q.processAllAvailable()
      def win(h: String) = spark.table("late_test")
        .filter(col("window_start") ===
          java.sql.Timestamp.valueOf(s"2024-01-01 $h:00:00"))
        .collect()
      // the late 09:45 row was dropped: the finalized 09:00 window emitted
      // exactly once, with count 1, not 2
      assert(win("09").map(_.getLong(2)).toSeq === Seq(1L))
      // the on-time rows' windows finalized normally
      assert(win("14").map(_.getLong(2)).toSeq === Seq(1L))
      assert(win("15").map(_.getLong(2)).toSeq === Seq(1L))
    } finally q.stop()
  }

  test("foreachBatch sink: streamed keyed upsert converges to the batch " +
       "last-writer-wins result") {
    val streamDir = Files.createTempDirectory("graft_fb").toString
    val sinkPath = Files.createTempDirectory("graft_sink").toString + "/state"
    addFile(eventsDf(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:05:00", 2L, "view", 2.0)), streamDir, 1)
    addFile(eventsDf(
      (3L, "2024-01-01 11:00:00", 1L, "click", 9.0),   // updates key (1,click)
      (4L, "2024-01-01 11:30:00", 3L, "click", 3.0)), streamDir, 2)
    val q = EventStream.readEvents(spark, streamDir, filesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = batch.select("user_id", "event_type", "event_id",
          "ts", "value")
        // read-merge-write cycles MUST read via readCommitted (crash-safe
        // restore before the merge decision) — see Pipeline.atomicWrite
        val merged = Pipeline.readCommitted(incoming.sparkSession, sinkPath)
          .map(existing => Relational.lastWriterWins(
            existing.unionByName(incoming),
            Seq("user_id", "event_type"),
            Seq(col("ts").desc, col("event_id").desc)))
          .getOrElse(incoming)
        Pipeline.atomicWrite(merged, sinkPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(sinkPath)
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got === Map((1L, "click") -> 9.0, (2L, "view") -> 2.0,
                       (3L, "click") -> 3.0))
  }
}
