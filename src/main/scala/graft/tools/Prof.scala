package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only phase profiler: runs one named SparkEntry query repeatedly and
  * prints per-Spark-job wall times (with the first stage's name as a hint),
  * so "which of this operator's jobs is slow" is measured, not guessed.
  * Not part of the driver contract; harmless to ship.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("sim_ann_ivf")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession
      .builder("local[32]", shufflePartitions = Some(32))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          js.stageInfos.headOption.map(_.name).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nm) = jobs.getOrDefault(je.jobId, (0L, "?"))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"    job ${je.jobId}%3d  $dt%7.3fs  $nm")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {t0 <- i.submissionTime; t1 <- i.completionTime}
          yield (t1 - t0) / 1e3).getOrElse(-1.0)
        // taskMetrics is null for skipped/failed stages; an unguarded
        // dereference NPEs inside the listener bus, which silently
        // swallows the stage line
        val metrics = Option(i.taskMetrics).map(m =>
          f"in=${m.inputMetrics.bytesRead / 1048576}%5dMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1048576}%5dMB " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1048576}%5dMB  ")
          .getOrElse("in=    -   sw=    -   sr=    -     ")
        println(f"      stage ${i.stageId}%3d  $wall%7.3fs  " +
          metrics + i.name.take(70))
      }
    }
    val fn = graft.SparkEntry.queries(name)
    // COLD=1 skips the warmup so one-time work (artifact staging, model
    // training) is profiled too — that is what the Probe times include
    if (!sys.env.get("COLD").contains("1")) {
      fn(spark, sfDir).count() // warmup, unlistened
      spark.catalog.clearCache()
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      println(s"--- run $i of $name ---")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"  total ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
