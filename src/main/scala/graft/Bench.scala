package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graft.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries — a local
    // iteration aid; the driver never sets it. Tokens are trimmed and
    // unknown names rejected loudly: a typo that silently selected zero
    // queries would print a well-formed total of 0.0 that reads as an
    // impossibly fast successful run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    // Sorted execution order: Map iteration order shifts as the suite
    // grows, and suite-context pressure (GC, page cache) inflates whatever
    // runs late — measured: corpus_curate 2.5s isolated vs 8.2s landing
    // late in an unsorted 146-query run. A fixed order keeps per-query
    // numbers comparable round-over-round.
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (k, _) => s(k) })
      .toSeq.sortBy(_._1)
    // Untimed warmup: first executions pay JVM/codegen/scan-init costs that
    // say nothing about query cost — run everything once, then time.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Queries may persist() shared sub-results internally; clear between
    // runs so no query is timed against another run's (or the warmup's)
    // cache, and cache memory stays bounded.
    spark.catalog.clearCache()
    // Shuffle-write bytes per query, via a task-metrics listener read
    // between runs (listener bus drained around each read so async
    // delivery can't smear one query's bytes into the next). Wall time
    // moves with host contention; shuffle bytes move only with the PLAN —
    // so a timing regression whose bytes are unchanged is self-diagnosed
    // as measurement noise, not a plan change (the round-7 false alarm).
    val inFlight = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) inFlight.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // A failed query records -1 — a thrown regression must never read as
    // a (faster) success in the benchmark JSON. Each query is timed THREE
    // times and the minimum reported: single-shot wall times on a shared
    // host carry multi-second contention spikes (measured: an identical
    // 84-query total swinging 39 s ↔ 72 s run-to-run). The three repeats
    // run as three INTERLEAVED full-suite passes, not back-to-back: a
    // minutes-long contention window then inflates at most ONE repeat of
    // any query instead of all three of an alphabetical block (the
    // round-7 contamination shape — indices 34-42 all 2-8× slow, min-of-3
    // powerless because the window covered every repeat). The per-query
    // SPREAD (max−min across passes) is recorded alongside, so a noisy
    // reading is visibly noisy instead of masquerading as a regression.
    val passes = 3
    val times = collection.mutable.Map[String, Vector[Double]]()
    val shuffleBytes = collection.mutable.Map[String, Long]()
    for (pass <- 1 to passes; (name, fn) <- selected) {
      if (pass == 1) { ListenerBridge.drain(spark.sparkContext); inFlight.set(0) }
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      times(name) = times.getOrElse(name, Vector.empty) :+ dt
      if (pass == 1) {
        ListenerBridge.drain(spark.sparkContext)
        shuffleBytes(name) = inFlight.get()
      }
      spark.catalog.clearCache()
    }
    val timed = selected.map { case (name, _) =>
      val ts = times(name)
      val failed = ts.exists(_ < 0)
      (name,
       if (failed) -1.0 else ts.min,
       if (failed) -1.0 else ts.max - ts.min)
    }
    val results = timed.map { case (n, min, _) => n -> min }
    val spreads = timed.map { case (n, _, sp) => n -> sp }
    val total = results.map(_._2).filter(_ >= 0).sum
    def asJson(rs: Iterable[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def asJsonL(rs: Iterable[(String, Long)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // The driver parses only the LAST ~2000 chars of stdout; the full
    // per-query map is ~7 KB, so a single line carrying it starts mid-JSON
    // in the captured tail and has never parsed (BENCH_r01–r04 all
    // `parsed: null`). Emit a compact final line — total plus the slowest
    // 10 queries, comfortably under the tail window — and write the
    // complete per-query map to BENCH_DETAIL.json next to the build.
    val sortedBytes = selected.map { case (n, _) => n -> shuffleBytes.getOrElse(n, 0L) }
    val detail = java.nio.file.Paths.get("BENCH_DETAIL.json")
    java.nio.file.Files.write(detail,
      (s"""{"metric":"total","value":$total,"unit":"sec",""" +
       s""""queries":${asJson(results)},"spread":${asJson(spreads)},""" +
       s""""shuffle_bytes":${asJsonL(sortedBytes)},""" +
       s""""passes":$passes,"interleaved":true,""" +
       s""""sf":"$sfDir"}""" + "\n")
        .getBytes("UTF-8"))
    // Append this run to BENCH_HISTORY.json so the round-over-round series
    // can no longer drift by forgotten manual bookkeeping (r05/r06 and r07
    // each went stale that way). Only a FULL-suite run at the driver's
    // bench scale factor is history-worthy — a SPARK_GRAFT_ONLY slice or an
    // sf0.01 iteration run would poison the comparison series. The round
    // label comes from SPARK_GRAFT_ROUND if set, else max(BENCH_rNN.json)+1
    // (the driver writes BENCH_rNN.json AFTER the bench run, so during
    // round N the max on disk is N−1); re-runs within a round overwrite
    // the same key, keeping the append idempotent.
    if (only.isEmpty && sfDir.endsWith("sf0.1")) {
      try updateHistory(results, spreads, sortedBytes, total)
      catch { case e: Throwable =>
        System.err.println(s"BENCH_HISTORY update failed (non-fatal): $e") }
    }
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${asJson(slowest)},"n":${results.size},"sf":"$sfDir","detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }

  private def updateHistory(
      results: Seq[(String, Double)],
      spreads: Seq[(String, Double)],
      bytes: Seq[(String, Long)],
      total: Double): Unit = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new ObjectMapper()
    val file = new java.io.File("BENCH_HISTORY.json")
    val root: ObjectNode =
      if (file.exists()) mapper.readTree(file) match {
        case o: ObjectNode => o
        case _ => mapper.createObjectNode()
      } else mapper.createObjectNode()
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", {
      val rx = "BENCH_r([0-9]+)\\.json".r
      val ns = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .toSeq.flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      f"r${(if (ns.isEmpty) 0 else ns.max) + 1}%02d"
    })
    def sub(name: String): ObjectNode = root.get(name) match {
      case o: ObjectNode => o
      case _ => val o = mapper.createObjectNode(); root.set(name, o); o
    }
    val timesNode = mapper.createObjectNode()
    results.foreach { case (k, v) => timesNode.put(k, v) }
    val spreadNode = mapper.createObjectNode()
    spreads.foreach { case (k, v) => spreadNode.put(k, v) }
    val bytesNode = mapper.createObjectNode()
    bytes.foreach { case (k, v) => bytesNode.put(k, v) }
    root.set(round, timesNode)
    sub("spread").set(round, spreadNode)
    sub("shuffle_bytes").set(round, bytesNode)
    sub("totals").put(round, total)
    root.set("detail_latest", timesNode.deepCopy[ObjectNode]())
    mapper.writerWithDefaultPrettyPrinter().writeValue(file, root)
  }
}
