package graft.tools

/** Full-surface scale-probe runner: executes EVERY SparkEntry query
  * against a (typically key-offset-scaled) dataset dir, times each, and
  * REFUSES to report success unless the completed count equals
  * `SparkEntry.queries.size` — the recurring bookkeeping gap (SCALE.md's
  * probe headline lagging the shipped surface in rounds 6, 7 and 8) made
  * structurally impossible: a probe run on a stale build or a partial
  * surface fails loudly instead of publishing a smaller N.
  *
  * Usage: SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
  *          tools/run.sh graft.tools.Probe /tmp/probe100
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-table row counts, printed BEFORE the run and again in the
    // headline: the no-silent-caps doctrine applied to the probe itself
    // — a "100×" headline that holds some tables at 1× must say so in
    // numbers (the round-10 review's mislabeling finding). Footer-only
    // counts: no data scan.
    val tableCounts = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "documents", "events", "embeddings")
      .map { t =>
        val n =
          try graft.Tables.t(spark, dir, t).count()
          catch { case _: Exception => -1L }
        s"$t=$n"
      }.mkString(" ")
    println(s"PROBE TABLES $tableCounts")
    val t0 = System.nanoTime()
    var ok = 0
    val failed = collection.mutable.ArrayBuffer[String]()
    val times = collection.mutable.ArrayBuffer[(String, Double)]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val q0 = System.nanoTime()
      try {
        fn(spark, dir).count()
        ok += 1
        times += name -> (System.nanoTime() - q0) / 1e9
      } catch {
        case e: Throwable => failed += s"$name: ${e.getMessage}"
      }
      spark.catalog.clearCache()
    }
    val total = (System.nanoTime() - t0) / 1e9
    println("slowest 15:")
    times.sortBy(-_._2).take(15).foreach { case (n, t) =>
      println(f"  $t%8.1fs  $n")
    }
    failed.foreach(f => println(s"  FAILED $f"))
    val n = graft.SparkEntry.queries.size
    println(f"PROBE $ok/$n complete, ${failed.size} failed, " +
      f"$total%.0f s wall, dir=$dir")
    println(s"PROBE TABLES $tableCounts")
    require(ok == n && failed.isEmpty,
      s"probe completed $ok of SparkEntry.queries.size=$n " +
        s"(${failed.size} failed) — the headline may not understate the " +
        "surface")
    spark.stop()
  }
}
