package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins LABEL EQUALITY of the two connected-component paths of
  * `Dedup.labelComponents` — driver union-find vs GraphX Pregel — on a
  * REAL (typically probe-scale) dataset, not just the unit fixtures:
  * each labeler family runs once on the default path and once with
  * `-Dgraft.cc.maxDriverEdges=0` forcing the distributed Pregel branch,
  * and the two labelings must fingerprint identically (row count +
  * bit_xor of xxhash64 over the whole row — order-independent, exact).
  *
  * Covers dedup_clusters (MinHash pairs), semantic_dedup (sign-LSH
  * embedding pairs) and mm_clusters (perceptual-signature pairs);
  * corpus_curate consumes dedup_clusters' labels via the staged-labels
  * artifact, so its labeling is pinned transitively by the first case.
  *
  * Usage: SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
  *          tools/run.sh graft.tools.CcCompare /tmp/probe100
  */
object CcCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fp(df: DataFrame): (Long, Long) = {
      val r = df
        .agg(count(lit(1)),
             bit_xor(xxhash64(df.columns.map(col): _*)))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("dedup_clusters",
        () => graft.ops.Dedup.dedupClusters(spark, dir),
        () => graft.ops.Dedup.stagedPairs(spark, dir)),
      ("semantic_dedup",
        () => graft.ops.Dedup.semanticDedup(spark, dir),
        () => graft.ops.Dedup.stagedEmbedPairs(spark, dir, 0.35)),
      ("mm_clusters",
        () => graft.ops.Multimodal.payloadClusters(spark, dir),
        () => graft.ops.Multimodal.stagedPerceptualPairs(spark, dir)))

    // Both branches are FORCED, not left to the 1M default gate: on a
    // heavily-duplicated probe the candidate graph can exceed the cap
    // (26.9M pairs at 500k docs), in which case an unforced "default"
    // leg silently takes Pregel too and the comparison collapses into
    // run-to-run determinism. Forcing union-find is only safe where the
    // edge list fits the driver, so the edge count is CHECKED first
    // (cheap — the pair relation is the staged artifact the labeler
    // needs anyway) and an oversized case skips its union-find leg with
    // a loud SKIP instead of collecting a 26.9M-row edge list into the
    // driver (round-12 advice). `--force-unionfind` (arg 2) overrides
    // for an operator who has sized the driver heap deliberately.
    val forceUf = args.contains("--force-unionfind")
    val ufEdgeBound = 2000000L // ~32 MB of longs — a broadcast-size list
    var bad = 0
    for ((name, mk, pairs) <- cases) {
      val nEdges = pairs().count()
      val runUf = forceUf || nEdges <= ufEdgeBound
      val a = if (runUf) {
        sys.props("graft.cc.maxDriverEdges") = Long.MaxValue.toString
        val t0 = System.nanoTime()
        val r = fp(mk())
        val tA = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Some((r, tA))
      } else None
      sys.props("graft.cc.maxDriverEdges") = "0" // force GraphX Pregel
      val t1 = System.nanoTime()
      val b = fp(mk())
      val tB = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      sys.props -= "graft.cc.maxDriverEdges"
      a match {
        case Some((r, tA)) =>
          val verdict = if (r == b) "EQUAL" else { bad += 1; "MISMATCH" }
          println(f"CC $name%-16s edges=$nEdges " +
            f"unionfind=(n=${r._1},x=${r._2}) $tA%7.1fs  " +
            f"pregel=(n=${b._1},x=${b._2}) $tB%7.1fs  $verdict")
        case None =>
          println(f"CC $name%-16s edges=$nEdges exceeds driver bound " +
            f"$ufEdgeBound — union-find leg SKIPPED " +
            f"(--force-unionfind to override); " +
            f"pregel=(n=${b._1},x=${b._2}) $tB%7.1fs")
      }
    }
    require(bad == 0, s"$bad labeler case(s) diverged between paths")
    println(s"CC-COMPARE OK dir=$dir")
    spark.stop()
  }
}
