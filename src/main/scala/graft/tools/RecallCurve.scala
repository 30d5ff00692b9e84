package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Recall-vs-cost curve of the margin-directed multi-probe tier at WIDE
  * signatures — the evidence behind the poolBits cap (SCALE.md): for
  * each signature width and probe budget, measure recall@5 of the
  * directed tier against brute-force truth on a query sample of the
  * probe corpus, plus the average candidate count (the join fan-out the
  * budget buys). The probe corpus (50k vectors) pairs naturally with
  * adaptiveBits = 10; running the SAME corpus at 16 and 24 bits
  * measures the over-width regime — how recall responds to budget when
  * buckets go sparse — which brackets the wide-signature behavior the
  * fixture scales cannot reach directly.
  *
  * The fixture corpora can only measure the over-width REGIME (bits
  * far above adaptiveBits(N) — buckets go singleton, recall collapses
  * at any affordable budget: the evidence FOR the adaptive width). The
  * question the cap needs answered — does the budget still buy recall
  * at a wide width AT ITS OPERATING DENSITY (~64 vectors/bucket) — is
  * reachable locally with a synthetic corpus: `synth:<N>` generates N
  * deterministic hash-uniform 64-dim vectors (no RNG — reproducible),
  * e.g. synth:4194304 = the 16-bit operating point (64·2^16).
  *
  * Usage: SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
  *          tools/run.sh graft.tools.RecallCurve /tmp/probe100 [bits...]
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe100")
    val bitsList =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(10, 16, 24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src =
      if (dir.startsWith("synth:")) {
        val nSynth = dir.stripPrefix("synth:").toLong
        // hash-uniform components in [-1, 1): xxhash64 of (id, dim) —
        // deterministic, zero-centered, sign bits split ~50/50
        spark.range(nSynth).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)), d =>
            (pmod(xxhash64(col("id"), d), lit(200000L)).cast("double")
              / 100000.0 - 1.0).cast("float")).as("embedding"))
      } else {
        graft.Tables.spread(graft.Tables.t(spark, dir, "embeddings"))
      }
    val e = src.select(col("vec_id"), col("embedding")).persist()
    val n = e.count()
    // deterministic query sample: 200 spread ids
    val qStep = math.max(1L, n / 200L)
    val qIds = e.filter(col("vec_id") % qStep === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .limit(200).persist()
    val nq = qIds.count()

    // brute-force truth: top-5 rounded cosine, id tie-break
    val truth = broadcast(qIds).crossJoin(
        e.select(col("vec_id").as("neighbor_id"),
                 col("embedding").as("n_emb")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("q_emb"), col("n_emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregator.topK(5)(
        col("sim"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top")("_2")).as("neighbor_id"))
      .persist()
    truth.count()

    println(s"corpus $n vectors, $nq queries, truth = brute top-5")
    println("bits  pool  budget  recall@5  avg_cands  wall_s")
    for (bits <- bitsList) {
      val sigged = e.select(col("vec_id"), col("embedding"),
        Similarity.signBits(col("embedding"), bits).as("sig")).persist()
      sigged.count()
      val corpus = sigged.select(col("sig"),
        col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      val budgets =
        (Seq(64, 176, 512, 1024, 4096) :+ Similarity.probeBudget(bits))
          .distinct.sorted.filter(_ <= (1 << 16))
      for (budget <- budgets) {
        val pool = math.min(bits,
          math.max(Similarity.poolBits(bits),
            32 - Integer.numberOfLeadingZeros(budget - 1) + 1))
        val t0 = System.nanoTime()
        val q = sigged
          .join(qIds.select(col("query_id")),
            sigged("vec_id") === qIds("query_id"))
          .select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb"),
            explode(graft.functions.DirectedProbes.probes(
              col("sig"), col("embedding"), bits, pool, budget))
              .as("sig"))
        val cands = q.join(corpus, Seq("sig"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Similarity.cosine(col("q_emb"), col("n_emb")), 6)
              .as("sim"))
          .persist()
        val nCand = cands.count()
        val ann = cands
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAggregator.topK(5)(
            col("sim"), col("neighbor_id")).as("top"))
          .select(col("query_id"),
            explode(col("top")("_2")).as("neighbor_id"))
        val hits = ann.join(truth, Seq("query_id", "neighbor_id")).count()
        cands.unpersist()
        val wall = (System.nanoTime() - t0) / 1e9
        val recall = hits.toDouble / (nq * 5.0)
        println(f"$bits%4d $pool%5d $budget%7d $recall%9.3f " +
          f"${nCand.toDouble / nq}%9.1f $wall%6.1f")
      }
      sigged.unpersist()
    }
    spark.stop()
  }
}
