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

  /** Symmetric-gate curve (`ball <N> [bits...]`): recall AND candidate
    * volume of the Hamming ≤ 3 ball rule vs signature width at N+
    * vectors — the evidence behind Similarity.GateMaxBits. Corpus =
    * hash-uniform synth plus 2000 PLANTED near-dup pairs (id i
    * duplicated as id N+i with a deterministic ±0.48-uniform
    * perturbation — measured pair cosine ≈ 0.9, the embed_neardup
    * threshold). Per width:
    *   - recall = fraction of planted pairs with sig Hamming ≤ 3 (the
    *     gate can only verify pairs its blocking join forms);
    *   - ball candidate volume = Σ_masks Σ_v h(v)·h(v⊕m) over the
    *     signature histogram — EXACT, no 10¹⁰-row join materialized;
    *   - the 4-band split's volume (Σ_band Σ_val h_b(val)² — the
    *     MinHash-style alternative that catches every Hamming ≤ 3 pair
    *     with one clean band) — measured to close the "band instead of
    *     ball?" question at operating density.
    * Probe rows = (N+2000)·ballCount(bits) is arithmetic, printed for
    * context. */
  private def ballMode(spark: org.apache.spark.sql.SparkSession,
                       n: Long, bitsList: Seq[Int]): Unit = {
    val nPlant = 2000L
    def synthEmb(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(xxhash64(id, d), lit(200000L)).cast("double")
          / 100000.0 - 1.0).cast("float"))
    val base = spark.range(n).select(col("id").as("vec_id"),
      synthEmb(col("id")).as("embedding"))
    // perturbed copies of ids [0, nPlant): noise uniform in [-0.48,
    // 0.48) per dim → E[cos] ≈ 0.9 against var-1/3 components
    val dups = spark.range(nPlant).select((col("id") + n).as("vec_id"),
      zip_with(synthEmb(col("id")),
        transform(sequence(lit(1), lit(64)), d =>
          (pmod(xxhash64(col("id") + 7777777L, d), lit(96000L))
            .cast("double") / 100000.0 - 0.48).cast("float")),
        (x, nz) => (x + nz).cast("float")).as("embedding"))
    val e = base.unionAll(dups).persist()
    val total = e.count()
    val meanCos = e.filter(col("vec_id") >= n)
      .select((col("vec_id") - n).as("vec_id"),
              col("embedding").as("emb_b"))
      .join(base, Seq("vec_id"))
      .select(avg(Similarity.cosine(col("embedding"), col("emb_b"))))
      .first.getDouble(0)
    println(f"corpus $total vectors ($nPlant planted pairs, mean " +
      f"cosine $meanCos%.3f), radius ${Similarity.ProbeRadius}")
    println("bits  ball_probes/row  recall  ball_cands  band4_cands")
    for (bits <- bitsList) {
      val sigged = e.select(col("vec_id"),
        Similarity.signBits(col("embedding"), bits).as("sig")).persist()
      sigged.count()
      val okPairs = sigged.filter(col("vec_id") >= n)
        .select((col("vec_id") - n).as("vec_id"), col("sig").as("sig_b"))
        .join(sigged, Seq("vec_id"))
        .filter(expr(
          s"bit_count(sig ^ sig_b) <= ${Similarity.ProbeRadius}"))
        .count()
      val recall = okPairs.toDouble / nPlant
      // exact candidate volumes from the signature histogram
      val h = sigged.groupBy(col("sig")).agg(count(lit(1)).as("c"))
        .persist()
      h.count()
      val masks = typedLit(
        Similarity.ballMasks(bits, Similarity.ProbeRadius))
      val ballCands = h.select(col("c"),
          explode(masks).as("m"), col("sig"))
        .select((col("sig").bitwiseXOR(col("m"))).as("sig2"), col("c"))
        .join(h.select(col("sig").as("sig2"), col("c").as("c2")),
          Seq("sig2"))
        .select(sum(col("c") * col("c2"))).first.getLong(0) - total
      val w = (bits + 3) / 4
      val bandCands = (0 until 4).map { b =>
        val mask = ((1L << math.min(w, math.max(1, bits - b * w))) - 1
          ) << (b * w)
        sigged.groupBy((col("sig").bitwiseAND(lit(mask))).as("v"))
          .agg(count(lit(1)).as("c"))
          .select(sum(col("c") * col("c"))).first.getLong(0) - total
      }.sum
      println(f"$bits%4d ${Similarity.ballCount(bits)}%15d $recall%7.3f " +
        f"$ballCands%11d $bandCands%12d")
      h.unpersist(); sigged.unpersist()
    }
    spark.stop()
  }

  /** Method-comparison mode (`methods <dir>`): mean recall@5 of each
    * shipped ANN family (sign-LSH directed probes / IVF / IVF-PQ) via
    * `Similarity.annRecall` — the SAME dataflow the oracle gate checks at
    * sf0.01 — plus the dials in effect at this corpus size, so the
    * "recall was measured at fixture scale" gap closes: run it on the
    * density-probe dir and the dials are re-justified (or re-dialed)
    * from numbers at 200k vectors instead of 2k. */
  private def methodsMode(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit = {
    val n = graft.Tables.footerCount(spark, dir, "embeddings")
    val bits = Similarity.adaptiveBits(n)
    println(s"corpus $n vectors; lsh dials: adaptiveBits=$bits " +
      s"pool=${Similarity.poolBits(bits)} " +
      s"budget=${Similarity.probeBudget(bits)}; ivf nprobe=2; " +
      s"pq k=${Similarity.pqKAdaptive(n)} " +
      s"nprobe=${Similarity.pqNprobeAdaptive(n)} depth=max(30,pool_q/3) " +
      s"per query (modeled-pool reference " +
      s"${Similarity.adcRescoreDepth(n)})")
    val t0 = System.nanoTime()
    val rows = Similarity.annRecall(spark, dir)
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_queries"),
           round(avg(col("recall")), 3).as("mean_recall"))
      .orderBy(col("method"))
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    rows.foreach { r =>
      println(f"method=${r.getString(0)}%-4s queries=${r.getLong(1)}%3d " +
        f"recall@5=${r.getDouble(2)}%5.3f")
    }
    println(f"wall ${wall}%.1f s (truth + all three methods)")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("methods")) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
      val spark = graft.GraftSession
        .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      methodsMode(spark, args.lift(1).getOrElse("/tmp/probedens"))
      spark.stop()
      return
    }
    if (args.headOption.contains("ball")) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
      val spark = graft.GraftSession
        .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
        .config("spark.ui.enabled", "false")
        // the sig histogram at wide widths is ~N rows — too big to
        // auto-broadcast into the volume join (maxResultSize trip)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
      val bl =
        if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
        else Seq(10, 14, 17, 20, 24, 28, 32)
      ballMode(spark, n, bl)
      return
    }
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
