package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family over `documents` / `embeddings` (SURVEY.md §2.11
  * X1/X2 + the training-data-pipeline surface): exact hash dedup, MinHash
  * signatures + LSH band pairing, n-gram Jaccard verification, SimHash,
  * and embedding-cosine near-dup.
  *
  * Scale notes: every variant is blocked — exact dedup shuffles once on
  * the content hash; MinHash/SimHash signatures are per-row map work;
  * candidate pairing always goes through a hash join on a band/bucket key
  * (never an all-pairs cross join), so work is Σ bucket² not n². The hash
  * primitive is md5-hex (codegen'd, and portable to the DuckDB oracle);
  * MinHash takes the lexicographic min of seeded md5 strings — same
  * uniformity argument as integer minhash, but engine-portable.
  */
object Dedup {

  /** Composable 3-shingle formulation over a MATERIALIZED token-array
    * column — kept as the executable spec of the native
    * graft.functions.Shingles expression (set equivalence asserted in
    * DedupSpec). array_distinct matches the native expression's
    * distinct-set output — without it, a repeated 3-gram would change
    * size(sh) and every Jaccard denominator downstream. `toks` must be a
    * bound attribute: higher-order lambdas get no subexpression
    * elimination, so an inline split() would re-run the regex per
    * emitted shingle. */
  def shinglesHof(text: Column, toks: Column): Column =
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => array_join(slice(toks, i, lit(3)), " ")))
        .otherwise(array(text)))

  /** Distinct word 3-shingles — native single-pass expression. */
  def shingles(text: Column): Column =
    graft.functions.Shingles.shingles(text, 3)

  private val seeds = Seq("s0", "s1", "s2", "s3")

  /** Per-doc MinHash signature: min seeded-md5 over the shingle set.
    * Computed array-locally (array_min over a transform) — a pure
    * projection with NO explode and NO shuffle, so signature extraction
    * scales embarrassingly at 100 TB; the old explode→groupBy form
    * shuffled |docs|×|shingles| rows for the same answer. */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    def mh(s: String): Column =
      array_min(transform(col("sh"),
        x => md5(concat(lit(s + "|"), x).cast("binary")))).as("mh_" + s)
    // NULL text must not produce a signature: a NULL shingle array makes
    // every band NULL, and Spark's groupBy would collect ALL null-text
    // docs into one shared band bucket — emitting spurious pairs that
    // the oracle's band equi-join (NULL never matches NULL) doesn't.
    Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .withColumn("sh", shingles(col("text")))
      .select(col("doc_id") +: seeds.map(mh): _*)
  }

  /** X1 exact dedup: first-writer-wins per content hash. Expressed as
    * min(struct(doc_id, …)) per hash — a map-side-combinable aggregation
    * that ships only each partition's local winner (~40 B/row), instead of
    * a window row_number that would shuffle and sort the full TEXT column
    * per hash group (measured 23 s → 3 s at 500k docs). struct ordering
    * compares doc_id first, so min ≡ ROW_NUMBER()=1 ordered by doc_id. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.t(spark, dir, "documents"))
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(struct(col("doc_id"), col("lang"), col("source"))).as("w"))
      .select(col("w")("doc_id").as("doc_id"), col("w")("lang").as("lang"),
              col("w")("source").as("source"))
      .orderBy(col("doc_id"))

  /** X2a MinHash signatures (4 seeds). */
  def minhashSig(spark: SparkSession, dir: String): DataFrame =
    stagedSignatures(spark, dir).orderBy(col("doc_id"))

  /** Materialize-once staging of the shared dedup lineage (signatures →
    * banded pairs → CC labels): each level is computed and committed to
    * parquet the FIRST time any operator needs it and read back by every
    * later consumer — minhash_sig/minhash_pairs/dedup_clusters,
    * survivorship, minhashEstError, editdistPairs and Corpus.curate all
    * draw from one staged copy instead of five recomputes of the same
    * integer-exact chain. This mirrors the 100 TB deployment shape
    * (labels are a written table downstream jobs read, not a CTE every
    * job re-derives); the pure compute forms stay directly callable and
    * PipelineSpec pins staged == recomputed. */
  private[graft] def stagedSignatures(spark: SparkSession,
      dir: String): DataFrame =
    graft.Pipeline.materializeOnce(spark,
      s"minhash_sigs@$dir@${Tables.fp(dir, "documents")}")(
      signatures(spark, dir))

  private[graft] def stagedPairs(spark: SparkSession,
      dir: String): DataFrame =
    graft.Pipeline.materializeOnce(spark,
      s"minhash_pairs@$dir@${Tables.fp(dir, "documents")}")(
      minhashPairs(spark, dir))

  /** Staged cluster labels — the query-map form of dedupClusters. */
  def stagedLabels(spark: SparkSession, dir: String): DataFrame =
    graft.Pipeline.materializeOnce(spark,
      s"dedup_labels@$dir@${Tables.fp(dir, "documents")}")(
      dedupClusters(spark, dir))

  /** X2b MinHash LSH candidate pairs: 2 bands × 2 rows — docs agreeing on
    * either band hash are candidates. Single pass: group doc ids per band
    * key (one shuffle of |docs|×2 band rows) and emit in-bucket pairs
    * array-locally — the signature subtree is computed ONCE, unlike a
    * self-join whose two branches each recompute it. Bucket sizes are tiny
    * by construction (a hot bucket would mean everything is a near-dup),
    * so the in-group pair expansion is bounded. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = stagedSignatures(spark, dir)
    val bands = sig.select(col("doc_id"),
      explode(array(
        md5(concat(col("mh_s0"), col("mh_s1")).cast("binary")),
        md5(concat(col("mh_s2"), col("mh_s3")).cast("binary")))).as("band"))
    // Bucket cap (≤ 256): a band bucket larger than that is a degenerate
    // mega-cluster (boilerplate, spam) whose quadratic pair fan-out would
    // dominate the job while carrying no per-pair signal — the standard
    // LSH guard; production pipelines divert such buckets to a dedicated
    // handler (and run exact dedup FIRST, which collapses identical
    // copies before they can form buckets). Mirrored in the oracle, so
    // semantics match by construction; at the tested SFs no bucket comes
    // near the cap. BoundedCollect enforces the cap in a SINGLE pass
    // with O(cap) buffer: the exact bucket size rides along, and for
    // surviving (≤ cap) buckets the membership is complete.
    buckets(bands)
      .select(explode(expr(
        """flatten(transform(ids, a ->
          |  transform(filter(ids, b -> b > a),
          |            b -> named_struct('doc_a', a, 'doc_b', b))))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Surviving band buckets (2..256 members) as id arrays — the shared
    * candidate-proposal stage of minhashPairs (all-pairs) and
    * editdistPairs (star pairs). */
  private def buckets(bands: DataFrame): DataFrame =
    bands.groupBy(col("band"))
      .agg(graft.functions.BoundedCollect.collect(256)(
        col("doc_id"), lit(0L)).as("r"))
      .filter(col("r._1") > 1 && col("r._1") <= 256)
      .select(expr("transform(r._2, x -> x._1)").as("ids"))

  private def bandBuckets(spark: SparkSession, dir: String): DataFrame = {
    val sig = stagedSignatures(spark, dir)
    buckets(sig.select(col("doc_id"),
      explode(array(
        md5(concat(col("mh_s0"), col("mh_s1")).cast("binary")),
        md5(concat(col("mh_s2"), col("mh_s3")).cast("binary")))).as("band")))
  }

  /** X2c n-gram Jaccard similarity join, blocked on `source` (the natural
    * blocking key here; LSH bands work identically): exact |∩|/|∪| over
    * distinct shingle sets for in-block pairs above a threshold.
    *
    * Plan: the classic set-similarity equi-join — explode shingle sets and
    * self-join on (block, shingle), so only pairs that actually SHARE a
    * shingle are ever materialized (|∩| = join-group count, |∪| = na+nb−|∩|).
    * Work is Σ per-shingle-count², not |block|² array intersections: at
    * sf0.1 this is ~14× faster than the naive blocked cross-join, and at
    * 100 TB it is the only shape that survives (pairs with jacc = 0 — the
    * overwhelming majority — never exist). Threshold > 0 makes the
    * zero-overlap exclusion semantics-preserving vs the oracle. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Shingles() emits the distinct set directly — no array_distinct pass.
    val d = Tables.spread(Tables.t(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), shingles(col("text")).as("sh"))
    val ex = d.select(col("doc_id"), col("source"),
                      size(col("sh")).as("n"), explode(col("sh")).as("s"))
    // Group-then-emit instead of a self-join: one shuffle on
    // (source, shingle), in-group ordered pairs generated array-locally,
    // then a count per pair. The shingle subtree runs once.
    // Stop-shingle cap (maxDf = 64): a shingle shared by more docs than
    // that contributes quadratic pair fan-out while carrying almost no
    // similarity signal — the standard prefix/stop-token guard of
    // production set-similarity joins. The oracle applies the identical
    // cap, so semantics match by construction (at the tested SFs no group
    // exceeds 3, so results are unchanged; at pathological duplication
    // scales this bounds the join). BoundedCollect enforces it in one
    // pass with O(cap) buffer — see minhashPairs.
    ex.groupBy(col("source"), col("s"))
      .agg(graft.functions.BoundedCollect.collect(64)(
        col("doc_id"), col("n").cast("long")).as("r"))
      .filter(col("r._1") > 1 && col("r._1") <= 64)
      .select(col("source"), explode(expr(
        """flatten(transform(r._2, a ->
          |  transform(filter(r._2, b -> b._1 > a._1),
          |    b -> named_struct('doc_a', a._1, 'n_a', a._2,
          |                      'doc_b', b._1, 'n_b', b._2))))"""
          .stripMargin)).as("p"))
      .groupBy(col("source"), col("p.doc_a").as("doc_a"),
               col("p.doc_b").as("doc_b"),
               col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jacc", round(
        col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")) + 1e-9, 4))
      .filter(col("jacc") >= 0.05)
      .select(col("source"), col("doc_a"), col("doc_b"), col("jacc"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** X2d 16-bit SimHash: per token, each hex digit of md5 contributes ±1
    * to its bit position; positive sums set the bit. Pure column
    * expressions (two array passes per row), engine-portable. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitSum = (1 to 16).map { i =>
      s"""(CASE WHEN aggregate(hs, 0, (acc, h) ->
         | acc + (((instr('0123456789abcdef', substr(h, $i, 1)) - 1) % 2) * 2 - 1)
         |) > 0 THEN ${1L << (i - 1)}L ELSE 0L END)""".stripMargin
    }.mkString(" + ")
    Tables.spread(Tables.t(spark, dir, "documents"))
      .withColumn("hs",
        transform(split(col("text"), "\\s+"), t => md5(t.cast("binary"))))
      .select(col("doc_id"), expr(bitSum).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** X2e embedding-cosine near-dup: sign-bit LSH blocking (8 bits) then
    * exact cosine ≥ 0.9 on in-bucket pairs. */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    stagedEmbedPairs(spark, dir, 0.9).orderBy(col("id_a"), col("id_b"))

  /** Materialize-once staging of the sign-LSH cosine pair relation, per
    * (dir, threshold, content fingerprint) — the round-12 probe's
    * residual: pair GENERATION (explode + bucket join + exact cosine,
    * 160 s at 200k vectors) re-ran inside every consuming query while
    * labeling takes seconds once pairs exist. Same artifact doctrine as
    * minhash stagedPairs: at 100 TB the pair relation is a written
    * table the dedup jobs share, not a CTE each one re-derives. */
  private[graft] def stagedEmbedPairs(spark: SparkSession, dir: String,
      threshold: Double): DataFrame =
    graft.Pipeline.materializeOnce(spark,
      s"embed_pairs@$dir@$threshold@${Tables.fp(dir, "embeddings")}")(
      embedPairs(spark, dir, threshold))

  /** Sign-LSH blocked cosine pairs at a threshold — shared by
    * embedNearDup (0.9, near-identical) and semanticDedup (0.35,
    * same-topic clustering). MULTI-PROBE (Similarity.ProbeRadius): a
    * cos ≥ 0.9 pair still disagrees on each sign bit with p ≈ 0.14, so
    * the exact-bucket form found only ~29 % of true near-dups — the
    * ann_recall lesson applied to the dedup gate. Side `a` explodes its
    * Hamming ≤ 3 probe signatures; pairs meet through the bucket
    * equi-join exactly once each (the probe set is duplicate-free and
    * `b` keys on its own bucket; id_a < id_b keeps one orientation), so
    * no distinct pass is needed. At the 0.35 semantic threshold sign-LSH
    * is inherently recall-limited (mean signature distance ≈ 3 of 8
    * bits); the radius is the recall/cost dial and the oracle states the
    * exact Hamming ≤ radius semantics. */
  private def embedPairs(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    // Bucket width scales with N (8 bits at fixture sizes, more as the
    // corpus grows) so expected in-bucket pairing stays Θ(N·64·probes),
    // not N²/256 — see Similarity.adaptiveBits. count() is footer-only.
    val bits = Similarity.gateBits(
      Tables.footerCount(spark, dir, "embeddings"))
    val e = Tables.spread(Tables.t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
              Similarity.signBits(col("embedding"), bits).as("bucket"))
    val a = e.select(col("vec_id").as("id_a"),
        col("embedding").as("emb_a"),
        explode(Similarity.probeBuckets(col("bucket"), bits,
          Similarity.ProbeRadius)).as("bucket"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"),
                     col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** X2f near-dup cluster assignment: connected components over the
    * MinHash candidate pairs, every document labeled with the minimum
    * doc_id reachable in its component (singletons label themselves);
    * `is_canonical` marks the one survivor per cluster — the row a
    * dedup-and-keep-one pipeline would retain.
    *
    * Primary implementation: GraphX Pregel ConnectedComponents (min-id
    * label propagation on the RDD path — Spark's built-in tool for
    * exactly this job, and measured 2× faster than the DataFrame loop
    * below because each Pregel round skips SQL planning/AQE overhead).
    * `dedupClustersDF` is the same algorithm as a pure DataFrame loop,
    * kept as an executable spec — ExtendedOpsSpec asserts both produce
    * identical labelings. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    labelComponents(spark,
      stagedPairs(spark, dir).select(col("doc_a"), col("doc_b")),
      Tables.t(spark, dir, "documents").select(col("doc_id")), "doc_id")

  /** Edge-count gate for the driver union-find fast path of
    * labelComponents: 1M edges ≈ 16 MB of longs — comfortably a driver
    * collect (the same order as a broadcast-join build side), while two
    * orders below the 26M-pair candidate graphs the 100× probe produced,
    * which stay on the distributed path. The system property exists so
    * a probe run can FORCE the GraphX Pregel branch on real data
    * (-Dgraft.cc.maxDriverEdges=0) — the branch a 100 TB crawl would
    * take must carry scale evidence, not just unit-test evidence. */
  private[graft] def DriverCcMaxEdges: Long =
    sys.props.get("graft.cc.maxDriverEdges").map(_.toLong)
      .getOrElse(1000000L)

  /** Shared connected-components labeler: given an undirected candidate
    * pair relation (two long id columns) and the universe of ids, return
    * (id, cluster_id = min reachable id, is_canonical) — the core of
    * both MinHash (dedupClusters) and embedding (semanticDedup) cluster
    * assignment.
    *
    * ADAPTIVE, gated on the measured candidate edge count (the count the
    * partition sizing needs anyway — same runtime-statistics stance as
    * AQE's join re-planning):
    *
    *  - Small graphs (≤ maxDriverEdges): union-find on the driver. After
    *    LSH banding the candidate graph is usually orders of magnitude
    *    smaller than the corpus — at every fixture scale it is a few
    *    dozen edges, where each Pregel superstep costs more in task
    *    scheduling than the whole labeling. Collecting a bounded,
    *    cap-checked edge list is the broadcast-build-side pattern, not a
    *    driver-side data loop; labels ship back as a broadcast join.
    *
    *  - Large graphs: GraphX Pregel min-id propagation on the RDD path,
    *    partitioning sized to the CANDIDATE EDGE COUNT, exactly like
    *    dedupClustersDF: every superstep schedules one task per
    *    partition. The persist means the (expensive) pairing lineage
    *    runs once, shared by the sizing count and the graph build.
    *
    * Both paths produce identical labelings (min reachable id;
    * DedupSpec pins the equality by forcing each path on the same
    * pairs). On the distributed path the label table is |V(candidate
    * pairs)| — in the regime dedup exists for (heavily duplicated
    * corpora) it can be a large share of the corpus, so it must NEVER
    * route through the driver. It materializes distributed, into the SQL
    * cache (which spills to disk and which spark.catalog.clearCache()
    * reaches); the eager count keeps the label lineage from re-running
    * the whole Pregel chain after the graph caches release. No broadcast
    * hint on the final join: the planner broadcasts when the cached
    * table is small and falls back to a shuffle join when it is not. */
  /** Release-on-next-call registry for the persisted label tables: the
    * distributed labelers (labelComponents' Pregel branch,
    * dedupClustersDF) persist their label frame with an eager count to
    * freeze the iterative lineage, and the entry has to outlive the call
    * because the RETURNED plan joins against it lazily — so each new
    * labeler invocation releases the PREVIOUS invocation's entry
    * instead, bounding the JVM to one live label cache (round-12 advice:
    * entries used to accumulate until an external clearCache). Safe
    * because every consumer materializes a labeling promptly (the query
    * surface routes through stagedLabels' parquet commit; specs and
    * tools collect/count the result) before any later labeler call; if
    * one ever didn't, the unpersist would only force a recompute — a
    * perf cost, never a wrong answer. */
  private val liveLabelCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private def retainLabelCache(df: DataFrame): DataFrame = {
    val prev = liveLabelCache.getAndSet(df)
    if ((prev != null) && (prev ne df))
      try prev.unpersist(blocking = false)
      catch { case _: Exception => () } // released session: nothing to free
    df
  }

  private[graft] def labelComponents(spark: SparkSession, pairDf: DataFrame,
      universe: DataFrame, idName: String,
      maxDriverEdges: Long = DriverCcMaxEdges): DataFrame = {
    import org.apache.spark.graphx.Graph
    val pairs = pairDf.persist()
    val nEdges = pairs.count()
    if (nEdges <= maxDriverEdges) {
      val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist(blocking = false)
      // Union-find with path compression; roots resolve to the component's
      // minimum id afterwards, so labels are exactly Pregel's fixpoint.
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
      parent.keys.foreach { v =>
        val r = find(v)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, v), v)
      }
      val labelRows = parent.keys.toSeq.sorted
        .map(v => org.apache.spark.sql.Row(v, minOfRoot(find(v))))
      val labelDf = spark.createDataFrame(
        spark.sparkContext.parallelize(labelRows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idName,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.LongType))))
      return universe
        .join(broadcast(labelDf), Seq(idName), "left")
        .select(col(idName),
          coalesce(col("cluster_id"), col(idName)).as("cluster_id"))
        .withColumn("is_canonical", col("cluster_id") === col(idName))
        .orderBy(col(idName))
    }
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 100000L).toInt))
    val edgeRdd = pairs.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .coalesce(parts)
    val g = Graph.fromEdgeTuples(edgeRdd, 1)
    val ccGraph = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
    val labels = spark.createDataFrame(
      ccGraph.vertices.map { case (v, c) => org.apache.spark.sql.Row(v, c) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idName,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType)))).persist()
    retainLabelCache(labels)
    labels.count()
    ccGraph.unpersist(blocking = false)
    g.unpersist(blocking = false)
    pairs.unpersist(blocking = false)
    universe
      .join(labels, Seq(idName), "left")
      .select(col(idName),
        coalesce(col("cluster_id"), col(idName)).as("cluster_id"))
      .withColumn("is_canonical", col("cluster_id") === col(idName))
      .orderBy(col(idName))
  }

  /** Semantic (embedding-space) dedup: connected components over the
    * sign-LSH cosine candidate pairs at a clustering threshold (0.35 —
    * "same topic" on the fixture's random-ish vectors; production tunes
    * per embedding model), canonical = min vec_id per component. The
    * embedding-side twin of dedupClusters: same labeler, same scale
    * shape — pair generation is the bucket join, the graph is the pair
    * OUTPUT. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    labelComponents(spark,
      stagedEmbedPairs(spark, dir, 0.35).select(col("id_a"), col("id_b")),
      Tables.t(spark, dir, "embeddings").select(col("vec_id")), "vec_id")

  /** DataFrame-loop formulation of dedupClusters: iterative min-label
    * propagation — each round every node takes min(own label, neighbors'
    * labels) via one join + one map-side-combinable min aggregation,
    * converging in O(component diameter) rounds (near-dup clusters are
    * shallow by nature). The loop is DRIVER CONTROL ONLY — per round the
    * data moves through two shuffles and a scalar convergence count; no
    * row ever reaches the driver. At adversarial diameters the
    * production upgrade is alternating large-star/small-star contraction
    * (O(log n) rounds); the per-round dataflow is unchanged. */
  def dedupClustersDF(spark: SparkSession, dir: String): DataFrame = {
    val pairs = stagedPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val edgesWide = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // Size the iteration's parallelism to the CANDIDATE GRAPH, not the
    // corpus: near-dup edges are a vanishing fraction of the input, and
    // running each tiny propagation round at corpus parallelism makes
    // task scheduling the dominant cost (measured ~10× the actual work
    // locally). One partition per ~100k edges, capped at the session's
    // parallelism for genuinely dense graphs.
    val nEdges = edgesWide.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 100000L).toInt))
    val edges = edgesWide.coalesce(parts)
    // Iterate over edge endpoints only; singletons rejoin (as their own
    // cluster) at the end via a left join.
    var cached = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .coalesce(parts).persist()
    var labels = cached
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("src"),
                            col("cluster_id").as("nl")), "src")
        .groupBy(col("dst").as("doc_id")).agg(min(col("nl")).as("nbr_min"))
      // The convergence flag rides along in the same pass — one join, one
      // materialization per round, no separate old-vs-new comparison
      // join. `cached` is the handle unpersist targets.
      val step = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"),
                coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("nbr_min"), col("cluster_id")) <
             col("cluster_id")).as("chg"))
        .persist()
      val changed = step.filter(col("chg")).count()
      cached.unpersist()
      cached = step
      labels = step.drop("chg")
      converged = changed == 0
      iter += 1
    }
    // Wrong labels are worse than a loud failure: a component whose
    // diameter exceeds the round budget would silently mark several
    // "canonical" survivors inside one cluster.
    if (!converged) throw new IllegalStateException(
      s"dedupClustersDF: label propagation did not converge in $iter rounds" +
        " — component diameter exceeds the budget; raise the cap or use" +
        " the GraphX path (dedupClusters)")
    // Materialize the label table DISTRIBUTED (persist + eager count —
    // the same rule as labelComponents' Pregel path): labels are
    // Θ(docs in candidate components), which in the regime dedup exists
    // for can be a large share of the corpus, so they must never route
    // through the driver (the round-11 review flagged the collect here
    // as this file's one violation of its own doctrine). The eager
    // count freezes the iterative lineage before the per-round cache
    // handles release; no broadcast hint on the final join — the
    // planner broadcasts when the cached label table is small and falls
    // back to a shuffle join when it is not.
    val labelDf = retainLabelCache(labels.persist())
    labelDf.count()
    edgesWide.unpersist()
    cached.unpersist(blocking = false)
    Tables.t(spark, dir, "documents").select(col("doc_id"))
      .join(labelDf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-frequency boilerplate line removal (the RefinedWeb-style
    * line-dedup pass: drop lines that recur across many documents — nav
    * bars, cookie banners, license footers — and reassemble each doc from
    * its surviving lines in order). The fixture text has no newlines, so
    * "lines" are fixed 2-token chunks; the operator shape is the real one:
    * explode to (doc, pos, line) → corpus-wide distinct-doc count per
    * line → anti-join the boilerplate set back → ordered reassembly.
    *
    * Scale: the explode is Θ(tokens) map-side; the line-frequency agg is
    * map-side-combinable on the line key. The boilerplate set (lines in
    * > 25% of docs) is PROVABLY small at any corpus size — at threshold
    * fraction f, at most (avg lines/doc)/f distinct lines can qualify —
    * so the anti-join side always broadcasts and the corpus never
    * reshuffles for the removal join. Reassembly shuffles (pos, line)
    * pairs once on doc_id; per-key state is one document's lines. */
  def lineDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull && length(col("text")) > 0)
    val chunked = docs
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ceil(size(col("toks")) / 2.0).cast("int") - 1),
          i => array_join(slice(col("toks"), i * 2 + 1, lit(2)), " ")))
          .as(Seq("pos", "line")))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val boiler = chunked.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .crossJoin(broadcast(total))
      .filter(col("n_docs") > col("n_total") * 0.25)
      .select(col("line"))
    val kept = chunked.join(broadcast(boiler), Seq("line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x("line")), " ").as("clean_text"))
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Intra-document dedup: remove REPEATED spans within each document
    * (the page-template / copy-paste repetition cleaner — complements
    * lineDedup's cross-corpus boilerplate removal). The document is cut
    * into fixed 8-token chunks; only the FIRST occurrence of each
    * distinct chunk survives; survivors reassemble in original order.
    *
    * Scale: this is the one dedup family that needs NO cross-document
    * state at all, and the implementation keeps it that way — chunking
    * and first-occurrence filtering are array-local higher-order
    * functions (a pure map-side projection; the prefix scan is O(m²)
    * chunk compares within one document, m bounded by document length).
    * An explode → (doc, chunk) window → re-aggregate form would shuffle
    * every chunk in the corpus TWICE to compute per-row-local state.
    * The only exchange in the plan is the presentation sort (asserted
    * in PlanSpec). */
  def intradocDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = 8
    Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("toks", Text.tokens(col("text")))
      // integer `div` ceil, not ceil(x/y) in double — exact at any size
      .withColumn("chunks", transform(
        sequence(lit(0),
          expr(s"(size(toks) + ${w - 1}) div $w").cast("int") - 1),
        i => array_join(slice(col("toks"), i * w + 1, lit(w)), " ")))
      .withColumn("kept", filter(col("chunks"),
        (c, i) => array_position(slice(col("chunks"), lit(1), i), c) === 0))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document chunk-granular dedup — the between-docs sibling of
    * [[intradocDedup]] and the substring-granular member of the dedup
    * family: cut every document into fixed 64-token chunks and keep only
    * the FIRST occurrence of each distinct chunk across the whole
    * corpus, first-writer-wins by (doc_id, pos). This is the shape
    * corpus builders use for boilerplate that is neither a whole line
    * (lineDedup) nor a whole document (exact/minhash): a 64-token
    * licence header or nav block pasted into thousands of pages is
    * removed everywhere but its earliest appearance, and the REST of
    * each document survives. The sub-64-token tail of a document is
    * structurally unique context and always kept.
    *
    * Scale shape: only 16-byte chunk DIGESTS ever shuffle (md5 over the
    * joined tokens — the same fingerprint doctrine as Multimodal.chunks;
    * text stays in its scan partition). The first writer per digest is a
    * map-side-combinable MIN over the (doc_id, pos) struct — never a
    * digest-partitioned window, so a hyper-duplicated chunk (the classic
    * skew key: an empty-ish template shared by millions of pages)
    * reduces early instead of piling one partition. Occurrences then
    * meet winners through one hash-partitioned join on the digest and
    * fold down to per-doc counts — Θ(chunks) shuffled bytes, no
    * all-pairs anywhere, same doctrine as dedupIncremental's
    * hash-index join. */
  def crossdocDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = 64
    val docs = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_toks"))
    val occ = docs
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"size(toks) div $w").cast("int") - 1),
          i => md5(array_join(slice(col("toks"), i * w + 1, lit(w)), " ")
            .cast("binary"))))
          .as(Seq("pos", "h")))
    val winner = occ.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
    val perDoc = occ.join(winner, Seq("h"))
      .withColumn("dup",
        col("w.doc_id") =!= col("doc_id") || col("w.pos") =!= col("pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_chunks"))
    docs.select(col("doc_id"), col("n_toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        (col("n_toks") - lit(w.toLong) * coalesce(col("n_dup_chunks"), lit(0L)))
          .as("n_kept_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Incremental (batch-vs-corpus) exact dedup — the daily-increment
    * shape of a crawl pipeline: a NEW batch of documents survives only
    * where its content hash appears neither in the EXISTING corpus nor
    * earlier within the batch itself (first-writer-wins in-batch, like
    * `exact`). Fixture split is deterministic and scale-free: even
    * doc_ids are the corpus, odd the batch.
    *
    * Scale: the corpus side ships only its content-HASH index, never its
    * text (at 100 TB that index is a maintained by-product of `exact`),
    * through one hash-partitioned anti join; in-batch dedup is a window
    * over the batch's hashes (batch-sized, small by definition). A Bloom
    * sketch over the corpus hashes is the map-side prefilter swap when
    * even the anti-join shuffle of the batch is too much — the
    * `bloom_prefilter` operator demonstrates exactly that dataflow. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .withColumn("h", md5(col("text").cast("binary")))
    val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("h"))
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
    batch
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .join(corpus, Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"))
      .orderBy(col("doc_id"))
  }

  /** Canonicalization-gain audit — how many EXTRA exact duplicates a
    * normalization pass (lowercase, strip non-alphanumerics, collapse
    * whitespace — textClean's exact expression) exposes before hashing:
    * the measurement that decides whether a dedup pipeline canonicalizes
    * first (production corpora hide most near-identical recrawls behind
    * case/punctuation jitter; if canon_distinct ≪ raw_distinct the
    * answer is yes). One scan, two map-side digests per doc, one
    * two-level distinct aggregate — only 16-byte digests ever leave the
    * scan partition, and the output is a single audit row of pure
    * integers (exact cross-engine parity) plus two integer-ratio rates. */
  def canonDedupGain(spark: SparkSession, dir: String): DataFrame = {
    val clean = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(md5(col("text").cast("binary")).as("h_raw"),
              md5(clean.cast("binary")).as("h_canon"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h_raw")).as("raw_distinct"),
        countDistinct(col("h_canon")).as("canon_distinct"))
      .select(col("n_docs"), col("raw_distinct"), col("canon_distinct"),
        (col("raw_distinct") - col("canon_distinct"))
          .as("extra_dups_found"),
        round((col("n_docs") - col("raw_distinct")).cast("double") /
          col("n_docs") + 1e-9, 6).as("raw_dup_rate"),
        round((col("n_docs") - col("canon_distinct")).cast("double") /
          col("n_docs") + 1e-9, 6).as("canon_dup_rate"))
  }

  /** Incremental NEAR-dup admission — the near-duplicate twin of
    * [[dedupIncremental]] (same fixture split: even doc_ids are the
    * corpus, odd the new batch): a new document is admitted only if no
    * corpus document is near-identical to it. Exact-hash admission
    * misses every lightly-edited recrawl; this is the gate that catches
    * them.
    *
    * Two-stage shape, candidate proposal then exact verification:
    *  1. The corpus's MinHash band keys form a POSTING INDEX (band →
    *     bounded id list; at 100 TB this index is a maintained
    *     by-product of the staged signature table, not a recompute —
    *     batch admission reads it like `dedupIncremental` reads the
    *     content-hash index). Batch band keys probe it with one
    *     band-keyed join; per-band postings are capped at 256 via
    *     BoundedCollect (the minhashPairs degenerate-bucket guard,
    *     mirrored in the oracle).
    *  2. Candidates verify by EXACT shingle Jaccard ≥ 0.5 — shingle
    *     sets join in by doc KEY only for candidate ids (the
    *     editdistPairs doctrine: the full corpus text never enters the
    *     pair stream), intersection is array-local.
    * Output is per BATCH doc: candidate/verified counts, best verified
    * similarity, and the admission verdict. Work is Θ(batch·bands +
    * candidates); corpus cost is index maintenance only. */
  def neardupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sig = stagedSignatures(spark, dir)
    val bands = sig.select(col("doc_id"),
      explode(array(
        md5(concat(col("mh_s0"), col("mh_s1")).cast("binary")),
        md5(concat(col("mh_s2"), col("mh_s3")).cast("binary")))).as("band"))
    val corpusPost = bands.filter(col("doc_id") % 2 === 0)
      .groupBy(col("band"))
      .agg(graft.functions.BoundedCollect.collect(256)(
        col("doc_id"), lit(0L)).as("r"))
      .filter(col("r._1") <= 256)
      .select(col("band"), expr("transform(r._2, x -> x._1)").as("cids"))
    val cand = bands.filter(col("doc_id") % 2 =!= 0)
      .join(corpusPost, Seq("band"))
      .select(col("doc_id").as("batch_doc"),
        explode(col("cids")).as("corpus_doc"))
      .distinct()
    val shs = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val verified = cand
      .join(shs.select(col("doc_id").as("batch_doc"),
        col("sh").as("sh_a")), Seq("batch_doc"))
      .join(shs.select(col("doc_id").as("corpus_doc"),
        col("sh").as("sh_b")), Seq("corpus_doc"))
      .withColumn("i",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jacc", round(col("i").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("i")) + 1e-9, 4))
    val agg = verified.groupBy(col("batch_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jacc") >= 0.5, 1L).otherwise(0L)).as("n_verified"),
        max(when(col("jacc") >= 0.5, col("jacc"))).as("best_jacc"))
    Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("doc_id") % 2 =!= 0 && col("text").isNotNull)
      .select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"),
        (coalesce(col("n_verified"), lit(0L)) === 0L).as("admitted"),
        col("best_jacc"))
      .orderBy(col("doc_id"))
  }

  /** Edit-distance verification of LSH candidates — minhash bands
    * propose, Levenshtein disposes: the second-stage verifier for
    * near-dup pipelines where shingle Jaccard is too coarse (short
    * documents, heavy token reordering). A pair survives if its edit
    * distance is within an absolute budget (128 edits) AND at most half
    * the longer text.
    *
    * Two scale decisions, both forced by a 100× probe (all-pairs
    * verification with unbounded Levenshtein timed out on 100-way
    * planted duplication — Θ(25M pairs) × O(len²) per pair):
    *  1. STAR candidates, not all-pairs: each band bucket's members
    *     verify against the bucket's MINIMUM doc_id (the proposal
    *     canonical) — Θ(docs·bands) verifications at any duplication
    *     depth, the star edges feeding cluster labeling exactly like
    *     production entity resolution (all-pairs adds no information
    *     when edges only feed connected components).
    *  2. The THRESHOLD form of levenshtein (SQL 3-arg): the banded
    *     algorithm is O(budget·len) and exits early past the budget,
    *     instead of O(len²) on every non-match.
    * The verification rule is pure integer logic (lev ≤ min(128,
    * ⌊max_len/2⌋)) — no float rounding anywhere, so cross-engine parity
    * is exact; the oracle computes unbounded levenshtein and applies the
    * same rule (the threshold changes cost, never the answer). */
  def editdistPairs(spark: SparkSession, dir: String): DataFrame = {
    val budget = 128
    val docs = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val star = bandBuckets(spark, dir)
      .select(explode(expr(
        """transform(filter(ids, b -> b > array_min(ids)),
          |  b -> named_struct('doc_a', array_min(ids), 'doc_b', b))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    star
      .join(docs.select(col("doc_id").as("doc_a"),
                        col("text").as("text_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"),
                        col("text").as("text_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"levenshtein(text_a, text_b, $budget)").cast("long").as("lev"),
        greatest(length(col("text_a")), length(col("text_b")))
          .cast("long").as("max_len"))
      .filter(col("lev") >= 0 && col("lev") <= least(
        lit(budget.toLong), expr("max_len div 2")))
      .withColumn("ned",
        round(col("lev").cast("double") / col("max_len") + 1e-9, 4))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Survivorship / golden-record construction — the step AFTER dedup
    * decides clusters: merge each MinHash near-dup cluster (the groups
    * dedup_clusters labels) into one canonical record under explicit
    * field policies — min id wins the identity, lexicographically-first
    * source wins provenance, max n_chars wins the payload, distinct
    * langs are counted as a merge diagnostic. One join of the cluster
    * labels back to the corpus + one cluster groupBy (field policies
    * reduce map-side); emitted only for real merges (≥ 2 members). */
  def survivorship(spark: SparkSession, dir: String): DataFrame = {
    val labels = stagedLabels(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    Tables.t(spark, dir, "documents")
      .join(labels, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
           min(col("doc_id")).as("canonical_doc"),
           min(col("source")).as("best_source"),
           max(col("n_chars")).as("max_chars"),
           countDistinct(col("lang")).as("n_langs"))
      .filter(col("n_members") >= 2)
      .orderBy(col("cluster_id"))
  }

  /** MinHash estimator-quality evaluation: for every LSH candidate pair,
    * the signature-agreement Jaccard ESTIMATE (k = 4 seeds → exact
    * quarter steps, no float drift) against the TRUE shingle-set Jaccard,
    * with the absolute error — the "is k big enough" measurement that
    * decides signature width before shipping (ann_recall's twin for the
    * text path). Candidates come from the same single-pass band
    * pipeline; truth is one shingle equi-join per pair side (never an
    * all-pairs scan). */
  def minhashEstError(spark: SparkSession, dir: String): DataFrame = {
    val pairs = stagedPairs(spark, dir)
    val sig = stagedSignatures(spark, dir)
    val sh = Tables.spread(Tables.t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val sigA = sig.select(col("doc_id").as("doc_a") +:
      seeds.map(s => col("mh_" + s).as(s + "_a")): _*)
    val sigB = sig.select(col("doc_id").as("doc_b") +:
      seeds.map(s => col("mh_" + s).as(s + "_b")): _*)
    val shA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val agree = seeds.map(s =>
      when(col(s + "_a") === col(s + "_b"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sigA, Seq("doc_a")).join(sigB, Seq("doc_b"))
      .join(shA, Seq("doc_a")).join(shB, Seq("doc_b"))
      .withColumn("est", agree / lit(4.0))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jacc_raw", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("est"),
        round(col("jacc_raw") + 1e-9, 6).as("jacc"),
        round(abs(col("est") - col("jacc_raw")) + 1e-9, 6).as("abs_err"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Two-stage record linkage: MinHash LSH proposes candidates (recall),
    * Jaro-Winkler scores them (precision) — the classic blocked-linkage
    * pipeline, with the scorer as a native codegen'd expression
    * (graft.functions.JaroWinkler; Spark has no built-in Jaro family).
    *
    * Scale: Θ(candidate pairs) — document text ships only for docs that
    * appear in a candidate pair (two key joins on the skinny pair list),
    * never pair-wise before the LSH bound. The decision column compares
    * the ROUNDED score (+1e-9 nudge) so pair membership can't flip on a
    * 1-ulp cross-engine difference in the double formula. */
  def linkageVerify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val jw = round(graft.functions.GraftFunctions.jaroWinkler(
      col("ta"), col("tb")) + 1e-9, 6)
    stagedPairs(spark, dir)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), jw.as("jw"),
        (jw >= 0.9).as("is_dup"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-source duplication matrix — which source PAIRS share near-dup
    * clusters (the provenance question behind every mixing decision: a
    * source that mostly mirrors another adds weight, not information,
    * and double-counts whatever the mixing schedule gives both). The
    * diagonal (a = a, requiring ≥2 docs of that source in one cluster)
    * is intra-source duplication; off-diagonal cells are cross-source
    * contamination.
    *
    * Scale: one doc_id key join of the staged label table against the
    * source column, a map-side-combinable (cluster, source) aggregate —
    * ≤ |sources| rows per cluster — then a cluster-keyed self-join of
    * that Θ(clusters·sources) relation (fan-out ≤ |sources|² per
    * cluster) into a Θ(|sources|²) final matrix. Nothing row-level
    * crosses the second shuffle, and the lineage is staged once per
    * session (materializeOnce), shared with every other label consumer. */
  def dedupCrossSource(spark: SparkSession, dir: String): DataFrame = {
    val cs = stagedLabels(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
      .join(Tables.t(spark, dir, "documents")
              .select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("m"))
    cs.as("a")
      .join(cs.as("b"), col("a.cluster_id") === col("b.cluster_id") &&
        (col("a.source") < col("b.source") ||
         (col("a.source") === col("b.source") && col("a.m") >= 2)))
      .groupBy(col("a.source").as("source_a"),
               col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_clusters"),
           sum(col("a.m") + when(col("a.source") === col("b.source"),
             lit(0L)).otherwise(col("b.m"))).as("n_docs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cross_source" -> (dedupCrossSource _),
    "linkage_verify"     -> (linkageVerify _),
    "minhash_est_error"  -> (minhashEstError _),
    "dedup_survivorship" -> (survivorship _),
    "editdist_pairs" -> (editdistPairs _),
    "dedup_incremental" -> (dedupIncremental _),
    "neardup_incremental" -> (neardupIncremental _),
    "canon_dedup_gain" -> (canonDedupGain _),
    "crossdoc_dedup" -> (crossdocDedup _),
    "intradoc_dedup" -> (intradocDedup _),
    "line_dedup"     -> (lineDedup _),
    "dedup_exact"    -> (exact _),
    "minhash_sig"    -> (minhashSig _),
    // the staged form (same relation, committed once per dir/fp — the
    // dedup_clusters→stagedLabels precedent): Bench repeats and the
    // probe read the artifact the consumers share instead of re-running
    // generation per invocation. Row order is not part of the contract
    // (the gate's hash is order-independent, proven by dedup_clusters).
    "minhash_pairs"  -> ((s: SparkSession, d: String) =>
      stagedPairs(s, d).orderBy(col("doc_a"), col("doc_b"))),
    "ngram_jaccard"  -> (ngramJaccard _),
    "simhash"        -> (simhash _),
    "embed_neardup"  -> (embedNearDup _),
    "dedup_clusters" -> (stagedLabels _),
    "semantic_dedup" -> (semanticDedup _))

  // Shared embedding-oracle SQL fragments — single definitions in
  // Similarity (duckCosine / duckBucket), referenced here so bucket or
  // precision changes edit exactly one string. NOTE: referenced from the
  // `oracle` map initializer below, which is safe only because they live
  // in a DIFFERENT object (object-local forward val references read
  // null — the init-order bug this file once had).
  private def duckCos(a: String, b: String): String =
    Similarity.duckCosine(a, b)
  private def duckSignBucket: String = Similarity.duckBucket

  /** DuckDB shingle expression mirroring `shingles`. */
  private val duckShingles =
    """CASE WHEN len(toks) >= 3
      |  THEN list_transform(generate_series(1, len(toks) - 2),
      |       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
      |  ELSE [text] END""".stripMargin

  private[ops] val duckSigCte =
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest($duckShingles) AS sh FROM d),
       |sig AS (
       |  SELECT doc_id,
       |    min(md5('s0|' || sh)) AS mh_s0,
       |    min(md5('s1|' || sh)) AS mh_s1,
       |    min(md5('s2|' || sh)) AS mh_s2,
       |    min(md5('s3|' || sh)) AS mh_s3
       |  FROM sh GROUP BY doc_id)
       |""".stripMargin

  /** Shared CTE chain: signatures → capped band buckets → candidate
    * pairs → undirected edges → recursive reachability. Single source for
    * the dedup_clusters oracle AND Corpus's corpus_curate funnel oracle —
    * a cap/threshold change edits exactly one string. */
  /** CTEs up to the LSH band candidate pairs — shared by minhash_pairs,
    * editdist_pairs, and (extended with reachability below) the cluster
    * oracles. */
  private[ops] val duckPairsCtes: String =
    duckSigCte +
      """, bands AS (
        |  SELECT doc_id, unnest([md5(mh_s0 || mh_s1),
        |                         md5(mh_s2 || mh_s3)]) AS band
        |  FROM sig),
        |keep AS (
        |  SELECT band FROM bands GROUP BY band
        |  HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN keep k ON a.band = k.band
        |  JOIN bands b ON a.band = b.band
        |  WHERE a.doc_id < b.doc_id)"""
        .stripMargin

  private[ops] val duckReachCtes: String =
    duckPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r)"""
        .stripMargin

  private val duckSimhashBits = (1 to 16).map { i =>
    s"""(CASE WHEN list_sum(list_transform(hs,
       | h -> ((strpos('0123456789abcdef', substring(h, $i, 1)) - 1) % 2) * 2 - 1
       |)) > 0 THEN ${1L << (i - 1)} ELSE 0 END)""".stripMargin
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "minhash_est_error" ->
      (duckPairsCtes +
        """,
          |shs AS (SELECT DISTINCT doc_id, sh FROM sh),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM shs GROUP BY 1),
          |ix AS (
          |  SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          |  FROM pairs p
          |    JOIN shs a ON a.doc_id = p.doc_a
          |    JOIN shs b ON b.doc_id = p.doc_b AND b.sh = a.sh
          |  GROUP BY 1, 2),
          |e AS (
          |  SELECT p.doc_a, p.doc_b,
          |    ((sa.mh_s0 = sb.mh_s0)::INT + (sa.mh_s1 = sb.mh_s1)::INT
          |     + (sa.mh_s2 = sb.mh_s2)::INT + (sa.mh_s3 = sb.mh_s3)::INT)
          |      / 4.0 AS est,
          |    COALESCE(ix.i, 0)
          |      / (ca.n + cb.n - COALESCE(ix.i, 0))::DOUBLE AS jacc_raw
          |  FROM pairs p
          |    JOIN sig sa ON sa.doc_id = p.doc_a
          |    JOIN sig sb ON sb.doc_id = p.doc_b
          |    JOIN cnt ca ON ca.doc_id = p.doc_a
          |    JOIN cnt cb ON cb.doc_id = p.doc_b
          |    LEFT JOIN ix ON ix.doc_a = p.doc_a AND ix.doc_b = p.doc_b)
          |SELECT doc_a, doc_b, est,
          |  ROUND(jacc_raw + 1e-9, 6) AS jacc,
          |  ROUND(abs(est - jacc_raw) + 1e-9, 6) AS abs_err
          |FROM e ORDER BY doc_a, doc_b""".stripMargin),
    "dedup_survivorship" ->
      (duckReachCtes +
        """,
          |labels AS (
          |  SELECT id AS doc_id, MIN(r) AS cluster_id
          |  FROM reach GROUP BY id)
          |SELECT l.cluster_id,
          |  COUNT(*) AS n_members,
          |  MIN(d.doc_id) AS canonical_doc,
          |  MIN(d.source) AS best_source,
          |  CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
          |  COUNT(DISTINCT d.lang) AS n_langs
          |FROM documents d JOIN labels l USING (doc_id)
          |GROUP BY 1 HAVING COUNT(*) >= 2
          |ORDER BY cluster_id""".stripMargin),
    "dedup_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT h FROM d WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT doc_id, h,
        |         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |  FROM d WHERE doc_id % 2 <> 0)
        |SELECT doc_id, h FROM b
        |WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM c WHERE c.h = b.h)
        |ORDER BY doc_id""".stripMargin,
    "crossdoc_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, len(toks)::BIGINT AS n_toks, toks FROM t),
        |c AS (
        |  SELECT doc_id, unnest(range(0, len(toks) // 64)) AS pos, toks
        |  FROM n WHERE len(toks) >= 64),
        |o AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(toks[(pos*64+1):(pos*64+64)], ' ')) AS h
        |  FROM c),
        |r AS (
        |  SELECT doc_id, pos, h, ROW_NUMBER() OVER (
        |    PARTITION BY h ORDER BY doc_id, pos) AS rn
        |  FROM o),
        |d AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_chunks,
        |    CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_chunks
        |  FROM r GROUP BY 1)
        |SELECT n.doc_id,
        |  COALESCE(d.n_chunks, 0)::BIGINT AS n_chunks,
        |  COALESCE(d.n_dup_chunks, 0)::BIGINT AS n_dup_chunks,
        |  (n.n_toks - 64 * COALESCE(d.n_dup_chunks, 0))::BIGINT
        |    AS n_kept_tokens
        |FROM n LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin,
    "intradoc_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL AND len(text) > 0),
        |c AS (
        |  SELECT doc_id, list_transform(range(0, (len(toks) + 7) // 8),
        |      i -> array_to_string(toks[i*8+1 : i*8+8], ' ')) AS chunks
        |  FROM t),
        |u AS (
        |  SELECT doc_id, unnest(chunks) AS chunk,
        |         generate_subscripts(chunks, 1) AS pos
        |  FROM c),
        |k AS (
        |  SELECT doc_id, chunk, pos, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id, chunk ORDER BY pos) AS rn
        |  FROM u),
        |a AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_kept,
        |         STRING_AGG(chunk, ' ' ORDER BY pos) AS clean_text
        |  FROM k WHERE rn = 1 GROUP BY doc_id),
        |n AS (SELECT doc_id, COUNT(*)::BIGINT AS n_chunks
        |      FROM u GROUP BY doc_id)
        |SELECT n.doc_id, n.n_chunks, a.n_kept, a.clean_text
        |FROM n JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |ch AS (
        |  SELECT doc_id, i AS pos,
        |         array_to_string(toks[i*2+1 : i*2+2], ' ') AS line
        |  FROM d, UNNEST(range(CAST(ceil(len(toks) / 2.0) AS BIGINT))) AS u(i)),
        |bp AS (
        |  SELECT line FROM ch GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 0.25 * (SELECT count(*) FROM d)),
        |kept AS (
        |  SELECT * FROM ch WHERE line NOT IN (SELECT line FROM bp)),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_kept,
        |         string_agg(line, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.n_kept, 0)::BIGINT AS n_kept,
        |       coalesce(agg.clean_text, '') AS clean_text
        |FROM d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source, ROW_NUMBER() OVER (
        |    PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "minhash_sig" ->
      (duckSigCte + "SELECT * FROM sig ORDER BY doc_id"),
    "minhash_pairs" ->
      (duckPairsCtes +
        "\nSELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b"),
    "canon_dedup_gain" ->
      """WITH d AS (
        |  SELECT md5(text) AS h_raw,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS h_canon
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT COUNT(*)::BIGINT AS n_docs,
        |  COUNT(DISTINCT h_raw)::BIGINT AS raw_distinct,
        |  COUNT(DISTINCT h_canon)::BIGINT AS canon_distinct,
        |  (COUNT(DISTINCT h_raw) - COUNT(DISTINCT h_canon))::BIGINT
        |    AS extra_dups_found,
        |  ROUND((COUNT(*) - COUNT(DISTINCT h_raw))::DOUBLE / COUNT(*)
        |    + 1e-9, 6) AS raw_dup_rate,
        |  ROUND((COUNT(*) - COUNT(DISTINCT h_canon))::DOUBLE / COUNT(*)
        |    + 1e-9, 6) AS canon_dup_rate
        |FROM d""".stripMargin,
    // corpus = even doc_ids, batch = odd (dedup_incremental's split);
    // per-band corpus postings capped at 256 like the pairs oracle
    "neardup_incremental" ->
      (duckSigCte +
        """, bands AS (
          |  SELECT doc_id, unnest([md5(mh_s0 || mh_s1),
          |                         md5(mh_s2 || mh_s3)]) AS band
          |  FROM sig),
          |ckeep AS (
          |  SELECT band FROM bands WHERE doc_id % 2 = 0
          |  GROUP BY band HAVING COUNT(*) <= 256),
          |cand AS (
          |  SELECT DISTINCT nb.doc_id AS batch_doc, cb.doc_id AS corpus_doc
          |  FROM bands nb
          |  JOIN ckeep k ON nb.band = k.band
          |  JOIN bands cb ON nb.band = cb.band
          |  WHERE nb.doc_id % 2 <> 0 AND cb.doc_id % 2 = 0),
          |shs AS (SELECT DISTINCT doc_id, sh FROM sh),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM shs GROUP BY 1),
          |ix AS (
          |  SELECT c.batch_doc, c.corpus_doc, COUNT(*) AS i
          |  FROM cand c
          |    JOIN shs a ON a.doc_id = c.batch_doc
          |    JOIN shs b ON b.doc_id = c.corpus_doc AND b.sh = a.sh
          |  GROUP BY 1, 2),
          |v AS (
          |  SELECT c.batch_doc, c.corpus_doc,
          |    ROUND(COALESCE(i.i, 0)::DOUBLE
          |      / (ca.n + cb.n - COALESCE(i.i, 0)) + 1e-9, 4) AS jacc
          |  FROM cand c
          |    JOIN cnt ca ON ca.doc_id = c.batch_doc
          |    JOIN cnt cb ON cb.doc_id = c.corpus_doc
          |    LEFT JOIN ix i ON i.batch_doc = c.batch_doc
          |      AND i.corpus_doc = c.corpus_doc),
          |agg AS (
          |  SELECT batch_doc AS doc_id,
          |    COUNT(*)::BIGINT AS n_candidates,
          |    CAST(SUM(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_verified,
          |    MAX(CASE WHEN jacc >= 0.5 THEN jacc END) AS best_jacc
          |  FROM v GROUP BY 1)
          |SELECT d.doc_id,
          |  COALESCE(a.n_candidates, 0) AS n_candidates,
          |  COALESCE(a.n_verified, 0) AS n_verified,
          |  (COALESCE(a.n_verified, 0) = 0) AS admitted,
          |  a.best_jacc
          |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
          |WHERE d.doc_id % 2 <> 0 AND d.text IS NOT NULL
          |ORDER BY d.doc_id""".stripMargin),
    "linkage_verify" ->
      (duckPairsCtes +
        """
          |SELECT p.doc_a, p.doc_b,
          |  ROUND(jaro_winkler_similarity(a.text, b.text) + 1e-9, 6) AS jw,
          |  ROUND(jaro_winkler_similarity(a.text, b.text) + 1e-9, 6) >= 0.9
          |    AS is_dup
          |FROM pairs p
          |  JOIN documents a ON a.doc_id = p.doc_a
          |  JOIN documents b ON b.doc_id = p.doc_b
          |ORDER BY p.doc_a, p.doc_b""".stripMargin),
    // unbounded levenshtein + the same integer keep-rule: the Spark
    // side's 128-edit threshold variant changes cost, never the answer
    "editdist_pairs" ->
      (duckPairsCtes +
        """, bmin AS (
          |  SELECT b.band, MIN(b.doc_id) AS doc_a
          |  FROM bands b JOIN keep k ON b.band = k.band
          |  GROUP BY b.band),
          |star AS (
          |  SELECT DISTINCT m.doc_a, b.doc_id AS doc_b
          |  FROM bmin m JOIN bands b ON m.band = b.band
          |  WHERE b.doc_id > m.doc_a),
          |lv AS (
          |  SELECT s.doc_a, s.doc_b,
          |         levenshtein(a.text, b.text)::BIGINT AS lev,
          |         GREATEST(length(a.text), length(b.text))::BIGINT
          |           AS max_len
          |  FROM star s
          |  JOIN documents a ON a.doc_id = s.doc_a
          |  JOIN documents b ON b.doc_id = s.doc_b)
          |SELECT doc_a, doc_b, lev, max_len,
          |       ROUND(lev::DOUBLE / max_len + 1e-9, 4) AS ned
          |FROM lv
          |WHERE lev <= LEAST(128, max_len // 2)
          |ORDER BY doc_a, doc_b""".stripMargin),
    "ngram_jaccard" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source, text,
         |         string_split_regex(text, '\\s+') AS toks
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |         list_distinct($duckShingles) AS sh
         |  FROM d0),
         |ex AS (
         |  SELECT doc_id, source, len(sh) AS n, unnest(sh) AS s FROM d),
         |keep AS (
         |  SELECT source, s FROM ex GROUP BY source, s
         |  HAVING COUNT(*) > 1 AND COUNT(*) <= 64),
         |common AS (
         |  SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.n AS n_a, b.n AS n_b, COUNT(*) AS c
         |  FROM ex a
         |  JOIN keep k ON a.source = k.source AND a.s = k.s
         |  JOIN ex b ON a.source = b.source AND a.s = b.s
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT source, doc_a, doc_b, jacc FROM (
         |  SELECT source, doc_a, doc_b,
         |    ROUND(c::DOUBLE / (n_a + n_b - c) + 1e-9, 4) AS jacc
         |  FROM common)
         |WHERE jacc >= 0.05
         |ORDER BY doc_a, doc_b""".stripMargin,
    "simhash" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_transform(string_split_regex(text, '\\s+'),
         |                   t -> md5(t)) AS hs
         |  FROM documents)
         |SELECT doc_id, CAST($duckSimhashBits AS BIGINT) AS simhash
         |FROM t ORDER BY doc_id""".stripMargin,
    "dedup_clusters" ->
      (duckReachCtes +
        """
          |SELECT id AS doc_id, min(r) AS cluster_id,
          |       (min(r) = id) AS is_canonical
          |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
    "dedup_cross_source" ->
      (duckReachCtes +
        """,
          |labels AS (
          |  SELECT id AS doc_id, MIN(r) AS cluster_id
          |  FROM reach GROUP BY id),
          |cs AS (
          |  SELECT l.cluster_id, d.source, CAST(COUNT(*) AS BIGINT) AS m
          |  FROM labels l JOIN documents d USING (doc_id)
          |  GROUP BY 1, 2)
          |SELECT a.source AS source_a, b.source AS source_b,
          |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
          |  CAST(SUM(a.m + CASE WHEN a.source = b.source THEN 0
          |                      ELSE b.m END) AS BIGINT) AS n_docs
          |FROM cs a JOIN cs b ON a.cluster_id = b.cluster_id
          |  AND (a.source < b.source
          |       OR (a.source = b.source AND a.m >= 2))
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "embed_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $duckSignBucket AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       ${duckCos("a.embedding", "b.embedding")} AS sim
         |FROM e a JOIN e b
         |  ON ${Similarity.duckHamming("a.bucket", "b.bucket")}
         |     <= ${Similarity.ProbeRadius}
         |WHERE a.vec_id < b.vec_id
         |  AND ${duckCos("a.embedding", "b.embedding")} >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,
    "semantic_dedup" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, embedding, $duckSignBucket AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM e a JOIN e b
         |    ON ${Similarity.duckHamming("a.bucket", "b.bucket")}
         |       <= ${Similarity.ProbeRadius}
         |  WHERE a.vec_id < b.vec_id
         |    AND ${duckCos("a.embedding", "b.embedding")} >= 0.35),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT re.id, ed.dst FROM reach re JOIN edges ed ON ed.src = re.r)
         |SELECT id AS vec_id, min(r) AS cluster_id,
         |       (min(r) = id) AS is_canonical
         |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin)
}
