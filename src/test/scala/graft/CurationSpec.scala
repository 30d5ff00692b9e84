package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.ops.{Corpus, Curation, Events}

/** Round-3 curation operators: sequence packing, repetition statistics,
  * PII scrubbing, contamination checks, and event-grid resampling —
  * edge semantics on hand-built mini-fixtures plus invariants on the
  * real sf0.001 fixtures. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String, String, String)]): String =
    TestFixtures.writeDir(Map("documents" ->
      rows.toDF("doc_id", "text", "lang", "source")))

  test("doc_pack: packs split at the 2048-token budget, offsets are prefix sums") {
    val d = docsDir(Seq(
      (0L, Seq.fill(1000)("w").mkString(" "), "en", "s"),
      (1L, Seq.fill(1000)("w").mkString(" "), "en", "s"),
      (2L, Seq.fill(1000)("w").mkString(" "), "en", "s"),
      (3L, Seq.fill(100)("w").mkString(" "), "en", "s")))
    val rows = Curation.docPack(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    // offsets 0,1000,2000,3000 → floor(/2048) = packs 0,0,0,1
    assert(rows.toSeq === Seq(
      (0L, 0L, 0L, 1L), (1L, 1000L, 0L, 2L),
      (2L, 2000L, 0L, 3L), (3L, 3000L, 1L, 1L)))
  }

  test("doc_pack: packs never cross the 200-doc shard boundary") {
    val rows = Curation.docPack(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) / 200) // shard = doc_id / 200
    }
    // within each (lang, shard): offset is the running sum of n_tokens
    rows.groupBy(r => (r.getString(1), r.getLong(2))).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(0))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getLong(4) === cum)
        cum += r.getLong(3)
      }
    }
  }

  test("repetition_stats: fully repetitive vs all-distinct documents") {
    val d = docsDir(Seq(
      (0L, "a a a a", "en", "s"),   // 3 bigrams, all "a a"
      (1L, "a b c", "en", "s"),     // 2 distinct bigrams
      (2L, "solo", "en", "s")))     // 1 token → no bigrams → absent
    val out = Curation.repetitionStats(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(0L) === ((3L, 1.0, 0.6667)))
    assert(out(1L) === ((2L, 0.5, 0.0)))
    assert(!out.contains(2L))
  }

  test("contamination: a copy of a benchmark doc scores 1.0, disjoint text 0.0") {
    val bench = (1 to 20).map(i => s"tok$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, bench, "en", "s"),                     // benchmark (0 % 50 == 0)
      (1L, bench, "en", "s"),                     // exact copy → fully hit
      (2L, (1 to 20).map(i => s"other$i").mkString(" "), "en", "s")))
    val out = Curation.contamination(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(4))).toMap
    assert(out(0L) === ((true, 1.0)))   // benchmark overlaps itself
    assert(out(1L) === ((false, 1.0)))
    assert(out(2L) === ((false, 0.0)))
  }

  test("pii_scrub: every digit run replaced, counts match") {
    val rows = Curation.piiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit))
      assert(r.getLong(2) >= 1) // Customer#NNNNNN names carry one id run
    }
  }

  test("lm_score: hand-computed Laplace bigram log-probs") {
    val d = docsDir(Seq(
      (0L, "a b", "en", "s"), (1L, "a b", "en", "s"), (2L, "a c", "en", "s")))
    // U: a=3 b=2 c=1 (all in-vocab, cap 32768), V=3+1=4 (the +1 is the
    // <unk> bucket); B: "a b"=2, "a c"=1
    // doc0/1: ln((2+1)/(3+4)) = -0.8473; doc2: ln((1+1)/(3+4)) = -1.2528
    val out = graft.ops.Curation.lmScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) === ((1L, -0.8473)))
    assert(out(1L) === ((1L, -0.8473)))
    assert(out(2L) === ((1L, -1.2528)))
  }

  test("lm_score: driver-side unigram model is capped at k rows, tail shares one OOV mass") {
    // 4 distinct terms but k=2: the collected relation must hold exactly
    // the top-2 by (count DESC, term ASC) — the cap that keeps the
    // driver materialization bounded on a billion-term raw scrape.
    val toks = Seq(
      (0L, Seq("a", "a", "a", "b", "b", "c", "d")),
      (1L, Seq("a", "b"))).toDF("doc_id", "toks")
    val (rows, v, oovMass) = graft.ops.Curation.lmModel(toks, 2)
    assert(rows.length === 2)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 4L), ("b", 3L)))
    assert(v === 3L)       // 2 in-vocab + 1 <unk> bucket
    assert(oovMass === 2L) // c + d occurrences
    // And the production constant really is the stated bound.
    assert(graft.ops.Curation.LmVocabCap === 32768)
  }

  test("importance_resample: independent plain-Scala recompute of the " +
       "hashed-bucket model and every document weight") {
    // target = doc_id % 50 == 0 → doc 0 and 50; raw = the rest.
    val d = docsDir(Seq(
      (0L, "alpha beta alpha gamma", "en", "s"),   // target
      (50L, "alpha beta delta", "en", "s"),         // target
      (1L, "alpha beta alpha beta", "en", "s"),     // raw, target-like
      (2L, "omega psi chi phi omega", "en", "s"),   // raw, off-target
      (3L, "alpha omega", "en", "s")))              // raw, mixed
    val out = graft.ops.Curation.importanceResample(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap

    // Plain-Scala replay of the exact definition.
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16) % 64
    }
    val docs = Map(
      0L -> "alpha beta alpha gamma", 50L -> "alpha beta delta",
      1L -> "alpha beta alpha beta", 2L -> "omega psi chi phi omega",
      3L -> "alpha omega")
    val toksOf = docs.view.mapValues(_.split("\\s+").toSeq).toMap
    val (tgt, raw) = toksOf.partition(_._1 % 50 == 0)
    val tCnt = tgt.values.flatten.groupBy(bucket).view.mapValues(_.size).toMap
    val rCnt = raw.values.flatten.groupBy(bucket).view.mapValues(_.size).toMap
    val tt = tCnt.values.sum.toDouble
    val rt = rCnt.values.sum.toDouble
    def lam(b: Int): Double =
      math.log((tCnt.getOrElse(b, 0) + 1.0) / (tt + 64.0)) -
        math.log((rCnt.getOrElse(b, 0) + 1.0) / (rt + 64.0))
    val expWeights = raw.map { case (id, _) =>
      id -> BigDecimal(toksOf(id).map(t => lam(bucket(t))).sum + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val wCut = BigDecimal(
      expWeights.values.sum / expWeights.size + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet === raw.keySet, "only raw docs are scored")
    expWeights.foreach { case (id, w) =>
      assert(out(id)._1 === toksOf(id).size.toLong)
      assert(out(id)._2 === w, s"weight mismatch for doc $id")
      assert(out(id)._3 === (w > wCut), s"keep verdict mismatch for $id")
    }
    // The target-like doc must outrank the off-target doc.
    assert(out(1L)._2 > out(2L)._2,
      "a doc written in the target's vocabulary must score higher")
  }

  test("quality_ensemble: hand-computed signals and every rule edge") {
    // 48 tokens, every bigram distinct, 50% stopwords, mean word length
    // (3+7+2+7)/4 = 4.75 ∈ [3, 5] — passes the full stack.
    val longGood = (1 to 12).flatMap(i =>
      Seq("the", f"word$i%02da", "of", f"word$i%02db")).mkString(" ")
    val d = docsDir(Seq(
      (0L, longGood, "en", "s"),
      (1L, "the alpha of beta and", "en", "s"), // 5 toks → fails r_len
      (2L, ("xx " * 40).trim, "en", "s"),       // no stopwords, repeated
      (3L, "the of a and " + ("1234567890 " * 30).trim, "en", "s")))
    val out = graft.ops.Curation.qualityEnsemble(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap

    val r0 = out(0L)
    assert(r0.getLong(1) === 48L)
    assert(r0.getDouble(2) === 4.75)
    assert(r0.getDouble(3) ===
      BigDecimal(24.0 / 48 + 1e-9).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r0.getDouble(5) === 0.0, "all bigrams distinct")
    assert(r0.getLong(11) === 5L)
    assert(r0.getBoolean(12), "doc 0 must pass the full stack")

    val r1 = out(1L)
    assert(!r1.getBoolean(6) && !r1.getBoolean(12),
      "5 tokens fails r_len and therefore keep")
    assert(r1.getLong(11) < 5L)

    val r2 = out(2L)
    assert(!r2.getBoolean(8), "no stopwords → r_stop fails")
    assert(!r2.getBoolean(10),
      "a 40×-repeated token is pure duplicate bigrams → r_rep fails")
    assert(r2.getDouble(5) ===
      BigDecimal(38.0 / 39 + 1e-9).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      "39 bigrams, 1 distinct → 38/39 duplicate fraction")

    val r3 = out(3L)
    assert(!r3.getBoolean(9), "300 digit chars of 342 → r_digit fails")
    assert(r3.getDouble(4) ===
      BigDecimal(300.0 / 342 + 1e-9).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("corpus_curate_v2: subset of curate, benchmark-free, taint-free, " +
       "and split is constant within every cluster") {
    val v2 = graft.ops.Corpus.curateV2(spark, dir).collect()
    assert(v2.nonEmpty)
    val v1 = graft.ops.Corpus.curate(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(v2.forall(r => v1.contains(r.getLong(0))),
      "v2 must only ever REMOVE curate survivors")
    assert(v2.forall(_.getLong(0) % 50 != 0),
      "benchmark members must never reach a release")
    val tainted = graft.ops.Curation.clusterTaint(spark, dir).collect()
      .filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    assert(v2.forall(r => !tainted.contains(r.getLong(2))),
      "a tainted cluster's members must all be removed")
    v2.groupBy(_.getLong(2)).values.foreach { g =>
      assert(g.map(_.getString(3)).distinct.length === 1,
        "cluster-hash split cannot straddle a cluster")
    }
  }

  test("semantic_dedup: planted identical embeddings cluster together, min id canonical") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val other = Array.tabulate(64)(i => math.cos(i * 2.3).toFloat)
    val d = TestFixtures.writeDir(Map("embeddings" -> Seq(
      (10L, base, 0), (11L, base.map(x => x * 2.0f), 0), // same direction
      (12L, other, 1))
      .toDF("vec_id", "embedding", "label")))
    val out = graft.ops.Dedup.semanticDedup(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L) === ((10L, true)))
    assert(out(11L) === ((10L, false))) // cosine 1.0 with 10 → same cluster
    assert(out(12L)._2 === true)        // unrelated vector stays canonical
  }

  test("window_dist: cume_dist bounds, full-frame min/max agree with group agg") {
    val rows = graft.ops.Relational.windowDist(spark, dir).collect()
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0001))
    val byCust = rows.groupBy(_.getLong(1))
    byCust.values.foreach { g =>
      val minP = g.map(_.getDouble(4)).distinct
      val maxP = g.map(_.getDouble(5)).distinct
      assert(minP.length === 1 && maxP.length === 1) // full frame is constant
      assert(minP.head <= maxP.head)
    }
  }

  test("profile_table: one row per column, counts consistent") {
    val rows = graft.ops.Relational.profileTable(spark, dir).collect()
    assert(rows.length === 5)
    val n = Tables.t(spark, dir, "orders").count()
    rows.foreach { r =>
      assert(r.getLong(1) === n)              // n_rows
      assert(r.getLong(2) === 0L)             // no nulls in fixture
      assert(r.getLong(3) <= n)               // n_distinct bounded
    }
  }

  test("scd2_history: intervals chain per user, one current row, states compressed") {
    val rows = Events.scdHistory(spark, dir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getTimestamp(2).getTime)
      assert(sorted.count(_.getBoolean(4)) === 1)       // one open interval
      assert(sorted.last.isNullAt(3))                   // and it is the last
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) === b.getTimestamp(2)) // valid_to chains
          assert(a.getString(1) !== b.getString(1))       // states compressed
        case _ => ()
      }
    }
  }

  test("events_resample: contiguous 6h grid per user, counts reconcile, gaps are zero") {
    val d = TestFixtures.writeDir(Map("events" -> Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:30:00"), 7L, "click", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 13:00:00"), 7L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val rows = Events.resample(spark, d).collect()
    // buckets 00:00 (1 event), 06:00 (gap), 12:00 (1 event)
    assert(rows.length === 3)
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 0L, 1L))
    assert(rows(1).isNullAt(3)) // gap sum_value is NULL, not 0
    // real fixture: totals reconcile and each user's grid is contiguous
    val full = Events.resample(spark, dir).collect()
    assert(full.map(_.getLong(2)).sum ===
      Tables.t(spark, dir, "events").count())
    full.groupBy(_.getLong(0)).values.foreach { g =>
      val ts = g.map(_.getTimestamp(1).getTime).sorted.toSeq
      ts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a === 6L * 3600 * 1000)
        case _         => ()
      }
    }
  }

  test("doc_shuffle: a true permutation — every doc exactly once, " +
       "contiguous in-shard positions, identical across runs") {
    val dir = "/root/testdata/sf0.001"
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val a = Curation.docShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.map(_._1).toSet.size === n.toInt) // every doc, once
    a.groupBy(_._2).foreach { case (_, rows) =>   // contiguous ranks
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val b = Curation.docShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq) // scheduling-independent determinism
  }

  test("weighted_sample: TopK heap == window ranking on the real fixture, " +
       "and a 500-ticket whale beats 1-ticket minnows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // Pin the bounded-heap path against the window formulation (the
    // same equivalence TextSimilaritySpec pins for sim_topk_brute).
    val dir = "/root/testdata/sf0.001"
    val got = Corpus.weightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pri = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("w", least(
        greatest(ceil(col("n_chars") / 100.0).cast("int"), lit(1)), lit(1024)))
      .withColumn("pri", array_min(transform(
        sequence(lit(1), col("w")),
        i => md5(concat(col("lang"), lit("|"),
          col("doc_id").cast("string"), lit("|"), i.cast("string"))
          .cast("binary")))))
    val want = pri
      .withColumn("rnk", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(substring(col("pri"), 1, 13), col("doc_id"))))
      .filter(col("rnk") <= 20)
      .select(col("lang"), col("doc_id"), col("rnk").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === want.toSet)

    // Weight-proportionality: one 50000-char doc (500 tickets) among 49
    // single-ticket docs holds 500/549 of the stratum's tickets — its
    // min ticket hash lands in the top 20 of 50 (deterministic for the
    // fixed hash function; failing would need ≥30 of 49 single tickets
    // to each beat a min-of-500).
    val whale = (1L to 49L).map(i =>
        (i, "t", "xx", "s", 1L)) :+ (50L, "t", "xx", "s", 50000L)
    val wdir = TestFixtures.writeDir(Map(
      "documents" -> whale.toDF("doc_id", "text", "lang", "source", "n_chars")))
    val winners = Corpus.weightedSample(spark, wdir).collect()
      .map(_.getLong(1)).toSet
    assert(winners.contains(50L))
  }

  test("shard_manifest: gapless ranks (max_pos == n_docs), full coverage, " +
       "and a layout-independent checksum (identical across runs)") {
    def run() = Curation.shardManifest(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val a = run()
    a.foreach { case (_, (nDocs, _, maxPos, _)) =>
      assert(maxPos === nDocs, "in-shard ranks must be gapless")
    }
    val total = Tables.t(spark, dir, "documents").count()
    assert(a.map(_._2._1).sum === total)
    // the order-insensitive checksum must not depend on execution layout
    assert(run().toSeq === a.toSeq)
  }

  test("bloom_prefilter flags exactly the contaminated training docs " +
       "with exact distinct-gram overlap counts") {
    // doc 0 is a benchmark shard (0 % 50 = 0); train doc 1 copies its
    // text verbatim (4 shared 3-grams), train doc 2 is disjoint.
    val bench = "w1 w2 w3 w4 w5 w6"
    val bdir = TestFixtures.writeDir(Map(
      "documents" -> Seq(
        (0L, bench, "en", "src0"),
        (1L, bench, "en", "src1"),
        (2L, "z1 z2 z3 z4 z5 z6", "en", "src1"))
        .toDF("doc_id", "text", "lang", "source")))
    val got = Curation.bloomPrefilter(spark, bdir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L))
  }

  test("bloom_prefilter == contamination's contaminated-training-doc " +
       "slice on the real fixture (the sketch never changes the answer)") {
    val viaBloom = Curation.bloomPrefilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaJoin = Curation.contamination(spark, dir)
      .filter(!col("is_benchmark") && col("n_hit") > 0)
      .select(col("doc_id"), col("n_hit")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom === viaJoin)
  }

  test("quantile_norm: norm_q is each source's CDF at the doc's bin — " +
       "recomputed from the emitted bins; top bin normalizes to 1") {
    val rows = Curation.quantileNorm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.length === Tables.t(spark, dir, "documents").count())
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val n = docs.length.toDouble
      docs.foreach { case (id, _, bin, q) =>
        val cdf = docs.count(_._3 <= bin) / n
        assert(math.abs(q - cdf) < 1e-5, s"doc $id source $src")
      }
      val maxBin = docs.map(_._3).max
      docs.filter(_._3 == maxBin).foreach { d =>
        assert(math.abs(d._4 - 1.0) < 1e-5) }
    }
  }

  test("padding_audit: both strategies match a naive batch recompute; " +
       "length-sorted batching strictly cuts padding waste") {
    val ts = Tables.t(spark, dir, "documents")
      .selectExpr("doc_id", "LEAST(n_chars div 4, 2048L) AS t").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def naive(ordered: Seq[Long]): (Long, Long, Long) = {
      val batches = ordered.grouped(8).toSeq
      (batches.length.toLong, ordered.sum,
       batches.map(b => b.max * b.length).sum)
    }
    val bySorted = naive(ts.sortBy(d => (-d._2, d._1)).map(_._2).toSeq)
    val byArrival = naive(ts.sortBy(_._1).map(_._2).toSeq)
    val got = Curation.paddingAudit(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert((got("sorted")._1, got("sorted")._2, got("sorted")._3)
      === bySorted)
    assert((got("arrival")._1, got("arrival")._2, got("arrival")._3)
      === byArrival)
    assert(got("sorted")._4 < got("arrival")._4,
      "sorted batching should waste strictly less padding")
  }

  test("dataset_card: every statistic matches a driver-side recompute") {
    val docs = Tables.t(spark, dir, "documents")
      .selectExpr("lang", "source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 Option(r.getString(3))))
    val n = docs.length.toDouble
    val got = Curation.datasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_docs") === n)
    assert(got("n_langs") === docs.map(_._1).distinct.length.toDouble)
    assert(got("n_sources") === docs.map(_._2).distinct.length.toDouble)
    assert(got("total_chars") === docs.map(_._3).sum.toDouble)
    assert(math.abs(got("mean_chars") - docs.map(_._3).sum / n) < 1e-3)
    val blanks = docs.count(d => d._4.forall(_.trim.isEmpty))
    assert(got("blank_frac") === BigDecimal(blanks / n + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val distinctTexts = docs.map(_._4.getOrElse("")).distinct.length
    assert(math.abs(got("distinct_text_frac") - distinctTexts / n) < 1e-5)
    val ent = -docs.groupBy(_._1).values
      .map(g => g.length / n * math.log(g.length / n)).sum
    assert(math.abs(got("lang_entropy") - ent) < 1e-5)
    assert(got.keySet.size === 9)
  }

  test("negative_pairs: every pair matches the modular-stride recompute, " +
       "no self-pairs, anchors cover the corpus") {
    val langs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = langs.size.toLong
    val want = (for {
      id <- langs.keys.toSeq; j <- 1 to 3
      neg = (id + j * 7919L) % n if neg != id
    } yield (id, j, neg, langs(id) == langs(neg))).toSet
    val got = Curation.negativePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === want)
    assert(got.map(_._1) === langs.keySet) // every anchor kept >= 1 pair
  }

  test("source_temperature: weights normalize, alpha<1 provably flattens " +
       "(small sources gain share, large sources lose it)") {
    val rows = Curation.sourceTemperature(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
                 r.getDouble(3), r.getLong(4)))
    val total = Tables.t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum === total)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    // temperature flattening: any source below the mean share gets
    // boosted (p_temp > p_raw), any above it gets shaved
    val meanShare = 1.0 / rows.length
    rows.foreach { case (src, _, praw, ptemp, exp) =>
      if (praw < meanShare * 0.9)
        assert(ptemp > praw, s"$src: small source not boosted")
      if (praw > meanShare * 1.1)
        assert(ptemp < praw, s"$src: large source not shaved")
      assert(math.abs(exp - ptemp * 10000) <= 0.5 + 1e-6)
    }
  }

  test("zorder_layout: both layouts partition all orders; z-order bounds " +
       "BOTH dims' spans while bydate leaves customers unclustered") {
    val rows = Curation.zorderLayout(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(7), r.getLong(8))) // layout, file, n, c_span, d_span
    val n = Tables.t(spark, dir, "orders").count()
    for (layout <- Seq("zorder", "bydate"))
      assert(rows.filter(_._1 == layout).map(_._3).sum === n, layout)
    val zf = rows.filter(_._1 == "zorder")
    val df = rows.filter(_._1 == "bydate")
    // 16 z-files fix the top 4 interleaved bits (c7 d7 c6 d6): each file
    // spans <= 64 of 256 on EVERY dimension
    assert(zf.forall(f => f._4 <= 64 && f._5 <= 64),
      s"zorder spans: ${zf.map(f => (f._4, f._5)).toSeq}")
    // a date sort prunes dates hard but leaves customer zone maps useless
    assert(df.forall(_._5 <= 16))
    assert(df.map(_._4).max > 64,
      "bydate c_span unexpectedly bounded — fixture too small to matter?")
  }

  test("group_split: doc-hash leaks the planted near-dup cluster, " +
       "cluster-hash never does; tallies match a naive recompute") {
    // Same planting doctrine as DedupSpec: 0/1 exact dups, 5/6 near-dups
    // of the same base — one multi-doc cluster whose member ids hash to
    // DIFFERENT splits (0→test, 1→val, 5/6→train), so the doc_hash
    // strategy demonstrably leaks it while cluster_hash sends the whole
    // family to the label's split.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d = docsDir(Seq(
      (0L, base, "en", "s"),
      (1L, base, "en", "s"),
      (2L, "one two three four five six seven eight nine ten", "en", "s"),
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "s"),
      (4L, "un deux trois quatre cinq six sept huit neuf", "fr", "s"),
      (5L, base + " omega", "en", "s"),
      (6L, base.replace("delta", "DELTA") + " omega", "en", "s")))
    val out = Curation.groupSplit(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    // mass conservation: each strategy accounts for every document
    for (s <- Seq("doc_hash", "cluster_hash"))
      assert(out.filter(_._1 == s).map(_._3).sum === 7L, s)
    // naive recompute from the same staged labels the operator read
    val labels = graft.ops.Dedup.stagedLabels(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def sp(k: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"gsplit42|$k".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val strat = Map[String, ((Long, Long)) => String](
      "doc_hash" -> (dc => sp(dc._1)),
      "cluster_hash" -> (dc => sp(dc._2)))
    val expect = (for ((sName, f) <- strat.toSeq) yield {
      val leaked = labels.groupBy(_._2).values
        .count(ms => ms.map(f).distinct.size > 1).toLong
      labels.groupBy(f).toSeq.map { case (split, ms) =>
        (sName, split, ms.size.toLong,
         ms.map(_._2).distinct.size.toLong, leaked)
      }
    }).flatten.sortBy(t => (t._1, t._2))
    assert(out.sortBy(t => (t._1, t._2)).toSeq === expect)
    // the planted cluster straddles splits under doc_hash only
    val leakOf = out.map(t => t._1 -> t._5).toMap
    assert(leakOf("doc_hash") >= 1L)
    assert(leakOf("cluster_hash") === 0L)
  }

  test("split_leakage: the planted TAINTED straddler is caught under " +
       "doc_hash and provably absent under cluster_hash") {
    // group_split's planting doctrine with the taint turned on: doc 0
    // (id%50==0) is the BENCHMARK, so the near-dup family {0,1,5,6} is
    // taint-positive, and its member ids hash to different splits
    // (0→test, 1→val, 5/6→train) — the exact eval-leakage event the
    // audit exists to count. Docs 2/3/4 are clean singleton controls.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d = docsDir(Seq(
      (0L, base, "en", "s"),
      (1L, base, "en", "s"),
      (2L, "one two three four five six seven eight nine ten", "en", "s"),
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "s"),
      (4L, "un deux trois quatre cinq six sept huit neuf", "fr", "s"),
      (5L, base + " omega", "en", "s"),
      (6L, base.replace("delta", "DELTA") + " omega", "en", "s")))
    // pin the construction: the exact dups 0/1 must co-cluster, and
    // their splits differ under doc_hash (0→test, 1→val) — a tainted
    // straddler exists whatever the banding does with 5/6
    val labels = graft.ops.Dedup.stagedLabels(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(0L) === labels(1L),
      "fixture drift: exact dups 0/1 no longer co-cluster")
    // naive recompute from the same staged labels + a hand taint rule
    val texts = Map(0L -> base, 1L -> base,
      2L -> "one two three four five six seven eight nine ten",
      3L -> "uno dos tres cuatro cinco seis siete ocho nueve",
      4L -> "un deux trois quatre cinq six sept huit neuf",
      5L -> (base + " omega"),
      6L -> (base.replace("delta", "DELTA") + " omega"))
    def grams(t: String): Set[String] =
      t.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val benchGrams = grams(texts(0L))
    val tainted: Set[Long] = labels.groupBy(_._2).collect {
      case (cid, ms) if ms.keys.exists(id =>
        id % 50 == 0 || grams(texts(id)).intersect(benchGrams).nonEmpty)
        => cid
    }.toSet
    def sp(k: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"gsplit42|$k".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val strat = Map[String, ((Long, Long)) => String](
      "doc_hash" -> (dc => sp(dc._1)),
      "cluster_hash" -> (dc => sp(dc._2)))
    val expect = strat.toSeq.map { case (sName, f) =>
      val byCluster = labels.toSeq.groupBy(_._2)
      val straddling = byCluster.filter(_._2.map(f).distinct.size > 1).keySet
      (sName, byCluster.size.toLong, straddling.size.toLong,
       tainted.size.toLong, straddling.intersect(tainted).size.toLong)
    }.sortBy(_._1)
    val out = Curation.splitLeakage(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(out === expect)
    // the audit headline: the planted tainted straddler is counted under
    // doc_hash and structurally impossible under cluster_hash
    val headline = out.map(t => t._1 -> t._5).toMap
    assert(headline("doc_hash") >= 1L)
    assert(headline("cluster_hash") === 0L)
  }

  test("decontam_closure: removes the whole tainted cluster — including " +
       "a near-dup that shares no gram with the benchmark") {
    // doc 0 (id%50==0) is the benchmark. doc 1 = bench head + unique
    // tail → direct gram hit. doc 2 = DIFFERENT head + same tail →
    // shares zero 3-grams with doc 0 (every bench window is broken) but
    // is a near-dup of doc 1 through the shared tail: only the cluster
    // closure catches it. docs 3,4: clean controls in another source.
    val tail = (1 to 20).map(i => s"t$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s"),
      (1L, "alpha beta gamma delta epsilon " + tail, "en", "s"),
      (2L, "zeta eta theta iota kappa " + tail, "en", "s"),
      (3L, "one two three four five six seven", "en", "sB"),
      (4L, "uno dos tres cuatro cinco seis", "es", "sB")))
    // the construction only demonstrates closure if 1/2 actually band
    // into one cluster — pin that before trusting the output
    val labels = graft.ops.Dedup.stagedLabels(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === labels(2L),
      "fixture drift: docs 1/2 no longer near-dups — lengthen the tail")
    val out = Curation.decontamClosure(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    // source s: train docs 1,2 — 1 direct, 2 closure-extra, none kept;
    // source sB: both clean
    assert(out === Seq(
      ("s", 2L, 1L, 2L, 1L, 0L),
      ("sB", 2L, 0L, 0L, 0L, 2L)))
  }

  test("novelty_curve: first-seen gram fractions match hand-computed " +
       "values on a fixture with known overlaps") {
    // doc 0: grams {a b c, b c d}            → 2 novel / 2
    // doc 1: grams {a b c, b c e}            → 1 novel / 2 (abc seen)
    // doc 2: grams {a b c, b c d}            → 0 novel / 2 (all seen)
    // doc 3: grams {x y z, y z w}            → 2 novel / 2 (fresh text)
    // N = 4 → bins: floor(id*10/4) = 0, 2, 5, 7
    val d = docsDir(Seq(
      (0L, "a b c d", "en", "s"),
      (1L, "a b c e", "en", "s"),
      (2L, "a b c d", "en", "s"),
      (3L, "x y z w", "en", "s")))
    val out = Curation.noveltyCurve(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4))).toSeq
    assert(out === Seq(
      (0L, 1L, 2L, 2L, 1.0),
      (2L, 1L, 2L, 1L, 0.5),
      (5L, 1L, 2L, 0L, 0.0),
      (7L, 1L, 2L, 2L, 1.0)))
  }

  test("calibration_ece: bins conserve the corpus, each gap recomputes " +
       "from its own row, and ece is the n-weighted gap mean") {
    val rows = Curation.calibrationEce(spark, dir).collect()
    val nDocs = Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "bin conservation")
    val bins = rows.map(_.getLong(0)).toSeq
    assert(bins === bins.sorted && bins.forall(b => b >= 0 && b <= 9))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) -
        math.abs(r.getDouble(2) - r.getDouble(3))) < 2e-6, "abs_gap")
    }
    val ece = rows.map(r => r.getLong(1) * r.getDouble(4)).sum /
      rows.map(_.getLong(1)).sum
    rows.foreach(r => assert(math.abs(r.getDouble(5) - ece) < 2e-6, "ece"))
  }

  test("kappa_agreement: po/pe/kappa recompute from the two judges' " +
       "outputs; a no-variation fixture reports kappa 0 by convention") {
    val r = Curation.kappaAgreement(spark, dir).collect().head
    val keep = Curation.qualityEnsemble(spark, dir)
      .select(col("doc_id"), col("keep")).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val lenJ = Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("n_chars") >= 400).as("b")).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val n = keep.size.toLong
    val agree = keep.count { case (id, a) => lenJ(id) == a }.toLong
    val peNum = Seq(true, false).map(v =>
      keep.values.count(_ == v).toLong * lenJ.values.count(_ == v)).sum
    val po = agree.toDouble / n
    val pe = peNum.toDouble / (n * n)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === agree)
    assert(math.abs(r.getDouble(2) - po) < 1e-6)
    assert(math.abs(r.getDouble(3) - pe) < 1e-6)
    assert(math.abs(r.getDouble(4) - (po - pe) / (1 - pe)) < 1e-6)

    val degDir = TestFixtures.writeDir(Map(
      "documents" -> Seq(
        (1L, "tiny text", "en", "web", 9L),
        (2L, "also tiny", "en", "web", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")))
    val dr = Curation.kappaAgreement(spark, degDir).collect().head
    assert(dr.getDouble(3) === 1.0, "degenerate pe")
    assert(dr.getDouble(4) === 0.0, "degenerate kappa convention")
  }

  test("curriculum_schedule: tiers reproduce a naive ANSI NTILE over " +
       "(n_toks, doc_id), and tier length ranges are non-overlapping " +
       "and ascending") {
    val toks = Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), "\\s+")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
      .sortBy { case (id, n) => (n, id) }
    val n = toks.length
    val q = n / 4; val r = n % 4
    val tierOf = (rank: Int) => // ANSI NTILE: first r tiers get q+1 rows
      if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
      else r + (rank - 1 - r * (q + 1)) / q + 1
    val naive = toks.zipWithIndex
      .map { case ((_, nt), i) => (tierOf(i + 1).toLong, nt) }
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum,
                       v.map(_._2).min, v.map(_._2).max)).toMap
    val rows = Curation.curriculumSchedule(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    rows.foreach { row =>
      val (nd, tt, mn, mx) = naive(row.getLong(0))
      assert(row.getLong(1) === nd, s"tier ${row.getLong(0)} size")
      assert(row.getLong(2) === tt, s"tier ${row.getLong(0)} tokens")
      assert(row.getLong(3) === mn)
      assert(row.getLong(4) === mx)
    }
    // short-to-long curriculum: rank order makes token counts
    // non-decreasing across tiers, so ranges may touch but never invert
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) <= b.getLong(3), "tier ranges must ascend")
    }
  }

  test("seqlen_budget: exact naive recompute per budget, and coverage " +
       "fractions are monotone in the budget") {
    val toks = Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), "\\s+"))).collect()
      .map(_.getInt(0).toLong)
    val rows = Curation.seqlenBudget(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(32L, 64L, 128L, 256L))
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) === toks.count(_ <= b).toLong, s"fit@$b")
      assert(r.getLong(2) === toks.map(math.min(_, b)).sum, s"kept@$b")
    }
    val fd = rows.map(_.getDouble(3)).toSeq
    val ft = rows.map(_.getDouble(4)).toSeq
    assert(fd === fd.sorted && ft === ft.sorted, "monotone coverage")
  }

  test("quality_tradeoff: the curve conserves the scoreable corpus, " +
       "cumulates monotonically from the strictest bin, and its token " +
       "masses reconcile with the per-doc lm scores") {
    val scores = Curation.lmScore(spark, dir).collect()
      .map(r => r.getLong(0)).toSet
    val tokTotal = Tables.t(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .collect().collect {
        case r if scores(r.getLong(0)) =>
          r.getString(1).split("\\s+").length.toLong
      }.sum
    val rows = Curation.qualityTradeoff(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (0L until rows.length),
      "bins are dense from 0")
    assert(rows.map(_.getLong(2)).sum === scores.size.toLong,
      "every scoreable doc lands in exactly one bin")
    assert(rows.map(_.getLong(3)).sum === tokTotal,
      "token mass conserves against the raw fixture")
    val bin0 = rows.head
    assert(bin0.getLong(4) === scores.size.toLong &&
           math.abs(bin0.getDouble(6) - 1.0) < 1e-9,
      "keeping every bin keeps the whole corpus")
    val kept = rows.map(_.getLong(4))
    kept.zip(kept.tail).foreach { case (a, b) =>
      assert(a > b, "stricter thresholds keep strictly fewer docs") }
    // floors ascend: a higher bin holds better-scored documents
    val floors = rows.map(_.getDouble(1))
    floors.zip(floors.tail).foreach { case (a, b) => assert(a < b) }
  }

  test("epoch_plan: budget conservation on the real fixture; a planted " +
       "skewed corpus drives the tiny source into the 4-epoch cap") {
    // real fixture: near-uniform sources, nobody capped, epochs ≈ 2
    val rows = Curation.epochPlan(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, target, epochs, planned, capped) =
        (r.getLong(2), r.getLong(4), r.getDouble(5), r.getLong(6),
         r.getBoolean(7))
      assert(epochs <= 4.0 && epochs > 0.0)
      assert(planned <= target && planned <= nTok * 4)
      if (!capped) assert(planned === target,
        "uncapped sources take their full temperature share")
    }
    // targets distribute ~the whole 2× budget (floor rounding slack only)
    val totTok = rows.map(_.getLong(2)).sum
    val totTarget = rows.map(_.getLong(4)).sum
    assert(math.abs(totTarget - 2L * totTok) <= rows.length,
      "temperature shares must partition the 2× token budget")

    // planted skew: the tiny source's temperature share exceeds 4 epochs
    // of its own data → capped, planned = 4× available
    val sdir = TestFixtures.writeDir(Map(
      "documents" -> ((0 until 40).map(i =>
        (i.toLong, Seq.fill(50)(s"w$i").mkString(" "), "en", "big")) :+
        (40L, "tiny doc here", "en", "small"))
        .toDF("doc_id", "text", "lang", "source")))
    val skew = Curation.epochPlan(spark, sdir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(skew("small").getBoolean(7), "tiny source must hit the cap")
    assert(skew("small").getDouble(5) === 4.0)
    assert(skew("small").getLong(6) === skew("small").getLong(2) * 4)
    assert(!skew("big").getBoolean(7))
  }
}
