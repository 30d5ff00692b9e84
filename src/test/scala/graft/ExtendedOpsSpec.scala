package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Dedup, Events, Multimodal, Panel, Relational}

/** Round-2 operator families on the real sf0.001 fixtures: corpus
  * retrieval/curation (Corpus), near-dup clustering (Dedup), grouping
  * sets / ranking windows / snapshot diff (Relational), retention and
  * funnel (Events). */
class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("heavy_hitters: the CMS prefilter never changes the answer — " +
       "result equals the plain exact aggregate, and the sketch never " +
       "under-counts") {
    import spark.implicits._
    val out = Corpus.cmsHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // independent exact recompute without any sketch
    val docs = graft.Tables.t(spark, dir, "documents")
      .filter($"text".isNotNull).select($"text").as[String].collect()
    val exact = docs.toSeq.flatMap(_.split("\\s+").toSeq.sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 32L).toMap
    assert(out === exact, "sketch-pruned != exact heavy hitters")
    // over-estimate property on a planted fixture: a gram at the floor
    // survives, one below it is cut by the EXACT count even when the
    // sketch lets it through
    val planted = TestFixtures.writeDir(Map("documents" ->
      (Seq.fill(32)((1L, "aa bb", "en", "s")) ++
       Seq.fill(31)((2L, "cc dd", "en", "s")))
        .zipWithIndex.map { case ((_, t, l, s), i) => (i.toLong, t, l, s) }
        .toDF("doc_id", "text", "lang", "source")))
    val pl = Corpus.cmsHeavyHitters(spark, planted).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pl === Map("aa bb" -> 32L),
      "exactly the at-floor gram survives; 31 < 32 is cut")
  }

  test("zipf_slope: naive OLS recompute over the rank-frequency head; " +
       "a planted geometric series fits with high r2 and negative slope") {
    import spark.implicits._
    // counts 16/8/4/2/1 → ln-ln nearly linear, slope < 0
    val text = (Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(2)("dd") ++ Seq("ee")).mkString(" ")
    val d = TestFixtures.writeDir(Map("documents" ->
      Seq((0L, text, "en", "s")).toDF("doc_id", "text", "lang", "source")))
    val Array(row) = Corpus.zipfSlope(spark, d).collect()
    val pts = Seq(16, 8, 4, 2, 1).zipWithIndex.map { case (c, i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    def r4(x: Double) = BigDecimal(x + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getLong(0) === 5L)
    assert(row.getDouble(1) === r4(slope))
    assert(row.getDouble(2) === r4((sy - slope * sx) / n))
    assert(row.getDouble(3) === r4(
      (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))))
    assert(row.getDouble(1) < 0, "rank-frequency slope must be negative")
    assert(row.getDouble(3) > 0.9,
      "a geometric series is near-log-linear (exact r2 pinned above)")
  }

  test("vocab_coverage: planted 70-term vocab — the 64 budget covers " +
       "exactly the top-64 occurrence mass, larger budgets cover all") {
    import spark.implicits._
    // term i (1..70) appears (71 - i) times → total = 70*71/2 = 2485;
    // top-64 misses terms 65..70 = counts 6+5+4+3+2+1 = 21
    val text = (1 to 70).flatMap(i =>
      Seq.fill(71 - i)(f"t$i%02d")).mkString(" ")
    val d = TestFixtures.writeDir(Map("documents" ->
      Seq((0L, text, "en", "s")).toDF("doc_id", "text", "lang", "source")))
    val rows = Corpus.vocabCoverage(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(64L) === ((64L, 2485L - 21L, 2485L,
      BigDecimal(2464.0 / 2485 + 1e-9).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows(256L) === ((70L, 2485L, 2485L, 1.0)))
    assert(rows(1024L) === ((70L, 2485L, 2485L, 1.0)))
  }

  test("tfidf_topterms: exactly 3 terms per doc, scores non-increasing") {
    val rows = Corpus.tfidfTopTerms(spark, dir).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length == 3))
    perDoc.values.foreach { g =>
      val scores = g.map(_.getDouble(2)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("bm25_topk: 20 rows, scores strictly ordered desc with id tiebreak") {
    val rows = Corpus.bm25TopK(spark, dir).collect()
    assert(rows.length === 20)
    val pairs = rows.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(pairs === pairs.sorted)
  }

  test("inverted_index df agrees with an independent distinct count") {
    val idx = Corpus.invertedIndex(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.t(spark, dir, "documents")
      .select(explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx === expected)
  }

  test("stratified_sample is deterministic and a ~20% subset") {
    val a = Corpus.stratifiedSample(spark, dir).collect().map(_.getLong(0))
    val b = Corpus.stratifiedSample(spark, dir).collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq)
    val total = Tables.t(spark, dir, "documents").count()
    assert(a.length > total * 0.08 && a.length < total * 0.35)
  }

  test("quantile_filter keeps only docs at/above their lang median") {
    val kept = Corpus.quantileFilter(spark, dir).collect()
    assert(kept.forall(r => r.getLong(2) >= r.getDouble(3) - 0.5))
    // median cut keeps at least half of each stratum's upper tail
    val perLang = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val totals = Tables.t(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (l, n) => assert(n >= totals(l) / 2) }
  }

  test("dedup_clusters: labels are component minima, transitive, canonical-marked") {
    val labels = Dedup.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every edge's endpoints share a label, and labels point at cluster minima
    pairs.foreach { case (a, b) => assert(labels(a) === labels(b)) }
    labels.foreach { case (id, c) => assert(c <= id && labels(c) === c) }
    val canon = Dedup.dedupClusters(spark, dir).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(canon === labels.values.toSet)
  }

  test("dedup_clusters: GraphX Pregel and the DataFrame loop agree exactly") {
    val a = Dedup.dedupClusters(spark, dir).collect().toSeq
    val b = Dedup.dedupClustersDF(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("cube_agg: grand-total row equals table count; 4 grouping ids") {
    val rows = Relational.cubeAgg(spark, dir).collect()
    val total = Tables.t(spark, dir, "lineitem").count()
    assert(rows.map(_.getInt(2)).toSet === Set(0, 1, 2, 3))
    val grand = rows.filter(_.getInt(2) == 3)
    assert(grand.length === 1 && grand.head.getLong(3) === total)
    // each grouping set partitions the same rows
    Seq(0, 1, 2).foreach { gid =>
      assert(rows.filter(_.getInt(2) == gid).map(_.getLong(3)).sum === total)
    }
  }

  test("window_rank: row_number is a permutation per customer; ranks bounded") {
    val rows = Relational.windowRank(spark, dir).collect()
    rows.groupBy(_.getLong(1)).values.foreach { g =>
      val rns = g.map(_.getLong(5)).sorted
      assert(rns.toSeq === (1L to g.length.toLong))
      assert(g.forall(r => r.getLong(2) <= g.length && r.getLong(3) <= g.length))
    }
  }

  test("snapshot_diff classes are consistent with their null pattern") {
    val rows = Relational.snapshotDiff(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (r.getString(1): @unchecked) match {
        case "added"   => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "removed" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "changed" =>
          assert(math.abs(r.getDouble(3) - r.getDouble(2) - 1000.0) < 1e-6)
      }
    }
  }

  test("events_retention: offsets non-negative; day-0 covers every cohort user") {
    val rows = Events.retentionCohort(spark, dir).collect()
    assert(rows.forall(_.getLong(1) >= 0))
    val day0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getDate(0) -> r.getLong(2)).toMap
    val cohortSizes = Tables.t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id").agg(min("d").as("cohort"))
      .groupBy("cohort").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getDate(0) -> r.getLong(1)).toMap
    assert(day0 === cohortSizes)
  }

  test("panel_fill: every gap is filled with the last prior observation") {
    val rows = ops.Panel.panelFill(spark, dir).collect()
    val byKey = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getDouble(2), r.getBoolean(3))).toMap
    // spine is dense per entity
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val ys = g.map(_.getLong(1)).sorted
      assert(ys.toSeq === (ys.min to ys.max))
    }
    // a filled row repeats the previous year's value
    rows.filter(_.getBoolean(3)).foreach { r =>
      val prev = byKey((r.getLong(0), r.getLong(1) - 1))
      assert(r.getDouble(2) === prev._1)
    }
    assert(rows.exists(_.getBoolean(3)), "fixture must contain gaps")
  }

  test("panel_growth: first row per entity has null growth; corr in [-1,1] " +
       "with the min-periods-3 guard") {
    val rows = ops.Panel.panelGrowth(spark, dir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.head.isNullAt(2))          // no prior year → no growth
      assert(sorted.take(2).forall(_.isNullAt(3))) // corr needs ≥ 3 rows
      sorted.drop(2).foreach { r =>
        if (!r.isNullAt(3))
          assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-6)
      }
    }
  }

  test("source_cap: <= 15 docs per source, ranked by n_chars desc with " +
       "doc_id tiebreak, members == window top-15") {
    val rows = Corpus.sourceCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perSrc = rows.groupBy(_._1)
    assert(perSrc.values.forall(_.length <= 15))
    perSrc.values.foreach { g =>
      val ordered = g.sortBy(_._4)
      // rank order == (n_chars desc, doc_id asc) order
      assert(ordered.map(t => (-t._3, t._2)).toSeq ===
        ordered.map(t => (-t._3, t._2)).toSeq.sorted)
    }
    // cross-check membership against an independent window ranking
    val docs = Tables.t(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).valuesIterator.flatMap { g =>
      g.sortBy(t => (-t._3, t._2)).take(15).iterator
    }.map(t => (t._1, t._2)).toSet
    assert(rows.map(t => (t._1, t._2)).toSet === expect)
  }

  test("mixture_sample: kept set == per-class md5-threshold rule " +
       "recomputed independently; class-0 sources keep everything") {
    val kept = Corpus.mixtureSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex2(s: String): String = md.synchronized {
      md.reset()
      md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    }
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val thr = Map(0 -> "g", 1 -> "80", 2 -> "40", 3 -> "1a")
    val expect = docs.filter { case (id, src) =>
      val cls = src.drop(3).toInt % 4
      hex2(s"$src|$id") < thr(cls)
    }.map(_._1).toSet
    assert(kept.keySet === expect)
    // class 0 retains every document of its sources
    val cls0 = docs.filter { case (_, s) => s.drop(3).toInt % 4 == 0 }
    assert(cls0.forall { case (id, _) => kept.contains(id) })
    assert(kept.nonEmpty && kept.size < docs.length)
  }

  test("events_range_frame: trailing-1h counts/sums match a naive " +
       "recomputation per user") {
    val out = Events.rangeFrame(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.size === ev.length)
    ev.groupBy(_._2).values.foreach { g =>
      g.foreach { case (eid, _, us, _) =>
        val frame = g.filter(e => e._3 >= us - 3600000000L && e._3 <= us)
        val vals = frame.flatMap(_._4)
        val want = (frame.length.toLong,
          if (vals.isEmpty) None
          else Some(math.rint((vals.sum + 1e-9) * 1e4) / 1e4))
        val got = out(eid)
        assert(got._1 === want._1, s"event $eid count")
        (got._2, want._2) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6,
            s"event $eid sum: $a vs $b")
          case (a, b) => assert(a === b, s"event $eid sum null-ness")
        }
      }
    }
  }

  test("events_funnel: stage counts are monotonically non-increasing") {
    val users = Events.funnelStages(spark, dir).collect().map(_.getLong(1))
    assert(users.length === 4)
    assert(users.toSeq === users.sorted.reverse)
  }

  test("corpus_curate is the exact intersection of its four stage filters") {
    val out = Corpus.curate(spark, dir).collect().map(_.getLong(0)).toSet
    val ex = Dedup.exact(spark, dir).collect().map(_.getLong(0)).toSet
    val canon = Dedup.dedupClusters(spark, dir).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val q = Corpus.quantileFilter(spark, dir).collect().map(_.getLong(0)).toSet
    val s = Corpus.stratifiedSample(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(out === (ex & canon & q & s))
    assert(out.nonEmpty && out.size < s.size)
  }

  test("approx_sketch estimates stay within bounds of their exact twins") {
    // The query now carries its own bound checks as columns (the oracle
    // expects both booleans TRUE); assert them here too so a drift fails
    // with a named message rather than an opaque hash diff, and pin the
    // exact columns against an independently-computed twin.
    val rows = Relational.approxSketches(spark, dir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"),
           expr("round(percentile(l_extendedprice, 0.5) + 1e-9, 6)")
             .as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getBoolean(2), s"$k: nd_approx outside 15% of nd_exact")
      assert(r.getBoolean(4), s"$k: p50_approx outside exact p45..p55")
      assert(r.getLong(1) === exact(k)._1, s"$k: nd_exact mismatch")
      assert(r.getDouble(3) === exact(k)._2, s"$k: p50_exact mismatch")
    }
  }

  test("skew_join: salted execution == plain unsalted join, row for row") {
    val salted = Events.skewJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    val e = Tables.events(spark, dir)
    val dim = e.groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("user_total"),
           count(lit(1)).as("user_events"))
    val plain = e.select(col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .join(dim, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), col("user_total"), col("user_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    assert(salted === plain)
  }

  test("mm_chunks: window boundaries, tail length, and fingerprints " +
       "on a hand-sized payload") {
    import spark.implicits._
    val text = "x" * 64 + "y" * 64 + "zz" // 130 chars → 64, 64, 2
    val cdir = TestFixtures.writeDir(Map(
      "documents" -> Seq((0L, text, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")))
    val rows = graft.ops.Multimodal.chunks(spark, cdir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.toSeq === Seq(
      (0L, 64L, m("x" * 64)), (1L, 64L, m("y" * 64)), (2L, 2L, m("zz"))))
  }

  test("panel_islands: islands tile each supplier's year set with gaps " +
       "between them") {
    val islands = Panel.panelIslands(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val years = Tables.t(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("long"),
              year(col("l_shipdate")).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    islands.groupBy(_._1).foreach { case (supp, runs) =>
      // each island is a dense run, islands are disjoint with real gaps,
      // and together they cover exactly the supplier's year set
      val sorted = runs.sortBy(_._2)
      sorted.foreach { case (_, s, e, len) => assert(e - s + 1 === len) }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
      val covered = sorted.flatMap { case (_, s, e, _) => s to e }.toSet
      assert(covered === years(supp))
    }
  }

  test("colloc_lift: counts and lift agree with an independent recompute") {
    val rows = Corpus.collocLift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getDouble(3)))
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet)
    val n = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    rows.foreach { case (t1, t2, cab, lift) =>
      assert(t1 < t2)
      val want = docs.count { case (_, ts) => ts(t1) && ts(t2) }
      assert(cab === want, s"pair ($t1,$t2)")
      assert(cab >= 5)
      val wantLift = BigDecimal(cab * n / (df(t1) * df(t2)).toDouble + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lift - wantLift) < 1e-9, s"lift ($t1,$t2)")
    }
  }

  test("mm_dedup: groups conserve docs, canonical is the min id, unique " +
       "payloads reclaim nothing") {
    val rows = Multimodal.payloadDedup(spark, dir).collect()
    val nDocs = Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum === nDocs)
    rows.filter(_.getLong(2) == 1L)
      .foreach(r => assert(r.getDouble(4) === 0.0))
    // planted duplicate group: 3 copies of an 11-byte payload collapse
    // to the min doc_id, reclaiming 2/3 of the group bytes
    import spark.implicits._
    val pdir = TestFixtures.writeDir(Map(
      "documents" -> Seq(
        (7L, "same bytes!", "en", "web"),
        (3L, "same bytes!", "en", "web"),
        (5L, "same bytes!", "fr", "web"),
        (9L, "unique text", "en", "web"))
        .toDF("doc_id", "text", "lang", "source")))
    val planted = Multimodal.payloadDedup(spark, pdir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
                                 r.getDouble(4))).toMap
    assert(planted(3L) === ((3L, 33L, 22.0)))
    assert(planted(9L) === ((1L, 11L, 0.0)))
  }

  test("mm_shared_segments: planted aligned shared chunk counts once " +
       "per holder; a within-doc repeat alone does not count") {
    import spark.implicits._
    val block = "x" * 64            // one exact chunk-aligned window
    val other = "y" * 64
    val pdir = TestFixtures.writeDir(Map(
      "documents" -> Seq(
        (1L, block + "tail one", "en", "web"),   // shares chunk0 with 2
        (2L, block + "tail twooo", "en", "web"),
        (3L, "unique text here", "en", "web"),   // nothing shared
        (4L, other + other, "en", "web"))        // self-repeat only
        .toDF("doc_id", "text", "lang", "source")))
    val r = Multimodal.sharedSegments(spark, pdir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) === ((2L, 1L, 0.5)))
    assert(r(2L) === ((2L, 1L, 0.5)))
    assert(r(3L) === ((1L, 0L, 0.0)))
    assert(r(4L) === ((2L, 0L, 0.0)), "within-doc repeats must not count")
  }

  test("rfm_segments: quintiles balanced, recency anchored at corpus max") {
    val rows = Relational.rfmSegments(spark, dir).collect()
    val n = rows.length
    Seq(4, 5, 6).foreach { i =>
      val counts = rows.groupBy(_.getLong(i)).view.mapValues(_.size)
      assert(counts.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // NTILE sizes differ by at most 1
      assert(counts.values.max - counts.values.min <= 1,
        s"col $i unbalanced: $counts")
    }
    assert(rows.exists(_.getLong(1) == 0L),
      "the customer holding the anchor order has recency 0")
    assert(rows.length === Tables.t(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count())
    assert(n > 0)
  }

  test("pareto_suppliers: cumulative share is monotone and ends at 1") {
    val rows = Relational.paretoSuppliers(spark, dir).collect()
      .sortBy(_.getLong(2))
    val shares = rows.map(_.getDouble(3)).toSeq
    assert(shares === shares.sorted)
    assert(math.abs(shares.last - 1.0) < 1e-4)
    val revs = rows.map(_.getDouble(1)).toSeq
    assert(revs === revs.sorted.reverse)
    rows.foreach(r => assert(r.getBoolean(4) === (r.getDouble(3) <= 0.8)))
  }

  test("gap_detect reports exactly the planted missing hour") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val gdir = TestFixtures.writeDir(Map(
      "events" -> Seq(
        (1L, ts("2024-01-01 10:15:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 12:45:00"), 1L, "click", 1.0, "{}"),
        (3L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
    val gaps = graft.ops.Events.gapDetect(spark, gdir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    assert(gaps.toSeq === Seq(("click", ts("2024-01-01 11:00:00"))))
  }

  test("mm_frames5050: 50%-overlap framing — consecutive full frames " +
       "share their halves") {
    import spark.implicits._
    val fdir = TestFixtures.writeDir(Map(
      "documents" -> Seq((1L, "ab" * 80, "en", "web")) // 160 chars
        .toDF("doc_id", "text", "lang", "source")))
    val frames = graft.ops.Multimodal.frames5050(spark, fdir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 160 chars, hop 32 → 5 frames at offsets 0,32,64,96,128; the last
    // runs short (32 chars), the one before ends exactly at the payload
    assert(frames.map(f => (f._1, f._2)).toSeq ===
      Seq((0L, 0L), (1L, 32L), (2L, 64L), (3L, 96L), (4L, 128L)))
    assert(frames.map(_._3).toSeq === Seq(64L, 64L, 64L, 64L, 32L))
    val text = "ab" * 80
    val full = graft.ops.Multimodal.frames5050(spark, fdir)
      .collect().map(_.getString(4))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    frames.indices.foreach { i =>
      val off = (i * 32).toInt
      assert(full(i) === m(text.slice(off, off + 64)))
    }
  }

  test("orders_open: backlog starts positive, never dips negative, and " +
       "drains to zero") {
    val rows = Relational.ordersOpen(spark, dir).collect()
    assert(rows.head.getLong(3) > 0L)
    rows.foreach(r => assert(r.getLong(3) >= 0L))
    assert(rows.last.getLong(3) === 0L,
      "every joined order opens and later closes")
    val joined = Tables.t(spark, dir, "orders").join(
      Tables.t(spark, dir, "lineitem"),
      col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(rows.map(_.getLong(1)).sum === joined)
    assert(rows.map(_.getLong(2)).sum === joined)
  }

  test("global_sample: exactly 100 rows, deterministic, a subset of the " +
       "corpus") {
    val a = Corpus.globalSample(spark, dir).collect().map(_.getLong(0))
    val b = Corpus.globalSample(spark, dir).collect().map(_.getLong(0))
    assert(a.length === 100)
    assert(a.toSeq === b.toSeq)
    val ids = Tables.t(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a.forall(ids))
  }

  test("skyline equals the brute-force all-pairs dominance recompute") {
    val u = Tables.t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .selectExpr("o_orderkey", "o_totalprice",
                  "CAST(o_orderdate AS STRING)") // NTZ: ISO strings compare
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val want = u.filter { case (_, p, d) =>
      !u.exists { case (_, p2, d2) =>
        p2 <= p && d2 >= d && (p2 < p || d2 > d) }
    }.map(_._1).toSet
    val got = Relational.skyline(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("readability: hand-computed Flesch on a two-sentence doc; " +
       "vowel-less words clamp to one syllable; empty text yields NULL") {
    import spark.implicits._
    val fx = TestFixtures.writeDir(Map("documents" -> Seq(
      (1L, "The cat sat. It ran fast!", "en", "web"),
      (2L, "7 tst", "en", "web"),
      (3L, "", "en", "web")).toDF("doc_id", "text", "lang", "source")))
    val rows = graft.ops.Text.readability(spark, fx).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // 6 words, 2 sentences, 6 single-vowel-run syllables:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(rows(1L) === ((6L, 2L, 6L, Some(119.19))))
    // "7" and "tst" both clamp to 1 syllable; no terminator => 1 sentence
    assert(rows(2L) === ((2L, 1L, 2L,
      Some(BigDecimal(206.835 - 1.015 * 2 - 84.6 * 1 + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(rows(3L)._4.isEmpty)
  }

  test("penny_alloc: every order reconciles to the cent; each item gets " +
       "floor-share or floor-share+1; bumps go to the largest remainders") {
    val rows = Relational.pennyAlloc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val totals = Tables.t(spark, dir, "orders")
      .filter(col("o_orderkey") % 25 === 0)
      .selectExpr("o_orderkey",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (ok, items) =>
      val total = totals(ok)
      assert(items.map(_._4).sum === total, s"order $ok leaks cents")
      val denom = items.map(_._3).sum
      items.foreach { case (_, ln, pc, alloc) =>
        val base = total * pc / denom
        assert(alloc === base || alloc === base + 1,
          s"order $ok line $ln alloc $alloc vs base $base")
      }
      // bumped items carry remainders >= every unbumped item's
      val (bumped, plain) = items.partition { case (_, _, pc, alloc) =>
        alloc === total * pc / denom + 1 }
      if (bumped.nonEmpty && plain.nonEmpty) {
        val minBumped = bumped.map(t => total * t._3 % denom).min
        val maxPlain = plain.map(t => total * t._3 % denom).max
        assert(minBumped >= maxPlain, s"order $ok bumped a smaller remainder")
      }
    }
  }

  test("ivm_join: the merged base+delta view equals the direct " +
       "non-incremental join aggregate") {
    val got = Relational.ivmJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val c = Tables.t(spark, dir, "customer")
    val direct = Tables.t(spark, dir, "orders")
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)), round(sum(col("o_totalprice")), 4)).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === direct.keySet)
    got.foreach { case (k, (n, rev)) =>
      assert(n === direct(k)._1, s"$k count")
      assert(math.abs(rev - direct(k)._2) < 1e-4, s"$k revenue")
    }
  }

  test("equidepth_hist: ANSI ntile balance (first n%k bins take the " +
       "extra row), bins tile the price range in order") {
    val rows = Relational.equidepthHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = Tables.t(spark, dir, "orders").count()
    assert(rows.map(_._1).toSeq === (1L to 10L))
    assert(rows.map(_._2).sum === n)
    val (q, rem) = (n / 10, n % 10)
    rows.foreach { case (bin, cnt, _, _) =>
      assert(cnt === (if (bin <= rem) q + 1 else q), s"bin $bin") }
    // consecutive bins never overlap except possibly at a tied edge value
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bins ${a._1}/${b._1} overlap") }
  }

  test("winsorize: clip fractions ~5% per tail, winsorized mean sits " +
       "inside the clamp interval") {
    val rows = Relational.winsorize(spark, dir).collect()
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (mw, p05, p95) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(lo <= math.ceil(n * 0.06) && hi <= math.ceil(n * 0.06),
        s"${r.getString(0)}: clip counts $lo/$hi of $n")
      assert(mw >= p05 - 1e-6 && mw <= p95 + 1e-6)
    }
  }

  test("text_chunks: chunk count is ceil-by-stride, overlap region of " +
       "consecutive chunks agrees (same text both sides)") {
    val docs = Tables.t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = graft.ops.Text.textChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perDoc = chunks.groupBy(_._1)
    assert(perDoc.keySet === docs.keySet)
    perDoc.foreach { case (id, cs) =>
      val len = docs(id).length.max(1)
      val expect = (len - 1) / 150 + 1 // starts 1, 151, ... <= len
      assert(cs.length === expect, s"doc $id")
      // chunk_id contiguous from 0; fp8 recomputable from the source text
      assert(cs.map(_._2).sorted.toSeq === (0L until expect).toSeq)
      cs.foreach { case (_, cid, nch, fp8) =>
        val s = docs(id).slice((cid * 150).toInt,
                               (cid * 150 + 200).toInt.min(docs(id).length))
        assert(nch === s.length.toLong, s"doc $id chunk $cid")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(fp8 === md5.take(8), s"doc $id chunk $cid")
      }
    }
  }

  test("mm_neardup: a jittered copy collapses (small Hamming), an " +
       "unrelated payload of the same length does not") {
    import spark.implicits._
    // base "asset": 340 chars with a strongly varying per-cell profile
    // (stride = 340/17 = 20 exactly, so cells tile the payload)
    val rnd = new scala.util.Random(7)
    val base = (0 until 17).map { c =>
      val ch = ('a' + (c * 7) % 26).toChar
      (0 until 20).map(_ =>
        if (rnd.nextInt(4) == 0) ' ' else ch).mkString
    }.mkString
    // jitter: flip three characters in cells 2, 9, 16 — the md5-exact
    // dedup is defeated, the perceptual signature must survive
    val jittered = {
      val b = base.toCharArray
      b(2 * 20 + 3) = 'Z'; b(9 * 20 + 5) = 'Q'; b(16 * 20 + 7) = 'X'
      new String(b)
    }
    // unrelated payload, same length (length alone must not pair docs)
    val other = (0 until 340).map(i =>
      ('a' + (i * 13 + 5) % 26).toChar).mkString
    val ddir = TestFixtures.writeDir(Map(
      "documents" -> Seq(
        (0L, base, "en", "s"), (1L, jittered, "en", "s"),
        (2L, other, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")))
    val pairs = graft.ops.Multimodal.perceptualDedup(spark, ddir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)),
      "the jittered copy must survive banding and the Hamming cut")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "an unrelated same-length payload must not collapse")
    // and exact dedup indeed cannot see the jittered pair
    val exact = graft.ops.Multimodal.payloadDedup(spark, ddir).collect()
    assert(exact.forall(_.getLong(2) === 1L),
      "fixture sanity: no md5-exact copies exist")
  }

  test("perceptual signature is codepoint-defined on non-BMP payloads: " +
       "native cell sums equal a hand codepoint recompute, and a " +
       "jittered astral-plane copy still collapses") {
    import spark.implicits._
    // 340 CODEPOINTS, many astral-plane (🜁 = U+1F701 etc.) — in UTF-16
    // units this is ~500 long, so the round-8 split('')+ascii() recipe
    // would compute a different stride and surrogate-half sums
    val rnd = new scala.util.Random(11)
    val astral = "🜁🜂🜃🜄𝄞𝄢😀🧿".toCharArray // surrogate pairs
    val cps = astral.grouped(2).map(p => new String(p)).toSeq
    val base = (0 until 17).map { c =>
      (0 until 20).map { _ =>
        if (rnd.nextInt(3) == 0) cps((c * 3) % cps.size)
        else ('a' + (c * 7) % 26).toChar.toString
      }.mkString
    }.mkString
    def cpAt(s: String, idx: Int): Int =
      s.codePointAt(s.offsetByCodePoints(0, idx))
    def replaceCp(s: String, idx: Int, rep: String): String = {
      val o = s.offsetByCodePoints(0, idx)
      s.substring(0, o) + rep +
        s.substring(o + Character.charCount(s.codePointAt(o)))
    }
    val jittered = replaceCp(replaceCp(base, 2 * 20 + 3, "Z"),
                             9 * 20 + 5, "🜍")
    val ddir = TestFixtures.writeDir(Map(
      "documents" -> Seq((0L, base, "en", "s"), (1L, jittered, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")))
    // hand codepoint recompute of the 17-cell sums and the 16-bit
    // INTEGER signature (comparison i at bit 15-i, MSB-first — the
    // perceptualSigs packing convention)
    def handSig(s: String): Long = {
      val n = s.codePointCount(0, s.length)
      val stride = math.max(1, n / 17)
      val sums = (0 until 17).map(c =>
        (c * stride until math.min(n, (c + 1) * stride))
          .map(cpAt(s, _).toLong).sum)
      (0 until 16).foldLeft(0L)((acc, i) =>
        if (sums(i) > sums(i + 1)) acc | (1L << (15 - i)) else acc)
    }
    val sigs = graft.ops.Multimodal.perceptualSigs(
        Tables.t(spark, ddir, "documents"), 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === handSig(base), "base signature != codepoint spec")
    assert(sigs(1L) === handSig(jittered),
      "jittered signature != codepoint spec")
    // and the gate still works on astral payloads: two local edits keep
    // Hamming ≤ 2, so the pair collapses
    val pairs = graft.ops.Multimodal.perceptualDedup(spark, ddir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      "astral-plane jittered copy must still collapse")
  }

  test("q21_waiting: the decorrelated EXISTS/NOT-EXISTS form equals the " +
       "one-aggregate rewrite (late ∧ n_supp ≥ 2 ∧ n_late_supp = 1)") {
    val sql = Relational.q21Waiting(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val agg = Relational.q21AggRewrite(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(sql.nonEmpty, "the q21 shape must produce waiting suppliers")
    assert(sql.toSeq === agg.toSeq,
      "planner decorrelation and the hand aggregate must agree exactly")
  }

  test("q2_mincost: every surviving row's cost IS the minimum over the " +
       "part's in-region suppliers (naive recompute)") {
    val rows = Relational.q2MinCost(spark, dir).collect()
      .map(r => (r.getLong(3), r.getString(1), r.getDouble(5)))
    assert(rows.nonEmpty)
    // naive: per part, min cost over EUROPE suppliers from raw tables
    val nat = Tables.t(spark, dir, "nation").collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    val eur = Tables.t(spark, dir, "region").collect()
      .collectFirst { case r if r.getString(1) == "EUROPE" => r.getInt(0) }
      .get
    val supNation = Tables.t(spark, dir, "supplier").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val cost = scala.collection.mutable.Map[(Long, Long), Long]()
    Tables.t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        val c = math.round(r.getDouble(2) * 100)
        cost(k) = math.min(cost.getOrElse(k, Long.MaxValue), c)
      }
    val minEur = cost.toSeq
      .filter { case ((_, sk), _) => nat(supNation(sk)) == eur }
      .groupBy(_._1._1).map { case (pk, cs) => pk -> cs.map(_._2).min }
    rows.foreach { case (pk, _, sc) =>
      assert(sc === minEur(pk) / 100.0,
        s"part $pk reported cost is not the in-region minimum")
    }
  }

  test("dataset_split: tallies conserve the corpus, every lang splits " +
       "~80/10/10") {
    val rows = graft.ops.Curation.datasetSplit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = Tables.t(spark, dir, "documents").count()
    assert(rows.values.sum === total)
    rows.groupBy(_._1._1).foreach { case (lang, cells) =>
      val n = cells.values.sum.toDouble
      val train = cells.getOrElse((lang, "train"), 0L) / n
      // small strata are noisy; the hash threshold targets 79.7%
      assert(train > 0.6 && train < 0.95, s"$lang train frac $train")
    }
  }
}
