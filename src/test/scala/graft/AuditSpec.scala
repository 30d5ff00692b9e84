package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Audit

/** Audit operators: planted-violation fixtures for dq_checks, clamp and
  * mass-conservation properties for the histogram, marginal identities
  * for the contingency association. */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val plantedDir = TestFixtures.writeDir(Map(
    "lineitem" -> Seq(
      // (orderkey, shipdate, discount): 1 orphan (key 99), 1 ship-before-
      // order (key 2 ships before its 2024-06-01 order), 1 bad discount
      (1L, ts("2024-05-10 00:00:00"), 0.05),
      (2L, ts("2024-05-01 00:00:00"), 0.10),
      (2L, ts("2024-07-01 00:00:00"), 1.50),
      (99L, ts("2024-05-10 00:00:00"), 0.00))
      .toDF("l_orderkey", "l_shipdate", "l_discount"),
    "orders" -> Seq(
      (1L, ts("2024-05-01 00:00:00"), 10.0),
      (2L, ts("2024-06-01 00:00:00"), 20.0),
      (2L, ts("2024-06-02 00:00:00"), 30.0)) // dup key
      .toDF("o_orderkey", "o_orderdate", "o_totalprice"),
    "documents" -> Seq(
      (1L, "hello world", "en", "web"),
      (2L, "   ", "en", "web"), // blank after trim
      (3L, "ok", "fr", "book"))
      .toDF("doc_id", "text", "lang", "source")))

  test("dq_checks counts each planted violation class exactly once") {
    val rows = Audit.dqChecks(spark, plantedDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the dup order key fans the key-2 lineitems out ×2 in the left join:
    // population 4+2=6, orphan 1, ship-before-order 2 (the 05-01 row
    // matches both dup orders), bad discount ×2 for the same reason
    assert(rows("orphan_lineitem") === (1L, 6L))
    assert(rows("ship_before_order") === (2L, 6L))
    assert(rows("bad_discount") === (2L, 6L))
    assert(rows("dup_orderkey") === (1L, 3L))
    assert(rows("blank_doc_text") === (1L, 3L))
  }

  test("dq_checks on the clean fixture: referential + domain checks pass") {
    val rows = Audit.dqChecks(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("orphan_lineitem") === 0L, "fixture lineitem has no orphans")
    assert(m("dup_orderkey") === 0L, "fixture orderkeys are unique")
  }

  test("value_histogram: bins clamped to [0,19], counts conserve mass, " +
       "fracs sum to ~1") {
    val rows = Audit.valueHistogram(spark, dir).collect()
    val total = Tables.t(spark, dir, "orders").count()
    assert(rows.map(_.getLong(3)).sum === total)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    // independent recompute of one bin
    val bin3 = Tables.t(spark, dir, "orders")
      .filter(col("o_totalprice") >= 75000.0 &&
              col("o_totalprice") < 100000.0).count()
    assert(rows.find(_.getLong(0) == 3L).map(_.getLong(3)).getOrElse(0L)
      === bin3)
  }

  test("benford_digits: integer-derived leading digits, fracs sum to 1, " +
       "pinned expectation table") {
    val rows = Audit.benfordDigits(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(rows.find(_.getLong(0) == 1L).map(_.getDouble(3))
      .contains(0.30103))
    // planted leading digits across magnitudes
    val pd = TestFixtures.writeDir(Map(
      "orders" -> Seq((1L, 9.5), (2L, 92.0), (3L, 905.0), (4L, 1234.0),
                      (5L, 0.5)) // < 1 excluded
        .toDF("o_orderkey", "o_totalprice")))
    val planted = Audit.benfordDigits(spark, pd).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(planted === Map(9L -> 3L, 1L -> 1L))
    // ladder covers the full BIGINT money range, not just fixture sizes
    val big = TestFixtures.writeDir(Map(
      "orders" -> Seq((1L, 7.2e17), (2L, 3.0e12), (3L, 8.0e9))
        .toDF("o_orderkey", "o_totalprice")))
    val bigDigits = Audit.benfordDigits(spark, big).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bigDigits === Map(7L -> 1L, 3L -> 1L, 8L -> 1L))
  }

  test("crosstab_assoc: expected preserves marginals, contrib >= 0") {
    val rows = Audit.crosstabAssoc(spark, dir).collect()
    val total = Tables.t(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum === total)
    // per-cell identity against an independent driver-side recompute
    // (marginal sums only match on a FULL cartesian grid — absent cells
    // are structural zeros, so the per-cell check is the right one)
    val langTot = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val srcTot = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    rows.foreach { r =>
      val e = langTot(r.getString(0)) * srcTot(r.getString(1)) /
        total.toDouble
      assert(math.abs(r.getDouble(3) - e) < 1e-5,
        s"expected drift at (${r.getString(0)},${r.getString(1)})")
    }
    assert(rows.forall(_.getDouble(4) >= 0.0))
  }

  test("psi_drift: ten decile bins conserve both slices, base fractions " +
       "are ~0.1 each, every psi term is non-negative") {
    val rows = Audit.psiDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === (0L to 9L))
    val o = Tables.t(spark, dir, "orders")
    val cut = lit("1998-01-01").cast("timestamp")
    assert(rows.map(_._2).sum === o.filter(col("o_orderdate") < cut).count())
    assert(rows.map(_._3).sum === o.filter(col("o_orderdate") >= cut).count())
    // base bins are its own deciles: each holds ~10% (ties can wobble)
    rows.foreach { case (bin, _, _, p, _, psi) =>
      assert(p > 0.05 && p < 0.15, s"bin $bin base fraction $p")
      assert(psi >= -1e-9, s"bin $bin psi $psi")
    }
  }

  test("k_anonymity: every stat recomputes exactly from the QI class " +
       "sizes, and the k-threshold rows nest") {
    val sizes = Tables.t(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
               floor(col("c_acctbal") / 2000).cast("long"))
      .count().collect().map(_.getLong(3))
    val m = Audit.kAnonymity(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("rows_total") === sizes.sum)
    assert(m("classes_total") === sizes.length.toLong)
    assert(m("min_class_size") === sizes.min)
    assert(m("rows_k2_violating") === sizes.filter(_ < 2).sum)
    assert(m("rows_k5_violating") === sizes.filter(_ < 5).sum)
    assert(m("rows_k10_violating") === sizes.filter(_ < 10).sum)
    assert(m("classes_k5_violating") === sizes.count(_ < 5).toLong)
    assert(m("k5_risk_ppm") ===
      math.round(m("rows_k5_violating") * 1e6 / m("rows_total")))
    assert(m("rows_k2_violating") <= m("rows_k5_violating"))
    assert(m("rows_k5_violating") <= m("rows_k10_violating"))
  }

  test("l_diversity: stats recompute exactly from the per-class " +
       "distinct-sensitive counts") {
    val cls = Tables.t(spark, dir, "customer").collect()
      .map(r => ((r.getInt(2), math.floor(r.getDouble(3) / 2000).toLong),
                 r.getString(4)))
      .groupBy(_._1).values
      .map(v => (v.size.toLong, v.map(_._2).distinct.size.toLong)).toSeq
    val m = Audit.lDiversity(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("classes_total") === cls.size.toLong)
    assert(m("rows_total") === cls.map(_._1).sum)
    assert(m("min_l") === cls.map(_._2).min)
    assert(m("max_l") === cls.map(_._2).max)
    assert(m("classes_l1") === cls.count(_._2 == 1).toLong)
    assert(m("rows_l1") === cls.filter(_._2 == 1).map(_._1).sum)
    assert(m("mean_l_ppm") ===
      math.round(cls.map(_._2).sum * 1e6 / cls.size))
  }

  test("join_fanout: the predicted Σc² equals the ACTUAL self-join " +
       "cardinality, and the histogram conserves the input") {
    val rows = Audit.joinFanout(spark, dir).collect()
    val li = Tables.t(spark, dir, "lineitem").select(col("l_partkey"))
    val actual = li.as("a").join(li.as("b"), "l_partkey").count()
    // the quadratic columns are DOUBLE (overflow-safe at hot keys) but
    // exact below 2^53 pairs — so equality here is exact, not approx
    val predicted = rows.head.getDouble(5)
    assert(predicted === actual.toDouble,
      "Σc² must equal the real join size")
    assert(rows.map(_.getLong(2)).sum === li.count(), "input conservation")
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * r.getLong(1))
      assert(r.getDouble(3) ===
        (r.getLong(0) * r.getLong(0) * r.getLong(1)).toDouble)
    }
  }

  test("t_closeness: driver-side TVD recompute over the QI classes " +
       "matches every report line") {
    val rows = Tables.t(spark, dir, "customer").collect()
      .map(r => ((r.getInt(2), math.floor(r.getDouble(3) / 2000).toLong),
                 r.getString(4)))
    val n = rows.length.toLong
    val segTot = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val classes = rows.groupBy(_._1).map { case (_, rs) =>
      val nC = rs.length.toLong
      val cells = rs.groupBy(_._2).view.mapValues(_.length.toLong)
      // num = Σ over ALL segments |n_cs·N − n_s·n_c| (absent cells give
      // n_s·n_c) — recomputed over the explicit segment grid here,
      // proving the operator's closed form equivalent
      val num = segTot.map { case (seg, nS) =>
        math.abs(cells.getOrElse(seg, 0L) * n - nS * nC) }.sum
      (nC, num, num.toDouble / (2.0 * nC * n))
    }.toSeq
    val got = graft.ops.Audit.tCloseness(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def q6(x: Double) =
      BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(got("classes_total") === classes.size.toDouble)
    assert(got("rows_total") === classes.map(_._1).sum.toDouble)
    assert(got("max_tvd") === q6(classes.map(_._3).max))
    val ppms = classes.map(c =>
      math.round(c._2 * 1e6 / (2.0 * c._1 * n)))
    assert(got("mean_tvd_ppm") ===
      math.round(ppms.sum.toDouble / classes.size).toDouble)
    // deliberately the UNREDUCED fraction (10/6) vs the operator's
    // overflow-hardened lowest-terms 5/3 — same rule, independent form
    val above = classes.filter(c => 10 * c._2 > 6 * c._1 * n)
    assert(got("classes_above_03") === above.size.toDouble)
    assert(got("rows_above_03") === above.map(_._1).sum.toDouble)
  }

  test("dp_release: released = true + rounded noise, runs are " +
       "bit-identical, and mean |noise| tracks the 1/ε Laplace scale") {
    val rows = graft.ops.Audit.dpRelease(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
                 r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).distinct.sorted.toSeq === Seq(0.5, 1.0, 2.0))
    rows.foreach { case (src, eps, t, noise, rel) =>
      // half-away-from-zero, matching the engine's round(noise, 0)
      val r = (math.signum(noise) * math.floor(math.abs(noise) + 0.5)).toLong
      assert(rel === t + r, s"$src@$eps")
    }
    // the seeded draw is deterministic: a second run is bit-identical
    val again = graft.ops.Audit.dpRelease(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
                 r.getDouble(3), r.getLong(4)))
    assert(rows.toSeq === again.toSeq)
    // E|Laplace(1/ε)| = 1/ε: the per-ε mean magnitude must order 1/ε
    val meanAbs = rows.groupBy(_._2).view
      .mapValues(g => g.map(x => math.abs(x._4)).sum / g.size).toMap
    assert(meanAbs(0.5) > meanAbs(1.0) && meanAbs(1.0) > meanAbs(2.0),
      s"noise magnitude must shrink as the budget grows: $meanAbs")
  }
}
