package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** Graph family: independent in-JVM recomputation of the integer PageRank
  * fixed point and a brute-force triangle count, both from the raw
  * fixture — the operators' joins/windows never touch these oracles. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Directed co-purchase edges of [from, until), recomputed naively. */
  private def edges(from: String, until: String): Set[(Long, Long)] = {
    val inc = Tables.t(spark, sf, "lineitem")
      .filter($"l_shipdate" >= from && $"l_shipdate" < until)
      .select($"l_orderkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    inc.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
  }

  test("pagerank equals the integer recurrence replayed in-JVM, exactly") {
    val e = edges("1997-01-01", "1998-01-01")
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size
    val S = 1000000000000L
    val base = (15L * S) / (100L * n)
    var rank = deg.map { case (v, _) => v -> S / n }
    for (_ <- 1 to 5) {
      val recv = e.toSeq
        .map { case (u, v) => v -> (rank(u) * 85L) / (100L * deg(u)) }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      rank = deg.map { case (v, _) => v -> (base + recv.getOrElse(v, 0L)) }
    }
    val got = Graph.pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === rank.keySet)
    got.foreach { case (part, (d, micro)) =>
      assert(d === deg(part), s"deg of $part")
      assert(micro === rank(part), s"rank of $part")
    }
    // mass conservation: floors lose < 1 micro-unit per node (teleport)
    // + 1 per edge (contribution) per iteration; the deficit D obeys
    // D_k = 0.85·D_{k-1} + loss_k, converging to loss/0.15 ≤ 7·(n+|E|).
    // Floors never create mass, so total ≤ S exactly.
    val total = got.values.map(_._2).sum
    assert(total <= S && total >= S - 7L * (n + e.size),
      s"rank mass $total outside [S - 7(n+|E|), S]")
  }

  test("kcore equals a naive synchronous peel, and 8 rounds REACH the " +
       "fixpoint on this graph (the unrolled bound is checked, not hoped)") {
    val e = edges("1997-01-01", "1997-07-01")
    var alive = e.groupBy(_._1).collect {
      case (v, es) if es.size >= 3 => v }.toSet
    var prev = Set.empty[Long]
    var deg = Map.empty[Long, Int]
    for (_ <- 1 to 8) {
      prev = alive
      deg = e.toSeq.filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._1).map { case (v, es) => v -> es.size }
      alive = deg.collect { case (v, d) if d >= 3 => v }.toSet
    }
    assert(alive === prev, "8 peels must reach the fixpoint here")
    val got = Graph.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === alive)
    got.foreach { case (v, d) => assert(d === deg(v).toLong, s"deg of $v") }
    // every survivor keeps >= 3 in-core neighbors (the 3-core property)
    got.values.foreach(d => assert(d >= 3L))
  }

  test("triangles equals a brute-force adjacency count") {
    val adj = edges("1997-01-01", "1997-07-01")
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val brute = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }.toLong
    }
    val got = Graph.triangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute)
  }

  test("degree_dist masses sum to |nodes| and weighted-sum to |edges|") {
    val e = edges("1900-01-01", "9999-01-01")
    val dist = Graph.degreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(dist.map(_._2).sum === e.map(_._1).toSet.size.toLong)
    assert(dist.map { case (d, c) => d * c }.sum === e.size.toLong)
  }

  test("link_predict equals a naive capped-center recompute; no " +
       "predicted pair is an existing edge") {
    val und = edges("1997-01-01", "1997-07-01")
      .filter { case (s, d) => s < d }.toSet
    val nbrs = und.toSeq.flatMap { case (s, d) => Seq(s -> d, d -> s) }
    val deg = nbrs.groupBy(_._1).map { case (w, xs) => w -> xs.size }
    val byCenter = nbrs.filter { case (w, _) => deg(w) <= 64 }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byCenter.values.foreach { xs =>
      for (i <- xs.indices; j <- i + 1 until xs.length)
        cn((xs(i), xs(j))) = cn.getOrElse((xs(i), xs(j)), 0L) + 1
    }
    val cands = cn.filter { case (p, _) => !und(p) }
    val got = Graph.linkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === math.min(50, cands.size))
    got.foreach { case (u, v, c, jac) =>
      assert(!und((u, v)), s"($u,$v) already an edge")
      assert(c === cands((u, v)), s"($u,$v) common-neighbor count")
      val expJac = c.toDouble / (deg(u) + deg(v) - c)
      assert(math.abs(jac - expJac) < 1e-5, s"($u,$v) jaccard")
    }
    // the returned pairs are exactly the top-50 by (cn desc, u, v)
    val want = cands.toSeq
      .sortBy { case ((u, v), c) => (-c, u, v) }.take(50)
      .map { case ((u, v), c) => (u, v, c) }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === want)
  }

  test("frequent_pairs: supports match a naive basket recompute, lift " +
       "consistent with its own supports") {
    val inc = Tables.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = inc.map(_._1).distinct.length.toLong
    val singles = inc.groupBy(_._2).map { case (p, xs) => p -> xs.length }
    val pairCnt = inc.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val eligible = pairCnt.filter(_._2 >= 2)
    val got = Graph.frequentPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getDouble(3), r.getDouble(4)))
    assert(got.length === math.min(50, eligible.size))
    got.foreach { case (a, b, n, conf, lift) =>
      assert(n === eligible((a, b)))
      assert(math.abs(conf - n.toDouble / singles(a)) < 1e-5)
      assert(math.abs(lift -
        n.toDouble * nOrders / (singles(a).toLong * singles(b))) < 1e-5)
    }
  }
}
