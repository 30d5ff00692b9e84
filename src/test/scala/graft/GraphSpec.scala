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
}
