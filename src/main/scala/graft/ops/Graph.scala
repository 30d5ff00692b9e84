package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the part co-purchase graph (parts linked when they
  * appear in the same order) — the iterative-algorithm family of the
  * extension surface: PageRank (fixed-point iteration), triangle counting
  * (oriented wedge join) and the degree-distribution audit.
  *
  * Scale doctrine:
  *  - Edge construction self-joins lineitem on l_orderkey. Order size is
  *    bounded by the schema (max 17 items on the fixtures, 7 in classic
  *    TPC-H), so per-order fan-out is ≤ |order|², a CONSTANT — the join
  *    output is Θ(|lineitem|), never quadratic in the table.
  *  - PageRank ranks carry INTEGER micro-units (scale 1e12) and every
  *    per-edge contribution is an integer floor-division: integer sums are
  *    associative and order-independent, so the DuckDB oracle matches
  *    bit-for-bit — the sparse_cosine exact-integer-parity doctrine
  *    applied to an iterative fixed point. A float PageRank would diverge
  *    across engines in the 15th decimal on the first shuffle reorder.
  *  - Each iteration is one edges⋈ranks shuffle on src + one groupBy(dst)
  *    with map-side partial sums; edges are persisted once and reused by
  *    all iterations. At 100 TB you'd checkpoint the rank table every few
  *    iterations to truncate lineage — here 5 iterations keep the DAG
  *    shallow (and the oracle unrollable).
  *  - Triangle counting orients each undirected edge from its
  *    (degree, id)-smaller endpoint to the larger: out-degrees are then
  *    bounded by O(√|E|) (arboricity argument), so the wedge join is
  *    Θ(Σ outdeg²) ≲ |E|^1.5 — the standard distributed-triangle bound —
  *    instead of Σ deg², which a hub node makes quadratic.
  *  - PageRank/triangles run on a shipdate-sliced subgraph (a year / six
  *    months): the slice predicate reaches the parquet scan, and the
  *    algorithms are identical at any slice width.
  */
object Graph {

  /** Raw (order, part) incidences, optionally shipdate-sliced. NOT
    * deduplicated: every consumer routes through a per-order collect_set
    * (orderPairs / frequentPairs baskets), whose set semantics subsume
    * the old `.distinct()` — dropping it here removes a full
    * (ok, pk)-keyed exchange from every graph query (the r13 shape paid
    * distinct AND the basket/join shuffle; guide §2.4, share one
    * exchange). The oracles keep their explicit SELECT DISTINCT CTE —
    * same relation, derived once instead of twice. */
  private def incidences(spark: SparkSession, dir: String,
                         fromDate: String, untilDate: String): DataFrame = {
    val li = Tables.t(spark, dir, "lineitem")
    val sliced =
      if (fromDate.isEmpty) li
      else li.filter(col("l_shipdate") >= lit(fromDate).cast("timestamp") &&
                     col("l_shipdate") < lit(untilDate).cast("timestamp"))
    sliced.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  }

  /** All unordered within-order part pairs (a < b), one row per
    * (order, pair) incidence. Basket-local expansion: one exchange (the
    * per-order collect_set, map-side partially aggregated) replaces the
    * r13 shape's distinct + self-join on ok — which re-shuffled the
    * incidence relation twice more and probed a hash table per row, for
    * pairs the sorted basket array can emit directly (guide §2.4: two
    * operations keyed the same way share one exchange). Grouped state is
    * bounded by the schema's max order size (≤ 17 parts — the same
    * constant that bounds the pair fan-out), so collect_set is not an
    * unbounded buffer. The sorted array makes a < b positional: the
    * two-level Generate (posexplode × tail slice) emits each unordered
    * pair exactly once per order, which is exactly one row per
    * (ok, a, b) of the old join — the pair MULTISET is unchanged, so
    * every consumer's counts are engine-exact vs the unchanged oracles. */
  private def orderPairs(inc: DataFrame): DataFrame =
    inc.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(col("a"),
        explode(expr("slice(ps, i + 2, size(ps) - i - 1)")).as("b"))

  /** Distinct undirected co-purchase edges, src < dst by construction
    * (the basket expansion emits sorted pairs) — half the distinct-state
    * of deduplicating the directed form. */
  private def undirectedEdges(inc: DataFrame): DataFrame =
    orderPairs(inc)
      .select(col("a").as("src"), col("b").as("dst")).distinct()

  /** Directed co-purchase edges (both directions, deduplicated). Both
    * orientations explode out of ONE row of the deduplicated undirected
    * set — an explode AFTER the distinct keeps a single plan subtree
    * (a self-union here would re-run the basket aggregate and the
    * distinct once per leg: Catalyst does not share common subtrees
    * across union branches, and the first cut of this rewrite measured
    * exactly that double-compute on every directedEdges consumer). */
  private def directedEdges(inc: DataFrame): DataFrame =
    undirectedEdges(inc)
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** PageRank over the 1997 co-purchase subgraph, 5 iterations, d = 0.85,
    * in integer micro-units (S = 1e12):
    *
    *   rank⁰(v)   = S div N
    *   rankᵏ⁺¹(v) = (15·S) div (100·N)
    *              + Σ_{u→v} (rankᵏ(u)·85) div (100·deg(u))
    *
    * Every node has deg ≥ 1 (edges are symmetric), so there are no
    * dangling nodes and the mass lost to floors is < N + |E| micro-units
    * per iteration (GraphSpec pins the bound). N is a collected scalar —
    * a bounded model parameter (|parts|), same stance as the IVF codebook
    * size. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val S = 1000000000000L
    // Pre-partition the persisted edge table by src: the cached relation
    // reports hashpartitioning(src), so each iteration's edges⋈ranks
    // shuffles ONLY the skinny rank table — the big side moves once, not
    // five times (the 100 TB shape; locally the planner may still prefer
    // broadcasting the rank side, which is equally shuffle-free).
    val edges = directedEdges(
      incidences(spark, dir, "1997-01-01", "1998-01-01"))
      .repartition(col("src")).persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    val base = (15L * S) / (100L * n)
    var ranks = deg.select(col("src").as("node"), col("deg"),
      lit(S / n).as("rank"))
    for (_ <- 1 to 5) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(rank * 85L) div (100L * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = deg.select(col("src").as("node"), col("deg"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
    }
    val out = ranks
      .select(col("node").as("part"), col("deg"),
        col("rank").as("rank_micro"),
        round(col("rank") / lit(1.0e12), 8).as("pr"))
      .orderBy(col("part"))
    out
  }

  /** Per-part triangle count on the 1997-H1 co-purchase subgraph.
    * Undirected edges (u < v) are oriented from the (deg, id)-smaller
    * endpoint; triangles enumerate once as (a→b, b→c, a→c) and each
    * corner is credited. Nodes in no triangle report 0. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val inc = incidences(spark, dir, "1997-01-01", "1997-07-01")
    val undirected = undirectedEdges(inc)
      .persist()
    val deg = undirected.select(col("src").as("x"))
      .union(undirected.select(col("dst").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val withDeg = undirected
      .join(deg.withColumnRenamed("x", "src").withColumnRenamed("deg", "ds"),
        "src")
      .join(deg.withColumnRenamed("x", "dst").withColumnRenamed("deg", "dd"),
        "dst")
    val oriented = withDeg.select(
      when(col("ds") < col("dd") ||
           (col("ds") === col("dd") && col("src") < col("dst")),
        col("src")).otherwise(col("dst")).as("a"),
      when(col("ds") < col("dd") ||
           (col("ds") === col("dd") && col("src") < col("dst")),
        col("dst")).otherwise(col("src")).as("b"))
      .persist()
    val e1 = oriented
    val e2 = oriented.select(col("a").as("b"), col("b").as("c"))
    val e3 = oriented.select(col("a").as("ta"), col("b").as("tc"))
    val tri = e1.join(e2, "b")
      .join(e3, col("a") === col("ta") && col("c") === col("tc"))
      .select(col("a"), col("b"), col("c"))
    val corners = tri.select(explode(array(col("a"), col("b"), col("c")))
      .as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("triangles"))
    deg.select(col("x").as("part"))
      .join(corners, Seq("part"), "left")
      .select(col("part"), coalesce(col("triangles"), lit(0L))
        .as("triangles"))
      .orderBy(col("part"))
  }

  /** Common-neighbor link prediction on the 1997-H1 co-purchase graph:
    * for part pairs NOT yet co-purchased, the Jaccard overlap of their
    * neighborhoods — the classic "customers who bought X also
    * bought ..." candidate scorer. Wedge enumeration through a center
    * node is the Σ deg² hub hazard, so centers are DEGREE-CAPPED at 64
    * (work ≤ 64·|E|, the minhash-bucket-cap doctrine: the cap is part
    * of the operator's definition and the oracle applies the same cap,
    * so the result is exact FOR THE DEFINED ESTIMATOR — a production
    * run raises the cap or routes hub centers through a sampled
    * estimate; the capped score only ever undercounts common
    * neighbors through hub centers, the pairs a recommender cares
    * least about because hub co-incidence is uninformative). Known
    * edges drop via one anti join; top-50 by (count, pair) is integer-
    * deterministic before any float enters. */
  def linkPredict(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(incidences(spark, dir, "1997-01-01", "1997-07-01"))
      .persist()
    val nbrs = und.select(col("src").as("w"), col("dst").as("x"))
      .union(und.select(col("dst").as("w"), col("src").as("x")))
    val deg = nbrs.groupBy(col("w")).agg(count(lit(1)).as("deg"))
    // deg is |parts|-sized — a key join, not a broadcast (parts grow
    // with the corpus; AQE may still choose broadcast at local scale)
    val capped = nbrs.join(deg.filter(col("deg") <= 64), "w")
    val cn = capped.select(col("w"), col("x").as("u"))
      .join(capped.select(col("w"), col("x").as("v")), "w")
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
      .join(und.select(col("src").as("u"), col("dst").as("v")),
            Seq("u", "v"), "left_anti")
    cn.join(deg.select(col("w").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("w").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        round(col("cn").cast("double") /
              (col("du") + col("dv") - col("cn")) + 1e-9, 6).as("jaccard"))
      .orderBy(col("cn").desc, col("u"), col("v"))
      .limit(50)
  }

  /** Frequent co-purchase pairs with association-rule stats — market-
    * basket mining's first pass (support / confidence / lift over
    * order baskets). Pair fan-out is bounded by order size² (orders
    * hold ≤ 7 items), the same Θ(|lineitem|)-output argument as the
    * pagerank edge build; singles and the basket count are
    * map-side-combinable aggregates broadcast back into the pair
    * relation. The support≥2 floor and the (n_ab, pair) ordering are
    * all-integer, so the top-50 membership is engine-exact; floats
    * appear only in the reported confidence/lift columns. */
  def frequentPairs(spark: SparkSession, dir: String): DataFrame = {
    // One persisted basket relation feeds all three aggregates: the
    // basket count (nOrders), the per-part supports (explode), and the
    // pair counts (positional expansion). The r13 form persisted the
    // incidence relation and still paid the distinct + self-join double
    // shuffle for the pairs; here the only exchanges are the basket
    // groupBy and the two (map-side partially aggregated) count shuffles.
    val baskets = incidences(spark, dir, "", "")
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps")).persist()
    val nOrders = baskets.count()
    val singles = baskets.select(explode(col("ps")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n1"))
    val pairs = baskets
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(col("a"),
        explode(expr("slice(ps, i + 2, size(ps) - i - 1)")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    // top-50 BEFORE the stat joins: membership depends only on the
    // integer (n_ab, a, b) ordering, so the TakeOrderedAndProject cuts
    // the pair relation to 50 rows and the |parts|-sized singles table
    // joins against a broadcast-trivial side instead of millions of
    // candidate pairs. Locally the pair aggregate dominates either way
    // (~2.7 s at sf0.1); the reorder matters at scale, where the
    // post-aggregate join would otherwise shuffle |pairs| twice.
    val top = pairs.orderBy(col("n_ab").desc, col("a"), col("b")).limit(50)
    broadcast(top)
      .join(singles.select(col("pk").as("a"), col("n1").as("na")), "a")
      .join(singles.select(col("pk").as("b"), col("n1").as("nb")), "b")
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("na") + 1e-9, 6)
          .as("conf_a_to_b"),
        round(col("n_ab").cast("double") * nOrders /
              (col("na") * col("nb")) + 1e-9, 6).as("lift"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
  }

  /** Degree distribution of the FULL co-purchase graph — the audit that
    * tells you whether hub parts make downstream pairings skew-prone.
    * Output is |distinct degrees| rows (bounded by max degree). */
  def degreeDist(spark: SparkSession, dir: String): DataFrame = {
    // Degrees only need the UNDIRECTED distinct pair set (u < v) — each
    // endpoint then contributes one neighbor to the other (half the
    // distinct-state of the directed form); the pairs come from the
    // single-exchange basket expansion, deg(p) = |distinct neighbors|
    // unchanged.
    val und = orderPairs(incidences(spark, dir, "", ""))
      .select(col("a").as("src"), col("b").as("dst")).distinct()
    und.select(col("src").as("x"))
      .union(und.select(col("dst").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_parts"))
      .orderBy(col("deg"))
  }

  /** 3-core of the 1997-H1 co-purchase subgraph: the maximal subgraph
    * where every node keeps ≥ 3 neighbors, by synchronous peeling —
    * drop sub-3-degree nodes, recount degrees among survivors, repeat.
    * Eight peel rounds are unrolled (the pagerank fixed-iteration
    * stance; GraphSpec asserts rounds 7 and 8 agree, i.e. the fixpoint
    * was REACHED, so the bound is checked, not hoped — a deployment on
    * a deeper graph raises the constant or drives the same loop from
    * the driver with a convergence check, exactly like pagerank's).
    *
    * Dataflow per round: the symmetric edge table (persisted, pre-
    * partitioned on dst ONCE) joins the skinny alive set on dst, counts
    * by src with map-side partial aggregation, semi-joins the previous
    * alive set on the group key, and filters deg ≥ 3 — per iteration
    * only Θ(alive) rows and the partial-agg combine move, the edge
    * relation never reshuffles. Output is all-integer (node, in-core
    * degree). */
  def kcore(spark: SparkSession, dir: String): DataFrame = {
    val K = 3
    // persisted like pagerank's edge table; the harness clears caches
    // between queries (Bench/Verify), embedding callers own clearCache
    val edges = directedEdges(
      incidences(spark, dir, "1997-01-01", "1997-07-01"))
      .repartition(col("dst")).persist()
    // Each round CUTS its lineage with an eager localCheckpoint: the
    // round-k plan references alive TWICE (degree count + the semi
    // join), so without the cut the LOGICAL tree doubles per round —
    // 2^8 copies of the base plan by round 8, and analysis cost (not
    // the 12k-edge data!) took 95 s and then the driver heap. persist()
    // does not help: caching shortcuts execution, but Catalyst still
    // analyzes the full tree. After the checkpoint each round's plan is
    // a constant-size LogicalRDD. local[·] keeps blocks on the one JVM;
    // a cluster deployment swaps in reliable checkpoint() so an
    // executor loss cannot orphan a round. */
    var alive = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= K)
      .select(col("src").as("node"), col("deg"))
      .localCheckpoint()
    // Early exit on an unchanged count: the alive set only ever shrinks
    // (each round semi-joins the previous), so count-equal ⇒ set-equal
    // ⇒ fixpoint, and further rounds are identities — stopping early
    // returns EXACTLY the 8-round (oracle) result with fewer jobs.
    var n = alive.count()
    var round = 0
    var changed = true
    while (round < 8 && changed) {
      val cnt = edges
        .join(alive.select(col("node")), col("dst") === col("node"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      alive = cnt
        .join(alive.select(col("node").as("prev")),
              col("src") === col("prev"), "left_semi")
        .filter(col("deg") >= K)
        .select(col("src").as("node"), col("deg"))
        .localCheckpoint()
      val m = alive.count()
      changed = m != n
      n = m
      round += 1
    }
    alive.select(col("node").as("part"), col("deg").as("core_deg"))
      .orderBy(col("part"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank"     -> (pagerank _),
    "triangles"    -> (triangles _),
    "link_predict" -> (linkPredict _),
    "frequent_pairs" -> (frequentPairs _),
    "kcore"        -> (kcore _),
    "degree_dist"  -> (degreeDist _))

  /** Shared SQL prelude: distinct incidences + directed edges. */
  private def edgesSql(fromDate: String, untilDate: String): String = {
    val slice =
      if (fromDate.isEmpty) ""
      else s"WHERE l_shipdate >= TIMESTAMP '$fromDate' " +
           s"AND l_shipdate < TIMESTAMP '$untilDate'"
    s"""li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem $slice),
       |e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b USING (ok) WHERE a.pk <> b.pk)""".stripMargin
  }

  /** 5 unrolled integer-PageRank iterations (DuckDB's SUM(BIGINT) is
    * HUGEINT; values are identical, the final select casts back). */
  private def pagerankSql: String = {
    val iters = (1 to 5).map { k =>
      s"""r$k AS (
         |  SELECT d.src AS node, d.deg,
         |    (15000000000000 // (100 * n.n)) + COALESCE(c.s, 0) AS rank
         |  FROM d CROSS JOIN n LEFT JOIN (
         |    SELECT e.dst AS node, SUM((r.rank * 85) // (100 * r.deg)) AS s
         |    FROM e JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY e.dst) c ON c.node = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql("1997-01-01", "1998-01-01")},
       |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |n AS (SELECT COUNT(*) AS n FROM d),
       |r0 AS (
       |  SELECT d.src AS node, d.deg, 1000000000000 // n.n AS rank
       |  FROM d CROSS JOIN n),
       |$iters
       |SELECT node AS part, deg, CAST(rank AS BIGINT) AS rank_micro,
       |  ROUND(rank / 1000000000000.0, 8) AS pr
       |FROM r5 ORDER BY part""".stripMargin
  }

  private def trianglesSql: String =
    s"""WITH ${edgesSql("1997-01-01", "1997-07-01")},
       |u AS (SELECT src, dst FROM e WHERE src < dst),
       |deg AS (
       |  SELECT x, COUNT(*) AS deg FROM (
       |    SELECT src AS x FROM u UNION ALL SELECT dst AS x FROM u)
       |  GROUP BY x),
       |o AS (
       |  SELECT CASE WHEN ds.deg < dd.deg
       |              OR (ds.deg = dd.deg AND u.src < u.dst)
       |         THEN u.src ELSE u.dst END AS a,
       |         CASE WHEN ds.deg < dd.deg
       |              OR (ds.deg = dd.deg AND u.src < u.dst)
       |         THEN u.dst ELSE u.src END AS b
       |  FROM u JOIN deg ds ON ds.x = u.src JOIN deg dd ON dd.x = u.dst),
       |tri AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM o e1 JOIN o e2 ON e2.a = e1.b
       |  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
       |corners AS (
       |  SELECT part, COUNT(*) AS triangles FROM (
       |    SELECT a AS part FROM tri UNION ALL
       |    SELECT b AS part FROM tri UNION ALL
       |    SELECT c AS part FROM tri)
       |  GROUP BY part)
       |SELECT deg.x AS part, COALESCE(corners.triangles, 0) AS triangles
       |FROM deg LEFT JOIN corners ON corners.part = deg.x
       |ORDER BY part""".stripMargin

  /** 8 unrolled synchronous peels (each restricts both endpoints to the
    * previous alive set — the same recurrence the operator runs). */
  private def kcoreSql: String = {
    val peels = (1 to 8).map { k =>
      s"""a$k AS (
         |  SELECT e.src AS node, COUNT(*) AS deg
         |  FROM e JOIN a${k - 1} d ON e.dst = d.node
         |       JOIN a${k - 1} s ON e.src = s.node
         |  GROUP BY 1 HAVING COUNT(*) >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql("1997-01-01", "1997-07-01")},
       |a0 AS (
       |  SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1
       |  HAVING COUNT(*) >= 3),
       |$peels
       |SELECT node AS part, CAST(deg AS BIGINT) AS core_deg
       |FROM a8 ORDER BY part""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "pagerank" -> pagerankSql,
    "triangles" -> trianglesSql,
    "kcore" -> kcoreSql,
    // link_predict: the 64-degree center cap is part of the operator's
    // definition — the oracle applies the identical cap.
    "link_predict" ->
      s"""WITH ${edgesSql("1997-01-01", "1997-07-01")},
         |und AS (SELECT src, dst FROM e WHERE src < dst),
         |nbrs AS (
         |  SELECT src AS w, dst AS x FROM und
         |  UNION ALL SELECT dst AS w, src AS x FROM und),
         |d AS (SELECT w, COUNT(*) AS deg FROM nbrs GROUP BY w),
         |capped AS (
         |  SELECT n.w, n.x FROM nbrs n JOIN d ON n.w = d.w
         |  WHERE d.deg <= 64),
         |cn AS (
         |  SELECT p.x AS u, q.x AS v, COUNT(*) AS cn
         |  FROM capped p JOIN capped q ON p.w = q.w AND p.x < q.x
         |  GROUP BY 1, 2),
         |nk AS (
         |  SELECT cn.* FROM cn
         |  WHERE NOT EXISTS (SELECT 1 FROM und
         |                    WHERE src = cn.u AND dst = cn.v))
         |SELECT u, v, cn,
         |  ROUND(CAST(cn AS DOUBLE) / (du.deg + dv.deg - cn) + 1e-9, 6)
         |    AS jaccard
         |FROM nk JOIN d du ON du.w = u JOIN d dv ON dv.w = v
         |ORDER BY cn DESC, u, v LIMIT 50""".stripMargin,
    "frequent_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
        |s AS (SELECT pk, COUNT(*) AS n1 FROM li GROUP BY pk),
        |p AS (
        |  SELECT a.pk AS a, b.pk AS b, COUNT(*) AS n_ab
        |  FROM li a JOIN li b USING (ok) WHERE a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT a, b, n_ab,
        |  ROUND(CAST(n_ab AS DOUBLE) / sa.n1 + 1e-9, 6) AS conf_a_to_b,
        |  ROUND(CAST(n_ab AS DOUBLE) * n.n_orders / (sa.n1 * sb.n1)
        |        + 1e-9, 6) AS lift
        |FROM p JOIN s sa ON sa.pk = a JOIN s sb ON sb.pk = b, n
        |ORDER BY n_ab DESC, a, b LIMIT 50""".stripMargin,
    "degree_dist" ->
      s"""WITH ${edgesSql("", "")},
         |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)
         |SELECT deg, COUNT(*) AS n_parts FROM d
         |GROUP BY deg ORDER BY deg""".stripMargin)
}
