package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions.col
import graft.ops.{Panel, Relational}

/** Property-based checks (SURVEY.md §5): the window features and the
  * keyed upsert verified against plain-Scala reference models on
  * generated panels. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  /** Panels: 1-3 entities, 1-8 distinct years each, 2-dp values. */
  private val panelGen: Gen[List[(String, Int, Double)]] = for {
    nEnt <- Gen.choose(1, 3)
    rows <- Gen.sequence[List[List[(String, Int, Double)]],
                         List[(String, Int, Double)]](
      (0 until nEnt).map { e =>
        for {
          nYears <- Gen.choose(1, 8)
          years  <- Gen.pick(nYears, 2000 to 2015)
          vals   <- Gen.listOfN(nYears, Gen.choose(-10000, 10000))
        } yield years.toList.sorted.zip(vals)
          .map { case (y, v) => (s"E$e", y, v / 100.0) }
      }.toList)
  } yield rows.flatten

  /** Reference model of Panel.features' roll5: same summation order,
    * same 6-dp half-up rounding, NULL below 3 rows. */
  private def modelRoll5(vals: Vector[Double]): Vector[Option[Double]] =
    vals.indices.map { i =>
      if (i < 2) None
      else {
        val n = math.min(i + 1, 5)
        // same left-assoc order as the lag-chain: current + lag1 + lag2...
        val s = (0 until n).map(k => vals(i - k)).reduceLeft(_ + _)
        Some(BigDecimal(s / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toVector

  test("roll5 matches the reference model on generated panels") {
    check(Prop.forAll(panelGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("entity", "year", "m")
        val got = Panel.features(df, "entity", "year", Seq("m"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector)
          .toMap
        val want = rows.groupBy(_._1).map { case (e, rs) =>
          e -> modelRoll5(rs.sortBy(_._2).map(_._3).toVector)
        }
        got == want
      }
    })
  }

  test("lag1 shifts the sorted panel by exactly one position") {
    check(Prop.forAll(panelGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("entity", "year", "m")
        val got = Panel.features(df, "entity", "year", Seq("m"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector)
          .toMap
        val want = rows.groupBy(_._1).map { case (e, rs) =>
          val vs = rs.sortBy(_._2).map(_._3).toVector
          e -> (None +: vs.init.map(Some(_)))
        }
        got == want
      }
    })
  }

  /** Batches of keyed rows with batch ids as recency. */
  private val batchGen: Gen[List[(String, Int, Double, Long)]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      y <- Gen.choose(2000, 2002)
      v <- Gen.choose(0, 1000)
      b <- Gen.choose(1L, 5L)
    } yield (k, y, v.toDouble, b))
  } yield rows

  test("MinKAggregator == sort.take(k) under any insert/merge order") {
    val xsGen = Gen.listOf(Gen.choose(0L, 1000L))
    check(Prop.forAll(xsGen, Gen.choose(1, 6), Gen.choose(0, 20)) {
      (xs, k, cut0) =>
        val agg = new graft.functions.MinKAggregator(k)
        val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
        val (l, r) = xs.splitAt(cut)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufL, bufR)) == xs.sorted.take(k)
    })
  }

  test("CentroidArgmax == brute-force rounded argmax; codegen == eval") {
    import org.apache.spark.sql.functions.{col, typedLit}
    val vecGen = Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 10.0f))
      .suchThat(_.exists(_ != 0f))
    check(Prop.forAll(Gen.listOfN(5, vecGen), vecGen) { (cents0, v) =>
      val cents = cents0.map(_.toArray).toArray
      val ids = cents.indices.map(_.toLong + 10).toArray
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        dot / (na * nb)
      }
      def q6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      val want = ids(cents.zipWithIndex
        .map { case (c, i) => (q6(cos(v.toArray, c)), i) }
        .reduceLeft((a, b) => if (b._1 > a._1) b else a)._2)
      // codegen path through a real projection
      val got = Seq(Tuple1(v)).toDF("emb")
        .select(graft.functions.CentroidArgmax.assign(
          col("emb"), cents, ids).as("cell"))
        .head().getLong(0)
      // interpreted eval path
      val expr = graft.functions.CentroidArgmax(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)), cents, ids)
      val evald = expr.eval(null).asInstanceOf[Long]
      got == want && evald == want
    })
  }

  test("adaptiveBits: exactly 8 at every fixture scale (the oracles' constant), grows past 16k") {
    // The DuckDB oracles for annLsh / embedNearDup / semanticDedup
    // hard-code an 8-bit bucket; this pins the Scala side to the same
    // width at every scale the correctness gate runs.
    for (n <- Seq(500L, 2000L, 5000L, 16384L))
      assert(graft.ops.Similarity.adaptiveBits(n) === 8)
    assert(graft.ops.Similarity.adaptiveBits(200000L) === 12)
    assert(graft.ops.Similarity.adaptiveBits(1L << 40) === 34)
    assert(graft.ops.Similarity.adaptiveBits(1L << 40, dim = 16) === 16) // dim cap
  }

  test("upsert is idempotent and keeps exactly one row per key") {
    check(Prop.forAll(batchGen, batchGen) { (t, b) =>
      Prop.propBoolean(t.nonEmpty && b.nonEmpty) ==> {
        def up(x: org.apache.spark.sql.DataFrame,
               y: org.apache.spark.sql.DataFrame) =
          Relational.lastWriterWins(x.unionByName(y), Seq("k", "y"),
            Seq(col("batch").desc, col("v").desc))
        val td = t.toDF("k", "y", "v", "batch")
        val bd = b.toDF("k", "y", "v", "batch")
        val once  = up(td, bd).orderBy("k", "y").collect().toSeq
        val twice = up(up(td, bd), bd).orderBy("k", "y").collect().toSeq
        val keys = once.map(r => (r.getString(0), r.getInt(1)))
        once == twice && keys.distinct == keys
      }
    })
  }
}
