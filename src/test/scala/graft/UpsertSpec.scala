package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.Relational

/** K2/K3 keyed-upsert semantics (database.py:119-138): last-writer-wins
  * merge + idempotence-by-construction (README1.md:128-132). */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val existing = Seq(
    ("ZAF", 2015, 1.0, 1L), ("ZAF", 2016, 2.0, 1L), ("KEN", 2015, 3.0, 1L))
    .toDF("iso3", "year", "value", "batch")

  private val incoming = Seq(
    ("ZAF", 2015, 9.9, 2L),  // conflict → update
    ("NGA", 2015, 7.0, 2L))  // new key → insert
    .toDF("iso3", "year", "value", "batch")

  private def upsert(t: org.apache.spark.sql.DataFrame,
                     b: org.apache.spark.sql.DataFrame) =
    Relational.lastWriterWins(t.unionByName(b), Seq("iso3", "year"),
      Seq(col("batch").desc))

  test("ON CONFLICT DO UPDATE: conflicting key takes the incoming value") {
    val r = upsert(existing, incoming)
    assert(r.count() === 4)
    val zaf15 = r.filter($"iso3" === "ZAF" && $"year" === 2015).collect()
    assert(zaf15.length === 1 && zaf15.head.getDouble(2) === 9.9)
  }

  test("non-conflicting rows pass through; new keys are inserted") {
    val r = upsert(existing, incoming)
    assert(r.filter($"iso3" === "ZAF" && $"year" === 2016)
      .head().getDouble(2) === 2.0)
    assert(r.filter($"iso3" === "NGA").count() === 1)
  }

  test("idempotent: re-applying the same batch converges") {
    val once  = upsert(existing, incoming)
    val twice = upsert(once, incoming)
    val a = once.orderBy("iso3", "year").collect().toSeq
    val b = twice.orderBy("iso3", "year").collect().toSeq
    assert(a === b)
  }
}
