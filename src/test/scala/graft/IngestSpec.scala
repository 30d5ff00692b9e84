package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's flatten + validate semantics (database.py:96-113) on
  * A3-shaped JSON records: P1 nested extraction, P2 empty-string coalesce,
  * F2 malformed-key reject, F3 invalid-cast reject. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val records = Seq(
    // normal record
    """{"countryiso3code":"ZAF","country":{"id":"ZA","value":"South Africa"},
       "indicator":{"id":"G","value":"GDP"},"date":"2015","value":1.2}""",
    // empty iso3 → falls back to country.id (database.py:97 `or` semantics)
    """{"countryiso3code":"","country":{"id":"KE","value":"Kenya"},
       "indicator":{"id":"G","value":"GDP"},"date":"2016","value":2.5}""",
    // malformed year → rejected (database.py:107-110)
    """{"countryiso3code":"NGA","country":{"id":"NG","value":"Nigeria"},
       "indicator":{"id":"G","value":"GDP"},"date":"abc","value":3.0}""",
    // null value survives (NULL = missing is legal in the raw layer)
    """{"countryiso3code":"EGY","country":{"id":"EG","value":"Egypt"},
       "indicator":{"id":"G","value":"GDP"},"date":"2017","value":null}""")
    .map(_.replace("\n", " "))

  private lazy val flattened = {
    val df = records.toDF("json")
      .select(from_json($"json", Tables.rawApiRecordSchema).as("r"))
    df.select(
        coalesce(expr("nullif(r.countryiso3code, '')"), $"r.country.id")
          .as("iso3"),
        expr("try_cast(r.date AS INT)").as("year"),
        $"r.value".as("value"))
      .filter(length($"iso3") > 0 && $"year".isNotNull)
  }

  test("valid records flatten to (iso3, year, value)") {
    val zaf = flattened.filter($"iso3" === "ZAF").head()
    assert(zaf.getInt(1) === 2015 && zaf.getDouble(2) === 1.2)
  }

  test("empty countryiso3code coalesces to nested country.id") {
    assert(flattened.filter($"iso3" === "KE").count() === 1)
  }

  test("malformed year string is rejected, not errored (ANSI-safe)") {
    assert(flattened.filter($"iso3" === "NGA").count() === 0)
    assert(flattened.count() === 3)
  }

  test("null measure values survive the flatten (missing != invalid)") {
    assert(flattened.filter($"iso3" === "EGY").head().isNullAt(2))
  }

  test("ingest_flatten runs end-to-end on the fixture dir") {
    val r = graft.ops.Ingest.flattenValidate(spark, "/root/testdata/sf0.001")
    assert(r.count() > 0)
    // every ~11th event_id is rejected for the malformed year
    assert(r.filter(col("event_id") % 11 === 0).count() === 0)
  }
}
