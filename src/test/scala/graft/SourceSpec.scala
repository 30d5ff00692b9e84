package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import graft.sources.{IndicatorTransport, IndicatorTransports}

/** DataSource V2 connector: fan-out, pagination, retry, and the
  * flatten/validate pipeline over the fetched JSON. */
class SourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic fake API: 2 pages per unit, `perPage` records per full
    * page; record i of (country, indicator) has year 2000+i and value
    * i/10. Every 7th record has an empty iso3, every 11th a bad year. */
  private class FakeApi extends IndicatorTransport {
    override def fetchPage(country: String, indicator: String, page: Int,
                           perPage: Int): (Int, Seq[String]) = {
      val recs = (0 until perPage).map { j =>
        val i = (page - 1) * perPage + j
        val iso = if (i % 7 == 0) "" else country
        val year = if (i % 11 == 0) "xx" else (2000 + i % 24).toString
        s"""{"countryiso3code":"$iso","country":{"id":"${country}_id"},""" +
          s""""indicator":{"id":"$indicator"},"date":"$year",""" +
          s""""value":${i / 10.0}}"""
      }
      (2, recs)
    }
  }

  /** Fails the first two attempts of every page, then succeeds — inside
    * the reader's 3-attempt budget. */
  private class FlakyApi extends FakeApi {
    private val tries = new ConcurrentHashMap[String, Integer]()
    override def fetchPage(c: String, i: String, p: Int,
                           per: Int): (Int, Seq[String]) = {
      val k = s"$c/$i/$p"
      val n = tries.merge(k, 1, (a, b) => a + b)
      if (n <= 2) throw new java.io.IOException(s"flaky $k try $n")
      super.fetchPage(c, i, p, per)
    }
  }

  private def read(key: String, retries: Int = 3) = {
    spark.read.format("graft.sources.IndicatorSource")
      .option("countries", "ZAF,KEN,NGA")
      .option("indicators", "GDP,UNEMP")
      .option("perPage", "10")
      .option("maxRetries", retries.toString)
      .option("transport", key)
      .load()
  }

  test("fan-out × pagination: one partition per unit, all pages fetched") {
    IndicatorTransports.register("fake", new FakeApi)
    val df = read("fake")
    assert(df.rdd.getNumPartitions === 6)       // 3 countries × 2 indicators
    assert(df.count() === 6 * 2 * 10)           // units × pages × perPage
    assert(df.groupBy("country", "indicator").count().count() === 6)
  }

  test("retry with backoff survives a transport that fails twice per page") {
    IndicatorTransports.register("flaky", new FlakyApi)
    assert(read("flaky").count() === 6 * 2 * 10)
  }

  test("an exhausted retry budget yields an empty unit, not a job failure") {
    IndicatorTransports.register("dead", new IndicatorTransport {
      def fetchPage(c: String, i: String, p: Int, per: Int) =
        throw new java.io.IOException("always down")
    })
    assert(read("dead", retries = 2).count() === 0)
  }

  test("fetched JSON flows through the declarative flatten/validate path") {
    IndicatorTransports.register("fake2", new FakeApi)
    val flat = read("fake2")
      .select(col("indicator"),
              from_json(col("json"), Tables.rawApiRecordSchema).as("r"))
      .select(col("indicator"),
        coalesce(expr("nullif(r.countryiso3code, '')"), col("r.country.id"))
          .as("iso3"),
        expr("try_cast(r.date AS INT)").as("year"),
        col("r.value").as("value"))
      .filter(length(col("iso3")) > 0 && col("year").isNotNull)
    // 20 records/unit; i ∈ {0, 11} have bad years → rejected; empty-iso3
    // records survive via the country.id fallback
    assert(flat.count() === 6 * (20 - 2))
    assert(flat.filter(col("iso3").endsWith("_id")).count() === 6 * 2) // i=7,14
  }
}
