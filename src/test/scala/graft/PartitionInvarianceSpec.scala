package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executor-count invariance gate: every compared query must produce the
  * IDENTICAL result multiset when the shuffle partition count changes.
  *
  * This is the suite-level proof of SCALE.md's cross-engine float
  * doctrine ("holds under any executor count"): distributed sums are
  * order-sensitive at the ulp level, and any query whose output leaked
  * partition order — an unrounded float aggregate, a rank over a
  * non-total order, an approxQuantile boundary that seeped into a VALUE
  * instead of only into bucket BALANCE — would differ between the two
  * runs and fail here before it could flake the DuckDB gate on a
  * differently-partitioned cluster. 4 vs 7 partitions: co-prime, so no
  * hash bucket nests inside the other and row→reducer assignments
  * genuinely reshuffle; spark.sql.shuffle.partitions is runtime-settable
  * so both runs share one session and differ ONLY in partitioning.
  *
  * Results canonicalize through toJSON (binary → base64, doubles →
  * shortest-repr literals — bit-identity required, not tolerance) and
  * compare as sorted multisets, mirroring the driver comparator. */
class PartitionInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query's result multiset is bit-identical at 4 and 7 " +
       "shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        spark.conf.set(key, "4")
        val a = fn(spark, dir).toJSON.collect().sorted.toSeq
        spark.catalog.clearCache()
        spark.conf.set(key, "7")
        val b = fn(spark, dir).toJSON.collect().sorted.toSeq
        spark.catalog.clearCache()
        assert(a == b, s"$name drifts with the shuffle partition count: " +
          s"${a.size} vs ${b.size} rows; first diff: " +
          a.zip(b).find { case (x, y) => x != y }
            .orElse(Some((a.drop(b.size).headOption.getOrElse(""),
                          b.drop(a.size).headOption.getOrElse("")))))
      }
    } finally spark.conf.set(key, before)
  }
}
