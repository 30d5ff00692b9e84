package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Cross-validation of the custom MinHash-LSH dedup against spark-mllib's
  * MinHashLSH on the same planted duplicates (SURVEY.md §2.11 X2 named
  * mllib as the off-the-shelf route; the engine ships the custom
  * SQL-expressible variant so the DuckDB oracle can check it — this spec
  * shows both find the same planted pairs). */
class MllibLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  private lazy val dir = TestFixtures.writeDir(Map(
    "documents" -> Seq(
      (0L, base, "en", "src0"),
      (1L, base, "en", "src0"),                          // exact dup of 0
      (2L, base + " omega", "en", "src0"),               // near-dup of 0/1
      (3L, "one two three four five six seven eight nine", "en", "src0"),
      (4L, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "src0"))
      .toDF("doc_id", "text", "lang", "source")))

  test("mllib MinHashLSH approxSimilarityJoin finds the same planted " +
       "near-dup pairs as the custom band-LSH") {
    val docs = Tables.t(spark, dir, "documents")
      .withColumn("sh", Dedup.shingles(col("text")))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42)
    val model = lsh.fit(feat)
    val mllibPairs = model.approxSimilarityJoin(feat, feat, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val customPairs = Dedup.minhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both must surface the exact-dup pair; neither may pair the
    // unrelated docs 3/4
    assert(mllibPairs.contains((0L, 1L)) && customPairs.contains((0L, 1L)))
    assert(!mllibPairs.contains((3L, 4L)) && !customPairs.contains((3L, 4L)))
  }
}
