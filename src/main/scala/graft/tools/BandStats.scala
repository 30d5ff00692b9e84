package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: band-bucket size distribution of the perceptual signature
  * index at a dataset dir — the denominator behind the "expected ≤ ~64
  * per bucket" sizing claim (Multimodal.perceptualBits). Prints the
  * bucket-size histogram and Σ sz² (the in-band pair-enumeration count
  * the self-join actually performs), so skew against the uniform
  * expectation is measured, not assumed. Not part of the driver
  * contract; harmless to ship.
  *
  * Usage: SPARK_DRIVER_MEM=16g tools/run.sh graft.tools.BandStats <dir>
  */
object BandStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probedens10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.footerCount(spark, dir, "documents")
    val bits = graft.ops.Multimodal.perceptualBits(n)
    val bandW = bits / 4
    val sig = graft.ops.Multimodal.perceptualSigs(
      graft.Tables.spread(graft.Tables.t(spark, dir, "documents")), bits)
    // integer-signature band extracts — the same shift/mask convention
    // as Multimodal.bandVal (band k MSB-first at bits-(k+1)*bandW)
    def bv(k: Int) = shiftrightunsigned(col("sig"), bits - (k + 1) * bandW)
      .bitwiseAND(lit((1L << bandW) - 1))
    val buckets = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map(bv): _*)))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("sz"))
      .persist()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
      avg(col("sz")).as("avg_sz"),
      sum(col("sz") * col("sz")).as("sum_sq"),
      expr("percentile(sz, 0.5)").as("p50"),
      expr("percentile(sz, 0.99)").as("p99")).collect().head
    println(s"docs=$n bits=$bits bandW=$bandW expected<=64/bucket " +
      s"(uniform model: ${n.toDouble / (1L << bandW)}/bucket)")
    println(f"buckets=${stats.getLong(0)} avg=${stats.getDouble(2)}%.1f " +
      f"p50=${stats.getDouble(4)}%.0f p99=${stats.getDouble(5)}%.0f " +
      s"max=${stats.getLong(1)} sum_sq=${stats.getLong(3)}")
    println("top 10 buckets:")
    buckets.orderBy(col("sz").desc).limit(10).collect().foreach(r =>
      println(s"  band_id=${r.getInt(0)} band=${r.getLong(1)} " +
        s"sz=${r.getLong(2)}"))
    // the 2-band COMPOSITE blocking the engine ships (pigeonhole:
    // ham ≤ 2 leaves ≥ 2 clean bands, so some PAIR of bands is jointly
    // clean): same histogram over the 6 choose-2 packed combo keys
    val comboCols = (for (i <- 0 until 4; j <- i + 1 until 4) yield
      bv(i) * lit(1L << bandW) + bv(j)).toSeq
    val cb = sig.select(col("doc_id"), posexplode(array(comboCols: _*)))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("sz"))
      .persist()
    val cs = cb.agg(
      count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
      avg(col("sz")).as("avg_sz"),
      sum(col("sz") * col("sz")).as("sum_sq"),
      expr("percentile(sz, 0.99)").as("p99")).collect().head
    println(f"composite(6x2-band): buckets=${cs.getLong(0)} " +
      f"avg=${cs.getDouble(2)}%.1f p99=${cs.getDouble(4)}%.0f " +
      s"max=${cs.getLong(1)} sum_sq=${cs.getLong(3)}")
    spark.stop()
  }
}
