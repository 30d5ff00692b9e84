package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Exact-count, bounded-buffer group collection: returns (n, items) where
  * `n` is the TRUE group size and `items` are the `cap` smallest elements
  * (by `_1`, then `_2`), sorted.
  *
  * This is the single-pass form of the "cap LSH/shingle buckets" guard:
  * a consumer filters on the exact `n` (e.g. keep 2 ≤ n ≤ cap) and, for
  * surviving groups, `items` is the COMPLETE membership (n ≤ cap ⇒
  * nothing was dropped). An over-cap mega-bucket costs O(cap) buffer per
  * task instead of O(bucket) — collect_list-then-filter would buffer the
  * whole bucket, and a count+semi-join pre-filter recomputes the
  * (expensive, md5-heavy) upstream twice (measured ~2× query cost).
  * Deterministic under any insert/merge order: the k-smallest set of
  * distinct elements is order-independent. */
class BoundedCollect(cap: Int)
    extends Aggregator[(Long, Long),
                       (Long, mutable.ArrayBuffer[(Long, Long)]),
                       (Long, Seq[(Long, Long)])] {

  private def worse(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: (Long, mutable.ArrayBuffer[(Long, Long)]) =
    (0L, mutable.ArrayBuffer.empty)

  private def insert(buf: mutable.ArrayBuffer[(Long, Long)],
                     v: (Long, Long)): mutable.ArrayBuffer[(Long, Long)] = {
    if (buf.size < cap) { buf += v }
    else {
      var worst = 0
      var i = 1
      while (i < buf.size) { if (worse(buf(i), buf(worst))) worst = i; i += 1 }
      if (worse(buf(worst), v)) buf(worst) = v
    }
    buf
  }

  override def reduce(b: (Long, mutable.ArrayBuffer[(Long, Long)]),
                      v: (Long, Long)) = (b._1 + 1, insert(b._2, v))

  override def merge(a: (Long, mutable.ArrayBuffer[(Long, Long)]),
                     b: (Long, mutable.ArrayBuffer[(Long, Long)])) = {
    b._2.foreach(insert(a._2, _))
    (a._1 + b._1, a._2)
  }

  override def finish(b: (Long, mutable.ArrayBuffer[(Long, Long)])) =
    (b._1, b._2.sorted.toSeq)

  override def bufferEncoder
      : Encoder[(Long, mutable.ArrayBuffer[(Long, Long)])] =
    Encoders.kryo[(Long, mutable.ArrayBuffer[(Long, Long)])]
  override def outputEncoder: Encoder[(Long, Seq[(Long, Long)])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Long, Seq[(Long, Long)])]()
}

object BoundedCollect {
  /** Aggregates struct(k1, k2) rows → struct(n, items). `items` holds the
    * cap smallest (k1, k2) pairs; complete when n ≤ cap. */
  def collect(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedCollect(cap))
}
