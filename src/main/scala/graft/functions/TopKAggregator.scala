package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Exact top-k (by similarity, id tie-break) as a typed Aggregator — the
  * scalable alternative to Window row_number ranking for top-k: the
  * window form sorts EVERY candidate row inside each partition of the
  * shuffle; this aggregator keeps a bounded k-element heap per group and
  * participates in partial aggregation, so each map task ships at most k
  * candidates per group to the reducer. For |corpus| candidates per query
  * that is k/|corpus| of the shuffle volume. Results are identical to the
  * window form when (sim, id) ordering is deterministic — asserted in
  * TextSimilaritySpec.
  *
  * (in = (sim, id); buffer = bounded collection; out = descending list.)
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)],
                       Seq[(Double, Long)]] {

  // ordering: better = higher sim, then LOWER id
  private def worseFirst(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def insert(buf: mutable.ArrayBuffer[(Double, Long)],
                     v: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    if (buf.size < k) { buf += v }
    else {
      // replace the worst element if v beats it
      var worst = 0
      var i = 1
      while (i < buf.size) { if (worseFirst(buf(i), buf(worst))) worst = i; i += 1 }
      if (worseFirst(buf(worst), v)) buf(worst) = v
    }
    buf
  }

  override def reduce(buf: mutable.ArrayBuffer[(Double, Long)],
                      v: (Double, Long)) = insert(buf, v)

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)]) = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(buf: mutable.ArrayBuffer[(Double, Long)]) =
    buf.sortWith((x, y) => worseFirst(y, x)).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Untyped-usable UDAF column: aggregates struct(sim, id) rows. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k))
}

/** Exact k-SMALLEST ids per group with a bounded buffer — the posting-
  * list-prefix shape (inverted_index keeps the first k doc ids per term).
  * Same partial-aggregation argument as TopKAggregator: a stopword term
  * whose posting list is O(corpus) still costs O(k) buffer per map task,
  * never a full collect_list of the hot key. */
class MinKAggregator(k: Int)
    extends Aggregator[Long, mutable.ArrayBuffer[Long], Seq[Long]] {

  override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

  private def insert(buf: mutable.ArrayBuffer[Long],
                     v: Long): mutable.ArrayBuffer[Long] = {
    if (buf.size < k) { buf += v }
    else {
      var worst = 0
      var i = 1
      while (i < buf.size) { if (buf(i) > buf(worst)) worst = i; i += 1 }
      if (v < buf(worst)) buf(worst) = v
    }
    buf
  }

  override def reduce(buf: mutable.ArrayBuffer[Long], v: Long) = insert(buf, v)
  override def merge(a: mutable.ArrayBuffer[Long],
                     b: mutable.ArrayBuffer[Long]) = {
    b.foreach(insert(a, _))
    a
  }
  override def finish(buf: mutable.ArrayBuffer[Long]): Seq[Long] =
    buf.sorted.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
    Encoders.kryo[mutable.ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinKAggregator {
  def minK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKAggregator(k))
}
