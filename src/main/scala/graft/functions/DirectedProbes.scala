package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Budgeted best-first probe-sequence generation for the margin-directed
  * multi-probe sign-LSH search tier (Similarity.directedProbes).
  *
  * SEMANTICS (unchanged from the round-9 declarative form, which is kept
  * as `Similarity.directedProbesHof` — the executable spec, equality
  * asserted in PropertySpec): take the query's `pool` lowest-margin bit
  * positions (margin = round(|component|·1e6) as integer micro-units,
  * ties on position), rank ALL 2^pool flip subsets by
  * (total flipped margin, mask) ascending, keep the first `budget`, and
  * emit sig XOR mask for each in that order.
  *
  * WHY NATIVE: the declarative form materializes and array_sorts a
  * 2^pool struct array per query row, scoring each subset with a Θ(pool)
  * interpreted higher-order `aggregate` — Θ(2^pool·pool) interpreted ops
  * and a 2^pool allocation per row (8k structs at 24 bits, 131k at the
  * 64-bit cap; the round-9 bench's two highest CPU totals). This
  * expression generates exactly the top-budget subsets via the standard
  * multi-probe LSH successor walk (Lv et al., VLDB 2007, "Multi-Probe
  * LSH": shift/expand over the margin-sorted pool): every non-empty
  * subset has a unique parent of ≤ its score, so a min-heap best-first
  * walk emits subsets in ascending score order generating ≤ 2 successors
  * per pop — Θ((budget + boundary ties)·log budget) per row, never 2^pool.
  *
  * Tie exactness: pops are ascending in SCORE, but equal-score subsets
  * can surface in any order, so the walk keeps popping until the heap
  * min exceeds the score of the budget-th pop (every subset tied at the
  * boundary score is reachable only through ancestors of ≤ that score,
  * all of which have then been popped), then sorts the popped set by
  * (score, mask) and cuts to budget — the exact top-budget set of the
  * full ranking. Degenerate worst case (all margins equal, e.g. a zero
  * vector): the boundary tie class is the whole space and the walk
  * enumerates 2^pool — exactly the old form's cost, never worse.
  *
  * Determinism doctrine: margins are integer micro-units (float→double
  * exact; ·1e6 and half-away rounding IEEE-identical across engines), so
  * scores are order-free integer sums — the oracle's re-derived ranking
  * cannot wobble on a summation ulp. Null/short elements contribute
  * margin 0 (embeddings carry none; defined so ANSI never throws).
  */
case class DirectedProbes(left: Expression, right: Expression,
                          bits: Int, pool: Int, budget: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 64 && pool >= 1 && pool <= bits &&
          budget >= 1, s"bad directed-probe dials ($bits, $pool, $budget)")

  override def inputTypes: Seq[DataType] =
    Seq(LongType, ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "directed_probes"

  override def nullSafeEval(s: Any, e: Any): Any =
    run(s.asInstanceOf[Long], e.asInstanceOf[ArrayData])

  /** Called from both interpreted eval and generated code. */
  def run(sig: Long, emb: ArrayData): ArrayData =
    new GenericArrayData(
      DirectedProbes.compute(sig, emb, bits, pool, budget))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, e) => {
      // the walk is branch-heavy heap code — emit one call to this
      // expression instance (a reference object) so the surrounding
      // stage stays in whole-stage codegen with zero interpretation
      // overhead on the hot path
      val ref = ctx.addReferenceObj("dprobes", this,
        classOf[DirectedProbes].getName)
      s"${ev.value} = $ref.run($s, $e);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DirectedProbes {

  import org.apache.spark.sql.graft.ColumnBridge

  def probes(sig: Column, emb: Column, bits: Int, pool: Int,
             budget: Int): Column =
    ColumnBridge.column(DirectedProbes(
      ColumnBridge.expression(sig), ColumnBridge.expression(emb),
      bits, pool, budget))

  /** Heap node: flip-subset of the margin-sorted pool. `set` is the
    * pool-index bitmask (pool ≤ 64 positions but in practice ≤ 17),
    * `max` its highest pool index — the successor frontier. */
  private final class Node(val score: Long, val mask: Long,
                           val set: Long, val max: Int)

  private val nodeOrd: java.util.Comparator[Node] =
    new java.util.Comparator[Node] {
      override def compare(a: Node, b: Node): Int = {
        val c = java.lang.Long.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(a.mask, b.mask)
      }
    }

  private[graft] def compute(sig: Long, emb: ArrayData, bits: Int,
                             pool: Int, budget: Int): Array[Long] = {
    val ne = emb.numElements()
    // per-position integer micro-margins
    val m = new Array[Long](bits)
    var i = 0
    while (i < bits) {
      val x =
        if (i < ne && !emb.isNullAt(i)) emb.getFloat(i).toDouble else 0.0
      m(i) = math.round(math.abs(x) * 1e6)
      i += 1
    }
    // pool = the `pool` lowest-(margin, position) positions, in that order
    val order = Array.range(0, bits).sortBy(j => (m(j), j))
    val pm = new Array[Long](pool) // margin of pool slot t
    val pb = new Array[Long](pool) // actual signature bit of pool slot t
    var t = 0
    while (t < pool) { pm(t) = m(order(t)); pb(t) = 1L << order(t); t += 1 }

    val space = if (pool >= 62) Long.MaxValue else 1L << pool
    val want = math.min(budget.toLong, space).toInt

    // best-first walk: popped ascending in score; over-pop the boundary
    // tie class, then exact-cut by (score, mask)
    val popped = new java.util.ArrayList[Node](want + 8)
    popped.add(new Node(0L, 0L, 0L, -1)) // the empty subset (probe self)
    val heap = new java.util.PriorityQueue[Node](64, nodeOrd)
    if (pool >= 1 && want > 1)
      heap.add(new Node(pm(0), pb(0), 1L, 0))
    var boundary = Long.MaxValue
    while (!heap.isEmpty &&
           (popped.size < want || heap.peek().score <= boundary)) {
      val n = heap.poll()
      popped.add(n)
      if (popped.size == want) boundary = n.score
      val nx = n.max + 1
      if (nx < pool) {
        // expand: add pool slot nx
        heap.add(new Node(n.score + pm(nx), n.mask | pb(nx),
                          n.set | (1L << nx), nx))
        // shift: replace pool slot n.max with nx
        heap.add(new Node(n.score - pm(n.max) + pm(nx),
                          (n.mask ^ pb(n.max)) | pb(nx),
                          (n.set ^ (1L << n.max)) | (1L << nx), nx))
      }
    }
    val arr = popped.toArray(new Array[Node](popped.size))
    java.util.Arrays.sort(arr, nodeOrd)
    val out = new Array[Long](math.min(want, arr.length))
    var k = 0
    while (k < out.length) { out(k) = sig ^ arr(k).mask; k += 1 }
    out
  }
}
