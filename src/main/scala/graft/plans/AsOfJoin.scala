package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Native AS-OF join — the whole-operator Catalyst extension path
  * (LogicalPlan + SparkStrategy + SparkPlan, registered through
  * GraftExtensions): for every left probe row, the single most recent
  * right row at-or-before it in event time, per key.
  *
  * The window-composed form (Events.asofJoin) expresses the SINGLE-TABLE
  * as-of well; this operator is the genuine two-TABLE trades⋈quotes
  * shape, where the window trick would first have to union the tables
  * into one stream and carry every probe column through the shuffle as
  * nullable baggage. Here each side shuffles once on the key,
  * EnsureRequirements co-partitions and sorts both children
  * ((key, ts, id) — declared, not hand-built), and doExecute is a
  * single O(n) forward merge per partition holding O(1) state: the
  * last-seen right row's primitives. Nothing is buffered, nothing is
  * quadratic, and the sort-merge machinery (spilling sorts, AQE-sized
  * exchanges) is Spark's own.
  *
  * Column contract (positional, enforced by the AsOf.join builder):
  *   left  = (event_id, user_id, ts, ...),  right = (user_id, ts,
  *   event_id, value). Ties at equal ts resolve to the right row with
  *   the largest event_id — the merge keeps the LAST row in (ts, id)
  *   scan order, mirrored in the oracle's ORDER BY ts DESC, id DESC.
  *
  * The required distribution pins the exchange partition count
  * (conf.numShufflePartitions): the two children must stay partition-
  * aligned for zipPartitions, so AQE must not coalesce one side
  * independently of the other. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        asofTs: Attribute, asofValue: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofTs :+ asofValue
  // the as-of columns are GENERATED here, not references to the children
  // (QueryPlan reflects Attribute-typed constructor args into
  // `expressions`; without this, CheckAnalysis demands they resolve
  // against the children's outputs)
  override def producedAttributes: AttributeSet =
    AttributeSet(asofTs :: asofValue :: Nil)
  // every child column is load-bearing (the merge is positional), so
  // column pruning must not project the children — without this the
  // node's references are empty and ColumnPruning strips the inputs
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.output) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        override val output: Seq[Attribute])
    extends BinaryExecNode {

  override def producedAttributes: AttributeSet =
    AttributeSet(output.takeRight(2))

  // both sides cluster on the key with a FIXED partition count so the
  // children stay mutually partition-aligned (see class doc)
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(SQLConf.get.numShufflePartitions)
    ClusteredDistribution(Seq(left.output(1)), requiredNumPartitions = n) ::
    ClusteredDistribution(Seq(right.output(0)), requiredNumPartitions = n) ::
    Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(1), Ascending),
        SortOrder(left.output(2), Ascending),
        SortOrder(left.output(0), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
        SortOrder(right.output(1), Ascending),
        SortOrder(right.output(2), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(out, out)
      val extra = new GenericInternalRow(2)
      val joined = new JoinedRow
      // O(1) merge state: the pending (unconsumed) right row's fields
      // and the last right row consumed for the current key run
      var rPending = false
      var rKey = 0L; var rTs = 0L
      var rVal = 0.0; var rValNull = false
      var haveLast = false
      var lastKey = 0L; var lastTs = 0L
      var lastVal = 0.0; var lastValNull = false
      lIt.map { l =>
        // NULL never satisfies an as-of predicate (SQL join semantics —
        // and the DuckDB oracle's): a NULL probe key/ts emits no-match
        // without touching the merge state, and a NULL build key/ts is
        // skipped below. Reading them positionally as getLong would
        // silently coerce NULL to 0 / epoch and invent matches.
        val lNull = l.isNullAt(1) || l.isNullAt(2)
        val lKey = if (lNull) 0L else l.getLong(1)
        val lTs = if (lNull) 0L else l.getLong(2)
        var done = lNull
        while (!done) {
          if (!rPending) {
            if (rIt.hasNext) {
              val r = rIt.next()
              if (!(r.isNullAt(0) || r.isNullAt(1))) {
                rKey = r.getLong(0); rTs = r.getLong(1)
                rValNull = r.isNullAt(3)
                rVal = if (rValNull) 0.0 else r.getDouble(3)
                rPending = true
              } // else: NULL-keyed build row — drop, pull the next one
            } else done = true
          }
          if (rPending) {
            // consume while the right row is at-or-before the probe —
            // equal-ts rows all consume, so the LAST (max id) wins
            if (rKey < lKey || (rKey == lKey && rTs <= lTs)) {
              haveLast = true; lastKey = rKey; lastTs = rTs
              lastVal = rVal; lastValNull = rValNull
              rPending = false
            } else done = true
          }
        }
        if (!lNull && haveLast && lastKey == lKey) {
          extra.update(0, lastTs)
          if (lastValNull) extra.setNullAt(1) else extra.update(1, lastVal)
        } else { extra.setNullAt(0); extra.setNullAt(1) }
        proj(joined(l, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public builder: AsOf.join(probe, build) with the positional contract
  * documented on AsOfJoinPlan. Registers the planner strategy
  * idempotently for sessions not built through GraftSession (whose
  * extensions already inject it). */
object AsOf {
  private val strategyLock = new Object

  /** Fallback registration for sessions NOT built through GraftSession:
    * a session whose `spark.sql.extensions` names GraftExtensions already
    * carries AsOfJoinStrategy as an injected planner strategy, so
    * appending it to extraStrategies would plan every as-of twice (the
    * planner takes the first candidate, but the duplicate work and the
    * read-modify-write race remain). The lock serializes the
    * check-then-append for plain sessions. */
  def ensureStrategy(spark: SparkSession): Unit = strategyLock.synchronized {
    val viaExtensions = spark.conf
      .getOption("spark.sql.extensions")
      .exists(_.contains(classOf[graft.GraftExtensions].getName))
    if (!viaExtensions) {
      val es = spark.experimental.extraStrategies
      if (!es.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = es :+ AsOfJoinStrategy
    }
  }

  def join(probe: DataFrame, build: DataFrame): DataFrame = {
    val spark = probe.sparkSession
    ensureStrategy(spark)
    val l = probe.queryExecution.analyzed
    val r = build.queryExecution.analyzed
    // the merge reads POSITIONALLY (getLong/getDouble by index), so a
    // mis-ordered or mis-typed input must fail loudly here — not emit
    // plausible-looking wrong matches
    def isTs(dt: org.apache.spark.sql.types.DataType) =
      dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType
    require(l.output.length >= 3 && r.output.length == 4,
      "asof contract: left (event_id, user_id, ts, ...), " +
        "right (user_id, ts, event_id, value)")
    require(l.output(0).dataType == LongType &&
        l.output(1).dataType == LongType && isTs(l.output(2).dataType),
      s"asof left contract (long id, long key, timestamp ts), got " +
        l.output.take(3).map(_.dataType.simpleString).mkString(", "))
    require(r.output(0).dataType == LongType &&
        isTs(r.output(1).dataType) && r.output(2).dataType == LongType &&
        r.output(3).dataType == DoubleType,
      s"asof right contract (long key, timestamp ts, long id, double " +
        s"value), got " +
        r.output.map(_.dataType.simpleString).mkString(", "))
    require(l.output(2).dataType == r.output(1).dataType,
      "asof: probe and build timestamp types must match")
    val plan = AsOfJoinPlan(l, r,
      AttributeReference("asof_ts", r.output(1).dataType, nullable = true)(),
      AttributeReference("asof_value", DoubleType, nullable = true)())
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, plan)
  }
}
