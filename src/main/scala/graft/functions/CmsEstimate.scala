package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd frequency probe against a pre-built Count-Min sketch — the
  * count twin of [[BloomMightContain]]: where the Bloom probe prunes on
  * MEMBERSHIP, this prunes on estimated FREQUENCY, enabling map-side
  * heavy-hitter prefilters (drop rows whose key's estimated count can't
  * reach the support floor BEFORE they enter the exact aggregation
  * shuffle). CMS estimates never under-count, so the prune admits every
  * true heavy hitter; the exact count downstream kills the
  * over-estimated false positives — the sketch changes the dataflow,
  * never the answer.
  *
  * The sketch travels SERIALIZED inside the expression (depth×width
  * longs — a model-parameter-sized object, same deployment shape as the
  * Bloom filter and CentroidArgmax's codebook) and is deserialized once
  * per executor, not per row.
  *
  * Hash-input parity: the catalyst `count_min_sketch` aggregate (behind
  * `DataFrameStatFunctions.countMinSketch`) inserts StringType values
  * as `addBinary(utf8.getBytes)`; probing `estimateCount` with the same
  * UTF-8 bytes hits the binary-item hash path, so probe and build hash
  * identically.
  */
case class CmsEstimate(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cms", sketch,
        classOf[CountMinSketch].getName)
      s"${ev.value} = $ref.estimateCount((Object) $a.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimate {
  import org.apache.spark.sql.graft.ColumnBridge

  def estimate(c: Column, cms: CountMinSketch): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(c), cms.toByteArray))
}
