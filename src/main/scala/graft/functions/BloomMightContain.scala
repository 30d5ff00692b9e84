package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * map-side prefilter of a bloom semi-join (the same plan shape Spark's
  * own InjectRuntimeFilter produces for shuffle-join pruning, here made
  * an explicit operator so a pipeline can prefilter against a KNOWN
  * small set, e.g. benchmark n-grams, without any join in the plan).
  *
  * The filter travels SERIALIZED (`bytes`) inside the expression — the
  * sketch is a model-parameter-sized object (~1.2 MB per million items
  * at 1% fpp), the same deployment shape as CentroidArgmax's codebook —
  * and is deserialized once per executor via the lazy val / the codegen
  * reference object, NOT per row.
  *
  * Hash-input parity: `BloomFilter.putString` is defined as
  * `putBinary(utf8Bytes)` in the public sketch library, so probing with
  * `mightContainBinary(UTF8String.getBytes)` matches items inserted by
  * either put variant (DataFrameStatFunctions.bloomFilter included).
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bloom", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainBinary($a.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.ColumnBridge

  def contains(c: Column, bf: BloomFilter): Column = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(c), out.toByteArray))
  }
}
