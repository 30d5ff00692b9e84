package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codepoint cell sums of the perceptual dHash grid
  * (Multimodal.perceptualSigs): split the payload into `cells` equal
  * runs of stride = max(1, codepoints div cells) CODEPOINTS and sum the
  * codepoint values per run (runs beyond the payload sum to 0; the tail
  * past cells·stride is dropped — exactly substr's coverage).
  *
  * WHY NATIVE: the declarative round-8 form iterated the payload with
  * split(text,'') + ascii() — UTF-16 CODE UNITS, with ascii() seeing
  * surrogate halves on astral-plane characters — while the DuckDB
  * oracle's substr/len/unicode() iterate CODEPOINTS, so parity held on
  * ASCII/BMP payloads only (the documented encoding caveat). This
  * expression decodes the payload's UTF-8 bytes directly (UTF8String's
  * native storage — no String materialization, no per-character array
  * allocation): the iteration unit is the codepoint in both engines BY
  * CONSTRUCTION, so signatures are well-defined on arbitrary payloads
  * and the caveat disappears. One fused loop per row in place of the
  * interpreted split→transform→aggregate chain per CELL per row.
  */
case class PerceptualCellSums(child: Expression, cells: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(cells >= 1, s"bad cell count $cells")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "perceptual_cell_sums"

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  /** Called from both interpreted eval and generated code. */
  def run(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    // pass 1: codepoint count (UTF-8 sequence count — the same unit
    // Spark's own length() and DuckDB's length() report)
    var n = 0
    var i = 0
    while (i < b.length) {
      i += PerceptualCellSums.seqLen(b(i))
      n += 1
    }
    val stride = math.max(1, n / cells)
    val out = new Array[Long](cells)
    // pass 2: decode each codepoint, add into its cell (tail dropped)
    i = 0
    var idx = 0
    val covered = cells.toLong * stride
    while (i < b.length && idx < covered) {
      val b0 = b(i) & 0xFF
      val len = PerceptualCellSums.seqLen(b(i))
      val cp =
        if (b0 < 0x80) b0
        else if (b0 < 0xE0)
          ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F)
        else if (b0 < 0xF0)
          ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        else
          ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
            ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
      out((idx / stride).toInt) += cp
      i += len
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("pcs", this,
        classOf[PerceptualCellSums].getName)
      s"${ev.value} = $ref.run($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object PerceptualCellSums {
  import org.apache.spark.sql.graft.ColumnBridge

  /** UTF-8 sequence length from its first byte (valid UTF-8 assumed —
    * UTF8String holds valid sequences by construction). */
  @inline private[functions] def seqLen(first: Byte): Int = {
    val b0 = first & 0xFF
    if (b0 < 0x80) 1 else if (b0 < 0xE0) 2 else if (b0 < 0xF0) 3 else 4
  }

  def sums(text: Column, cells: Int): Column =
    ColumnBridge.column(
      PerceptualCellSums(ColumnBridge.expression(text), cells))
}
