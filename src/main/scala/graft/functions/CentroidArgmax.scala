package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid assignment for IVF-style ANN: returns the
  * id of the codebook centroid with the highest cosine similarity to the
  * input vector (ties → lowest centroid id, matching a
  * ROW_NUMBER(ORDER BY sim DESC, id) oracle).
  *
  * The codebook is a model parameter (C = ⌈√N⌉ rows), baked into the
  * expression as reference objects — the natural Spark shape for a
  * trained quantizer: assignment is a pure map-side projection, no
  * crossJoin against a centroid relation, no argmax aggregation, and no
  * shuffle. A `greatest()` over C struct(cosine, id) columns expresses
  * the same thing declaratively but breaks whole-stage codegen past a
  * few dozen centroids (measured: the whole stage falls back to
  * interpreted eval); this expression is one fused loop regardless of C.
  *
  * Scoring skips the input-vector norm: argmax over dot/‖c‖ equals
  * argmax over full cosine (the input norm is a positive constant per
  * row), including exact ties. Centroid norms are precomputed once.
  */
case class CentroidArgmax(child: Expression,
                          cents: Array[Array[Float]],
                          ids: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty && cents.length == ids.length)

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_argmax"

  /** ‖c‖ per centroid, accumulated in double like the scoring loop. */
  private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(e.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (e.isNullAt(i)) 0.0 else e.getFloat(i).toDouble) *
          cv(i).toDouble
        i += 1
      }
      val s = dot / norms(c)
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  float[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ($a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i))
         |            * (double) $cv[$i];
         |  }
         |  double $s = $dot / $normsRef[$c];
         |  if ($s > $bestScore) { $bestScore = $s; $best = $c; }
         |}
         |${ev.value} = $idsRef[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidArgmax {
  import org.apache.spark.sql.graft.ColumnBridge

  def assign(vec: Column, cents: Array[Array[Float]],
             ids: Array[Long]): Column =
    ColumnBridge.column(
      CentroidArgmax(ColumnBridge.expression(vec), cents, ids))
}
