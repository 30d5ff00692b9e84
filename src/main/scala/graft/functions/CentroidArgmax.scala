package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid assignment for IVF-style ANN: returns the
  * id of the codebook centroid with the highest cosine similarity to the
  * input vector. Similarities are quantized to 6 dp before comparison
  * and ties break to the LOWEST centroid id — the repo's ranking
  * doctrine (SCALE.md, determinism section: rank on ROUNDED measures
  * with id tie-breaks), matching a
  * ROW_NUMBER(ORDER BY round(sim, 6) DESC, id) oracle exactly; raw-ulp
  * comparison would let engine-level arithmetic differences flip
  * near-tied assignments.
  *
  * The codebook is a model parameter (C = ⌈√N⌉ rows), baked into the
  * expression as reference objects — the natural Spark shape for a
  * trained quantizer: assignment is a pure map-side projection, no
  * crossJoin against a centroid relation, no argmax aggregation, and no
  * shuffle. A `greatest()` over C struct(cosine, id) columns expresses
  * the same thing declaratively but breaks whole-stage codegen past a
  * few dozen centroids (measured: the whole stage falls back to
  * interpreted eval); this expression is one fused loop regardless of C.
  */
case class CentroidArgmax(child: Expression,
                          cents: Array[Array[Double]],
                          ids: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty && cents.length == ids.length)

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_argmax"

  /** ‖c‖ per centroid, accumulated in double like the scoring loop. */
  private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    var en = 0.0
    var j = 0
    val ne = e.numElements()
    while (j < ne) {
      val x = if (e.isNullAt(j)) 0.0 else e.getFloat(j).toDouble
      en += x * x
      j += 1
    }
    val enorm = math.sqrt(en)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(ne, cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (e.isNullAt(i)) 0.0 else e.getFloat(i).toDouble) * cv(i)
        i += 1
      }
      // full cosine, then 6-dp half-up (away from zero) quantization —
      // identical formula in doGenCode below
      val raw = dot / (enorm * norms(c))
      val s = math.signum(raw) * math.floor(math.abs(raw) * 1e6 + 0.5) / 1e6
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      val en = ctx.freshName("en")
      val ne = ctx.freshName("ne")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val enorm = ctx.freshName("enorm")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val raw = ctx.freshName("raw")
      val s = ctx.freshName("s")
      s"""
         |int $ne = $a.numElements();
         |double $en = 0.0;
         |for (int $j = 0; $j < $ne; $j++) {
         |  double $x = $a.isNullAt($j) ? 0.0 : (double) $a.getFloat($j);
         |  $en += $x * $x;
         |}
         |double $enorm = java.lang.Math.sqrt($en);
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($ne, $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ($a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i))
         |            * $cv[$i];
         |  }
         |  double $raw = $dot / ($enorm * $normsRef[$c]);
         |  double $s = java.lang.Math.signum($raw)
         |    * java.lang.Math.floor(java.lang.Math.abs($raw) * 1e6 + 0.5)
         |    / 1e6;
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

  /** Codebook of raw fixture vectors (float→double is exact, so oracle
    * parity is unaffected by the widening). */
  def assign(vec: Column, cents: Array[Array[Float]],
             ids: Array[Long]): Column =
    assignD(vec, cents.map(_.map(_.toDouble)), ids)

  /** Codebook of COMPUTED centroids (e.g. k-means cluster means) — these
    * are double-precision model parameters; narrowing them to float would
    * perturb 6-dp-rounded cosine scores away from a double-computing
    * oracle. */
  def assignD(vec: Column, cents: Array[Array[Double]],
              ids: Array[Long]): Column =
    ColumnBridge.column(
      CentroidArgmax(ColumnBridge.expression(vec), cents, ids))
}
