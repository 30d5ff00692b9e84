package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two float-vector columns.
  *
  * The composable form (zip_with → aggregate, Similarity.cosine) is
  * semantically identical but materializes three intermediate arrays per
  * row; at brute-force-scoring scale (|probes|×|corpus| rows) that
  * allocation dominates. This native expression is one fused loop in
  * whole-stage codegen: no allocations, no virtual calls.
  *
  * Accumulation order (ascending index; dot/norms in separate
  * accumulators; dot/(√na·√nb)) is EXACTLY the order of the composable
  * form and of the DuckDB oracle expression, so results are bit-identical
  * — see TextSimilaritySpec.
  *
  * Null handling: a null on either side → null (BinaryExpression default);
  * null ELEMENTS are treated as 0 contribution (embeddings carry no null
  * elements; defined so the expression never throws under ANSI). A
  * ZERO-NORM vector (cosine undefined) → NULL, matching DuckDB where
  * x/0.0 is NULL — the bare double division would produce NaN, which
  * both diverges from the oracle and can never be evicted from a
  * TopKAggregator buffer (every NaN comparison is false).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $yi = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $denom =
         |  java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.types.IntegerType

  /** Column-level handle on the native expression. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level handle on the Jaro-Winkler expression. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def wrongArgs(fn: String, expected: String, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$fn`", "expectedNum" -> expected,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Arity-validated SQL builders, shared by the per-session registration
    * below and the session-build GraftExtensions route — a wrong argument
    * count is a parse-time AnalysisException, never a silent drop. */
  private[graft] def buildCosine(args: Seq[Expression]): Expression =
    args match {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _         => wrongArgs("cosine_sim", "2", args.length)
    }

  private[graft] def buildJaroWinkler(args: Seq[Expression]): Expression =
    args match {
      case Seq(a, b) => JaroWinkler(a, b)
      case _         => wrongArgs("jaro_winkler", "2", args.length)
    }

  /** shingles(text) → k=3; shingles(text, k) with an integer literal k. */
  private[graft] def buildShingles(args: Seq[Expression]): Expression =
    args match {
      case Seq(text) => Shingles(text, 3)
      case Seq(text, Literal(k: Int, IntegerType)) => Shingles(text, k)
      case Seq(_, other) =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "NON_FOLDABLE_ARGUMENT",
          messageParameters = Map(
            "funcName" -> "`shingles`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""))
      case _ => wrongArgs("shingles", "[1, 2]", args.length)
    }

  /** SQL registration: makes cosine_sim(a, b) / shingles(t[, k]) usable in
    * spark.sql text on an existing session (GraftExtensions is the
    * build-time route). */
  // Stable builder instances: registration is skipped only when the
  // registry currently serves EXACTLY these builders, so graft's
  // definition wins at every register() call — a foreign
  // createOrReplaceTempFunction that grabs the name between calls is
  // re-replaced on the next register(), instead of silently serving
  // graft's SQL forever (the failure a one-shot per-session flag had).
  // Re-registering only on mismatch still keeps the common repeated
  // register() path (every sqlText invocation) from logging a
  // "replaced a previously registered function" warning each time.
  private val cosineBuilder: Seq[Expression] => Expression = buildCosine
  private val shinglesBuilder: Seq[Expression] => Expression = buildShingles
  private val jaroWinklerBuilder: Seq[Expression] => Expression =
    buildJaroWinkler

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def current(name: String): Option[AnyRef] =
      registry.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    if (!current("cosine_sim").exists(_ eq cosineBuilder))
      registry.createOrReplaceTempFunction(
        "cosine_sim", cosineBuilder, "scala_udf")
    if (!current("shingles").exists(_ eq shinglesBuilder))
      registry.createOrReplaceTempFunction(
        "shingles", shinglesBuilder, "scala_udf")
    if (!current("jaro_winkler").exists(_ eq jaroWinklerBuilder))
      registry.createOrReplaceTempFunction(
        "jaro_winkler", jaroWinklerBuilder, "scala_udf")
  }
}
