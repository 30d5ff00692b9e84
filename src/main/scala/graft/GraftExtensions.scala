package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, GraftFunctions, JaroWinkler, Shingles}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions at session build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * so `SELECT cosine_sim(a, b)`, `SELECT shingles(text)` work in plain
  * SQL text on any session, including thrift/connect fronts — the
  * deployment story for the custom-function surface (the per-session
  * GraftFunctions.register covers interactive use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => GraftFunctions.buildCosine(args)))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => GraftFunctions.buildShingles(args)))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => GraftFunctions.buildJaroWinkler(args)))
    // whole-operator extension: plans graft.plans.AsOfJoinPlan to its
    // native co-partitioned merge exec (AsOf.join also self-registers
    // on sessions built without these extensions)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
