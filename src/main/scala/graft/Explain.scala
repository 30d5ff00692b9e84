package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan inspection: dump the formatted physical plan of every query so
  * pushdown / pruning / join strategy / codegen coverage can be reviewed
  * (and regressions spotted in review). Usage:
  *   tools/run.sh graft.Explain <sfDir> <outFile>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    // optional comma-separated query filter (probe-decade dumps price
    // model fits at DataFrame construction, so a full-surface dump
    // against a 60M-row dir is not free — dump just the asked family)
    val only = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // GraftSession, not a raw builder: dumped plans must reflect the
    // exact session settings Verify/Bench execute under
    val spark = GraftSession.builder("local[4]", shufflePartitions = Some(4))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }
      .foreach { case (name, fn) =>
      sb.append(s"\n========== $name ==========\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
