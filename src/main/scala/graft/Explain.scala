package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan of the named
  * queries (default: a representative set) so scan pruning, pushed
  * filters, broadcast joins, and whole-stage-codegen spans can be
  * inspected. Usage: runMain graft.Explain <sfDir> [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_pricing", "q02_join_global_inner", "q10_asof_left",
        "q23_dedup_ngram", "q26_sim_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
