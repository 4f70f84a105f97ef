package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only plan capture for the optimization rounds: writes each named
  * query's `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt`
  * under the SAME session settings as [[Bench]] (master width, shuffle
  * partitions, nanos handling), so the committed plans are the shapes the
  * bench actually executes. Usage:
  *
  *   runMain graft.PlanDump <outDir> <tag> [query ...]
  *
  * With no query names, dumps every registered query. Not part of the
  * driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $n ($tag)")
    }
    spark.stop()
  }
}
