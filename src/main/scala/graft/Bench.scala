package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorbs one-time session costs (codegen compiler,
    // parquet committer, shuffle service init) so per-query numbers
    // measure the queries, not JVM warmup
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    // The shared box injects multi-second noise into single observations
    // (three rounds of driver runs swung 126-317 s on an unchanged
    // binary; a trivial one-shuffle aggregate has been observed at 18 s
    // under contention vs 0.8 s steady). Run the whole suite `reps`
    // times and grade each query by its MINIMUM — the observation least
    // polluted by external load — reporting every rep's raw total
    // alongside so the number stays self-describing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // iteration aid: time a subset without paying for the whole suite
    // (the driver never sets this — full-suite totals stay comparable)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val runs: Seq[Map[String, (Double, Boolean)]] = (1 to reps).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        // noop sink: full execution of every operator without result
        // materialization, and no Catalyst pruning-under-count shortcuts
        // (a bare .count() lets the optimizer drop unreferenced projections).
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        // a query's persist()s must not subsidize later queries' reads
        spark.sharedState.cacheManager.clearCache()
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }.toMap
    }
    val best = names.map(n => n -> runs.map(_(n)._1).min)
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // "failed" makes a crash self-describing: a failed query's elapsed is
    // meaningless, so a non-empty list invalidates the total for grading.
    val failed = names.filter(n => runs.exists(!_(n)._2))
      .map(n => s"\"" + n + "\"").mkString("[", ",", "]")
    val total = best.map(_._2).sum
    val repTotals = runs.map(_.values.map(_._1).sum)
      .map(t => f"$t%.3f").mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failed,"reps":$reps,"agg":"min","rep_totals":$repTotals,"sf":"$sfDir"}"""
    println(fullLine)
    // The full-precision line above runs ~8 KB at 178 queries; a consumer
    // that keeps only a stdout tail loses its head. Persist the complete
    // record to a file and then print a COMPACT line LAST: same contract
    // keys, 3-decimal times, total/failed/reps over ALL queries, but the
    // per-query map holds only the most expensive entries that fit a
    // 2000-char stdout tail (178 full names alone exceed 3 KB, so the
    // whole map can never fit; the heavy queries are the ones whose
    // timings carry information at bench scale).
    val fullFile = s"BENCH_FULL_c$cpus.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(fullFile),
      (fullLine + "\n").getBytes("UTF-8"))
    spark.stop() // before the compact line, so no engine logging trails it
    def r3(v: Double) = f"$v%.3f"
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{"""
    def rest(k: Int) = s"""},"failed":$failed,"reps":$reps,"agg":"min",""" +
      s""""rep_totals":$repTotals,"sf":"$sfDir","queries_total":${names.size},""" +
      s""""queries_in_line":$k,"full_json":"$fullFile"}"""
    val budget = 1450 // < 2000-char tail minus sbt's trailing [success] line
    val sb = new StringBuilder(head)
    var k = 0
    val it = best.sortBy(-_._2).iterator
    var full = false
    while (it.hasNext && !full) {
      val (n, v) = it.next()
      val e = (if (k == 0) "" else ",") + "\"" + n + "\":" + r3(v)
      if (sb.length + e.length + rest(k + 1).length <= budget) { sb.append(e); k += 1 }
      else full = true
    }
    sb.append(rest(k))
    println(sb.toString)
  }
}
