package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: runs every SparkEntry query N times in one session
  * and prints per-run times, separating first-run cost (planning + codegen
  * + cache population) from steady-state execution. Not part of the driver
  * contract — use `graft.Bench` for the official number. */
object BenchDev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val only = args.toSet
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B knob: SPARK_GRAFT_CONF="k=v;k2=v2" injects session confs so
    // config experiments don't need a recompile
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k.trim, v.trim)
          case _ => sys.error(s"bad SPARK_GRAFT_CONF entry (need k=v): '$kv'")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_STAGES_MIN (seconds, default 0.5) floors which stages
    // print — drop it to see stages a fix made FAST (the spread-verify
    // evidence runs under the default threshold after the fix)
    val stageMin = sys.env.getOrElse("SPARK_GRAFT_STAGES_MIN", "0.5").toDouble
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          if (wall > stageMin) {
            val m = i.taskMetrics
            println(f"[stage] ${i.stageId}%4d wall=$wall%6.2f tasks=${i.numTasks}%3d " +
              f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
              f"gc=${m.jvmGCTime / 1e3}%6.2f ${i.name.takeWhile(_ != '(')}")
          }
        }
      })
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.contains))
    val rows = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[benchdev] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache() // don't let persists leak across queries
        dt
      }
      println(f"$name%-24s ${times.map(t => f"$t%8.2f").mkString(" ")}")
      name -> times
    }
    val firsts = rows.map(_._2.head).sum
    val lasts = rows.map(_._2.last).sum
    println(f"TOTAL first=$firsts%.1f last=$lasts%.1f")
    spark.stop()
  }
}
