package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key shuffle-skew probe for the token-keyed join family
  * (tokenRarity's `toks.join(vocab)`, BM25's posting join) — the r13
  * verdict asked for ONE measurement behind the documented "stopword
  * keys skew the shuffle, AQE/salting territory" note. Builds a
  * deliberately Zipfian token table (rank log-uniform over the vocab,
  * so the top token owns ~1/ln(V) of ALL occurrences) and runs the
  * exact join shape under regimes A–F2, recording per-task durations
  * and shuffle-read bytes of the join stage via listeners and whether
  * AQE's skew-split marks the executed plan:
  *
  *  A. vocab side broadcast — skew structurally impossible;
  *  B–D. broadcast off (models a beyond-broadcast vocab), the join
  *     against the SAME-QUERY aggregate, thresholds 256MB→8MB→1MB and
  *     factor 5→2: the headline finding is that OptimizeSkewedJoin
  *     NEVER FIRES here regardless of thresholds — its pattern wants a
  *     bare shuffle stage under the join's sort, and the vocab's final
  *     HashAggregate between shuffle and sort breaks the match
  *     (DEBUG-log verified: no "Optimizing skewed join" line);
  *  E/E2. vocab pre-materialized to parquet (the bare shape) — the
  *     rule fires; defaults correctly find nothing (the stopword
  *     partition compresses to ~3.5× median, under the 5× factor),
  *     and tuned 1MB/factor-2 splits it;
  *  F/F2. canonical 170 MB-partition skew — splits at pure defaults,
  *     including under a parent aggregate.
  *
  * Not part of the driver contract; the measured table lives in
  * SCALING.md (round 14). Env: `SP_DOCS` (2M), `SP_TOKENS` (50/doc),
  * `SP_VOCAB` (5M), `SP_DEBUG` (plans + adaptive DEBUG logs). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SP_DOCS", "2000000").toLong
    val perDoc = sys.env.getOrElse("SP_TOKENS", "50").toInt
    val vocab = sys.env.getOrElse("SP_VOCAB", "5000000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskMs = TrieMap.empty[Int, ArrayBuffer[Long]]
    val taskBytes = TrieMap.empty[Int, ArrayBuffer[Long]]
    @volatile var lastPlan = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = { val pl = qe.executedPlan.toString
        if (pl.contains("Join")) lastPlan = pl }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (e.taskInfo != null) {
        taskMs.getOrElseUpdate(e.stageId, ArrayBuffer.empty[Long])
          .synchronized { taskMs(e.stageId) += e.taskInfo.duration }
        if (e.taskMetrics != null)
          taskBytes.getOrElseUpdate(e.stageId, ArrayBuffer.empty[Long])
            .synchronized { taskBytes(e.stageId) +=
              e.taskMetrics.shuffleReadMetrics.totalBytesRead }
      }
    })

    // Zipf-ish token stream: u log-uniform => P(rank 1) = ln 2 / ln V.
    // Deterministic (hash-seeded), generated distributed, no text split
    // needed — the probe targets the token-keyed JOIN, which is where
    // the documented hazard lives.
    val toks = spark.range(nDocs).select(col("id").as("doc_id"),
      explode(sequence(lit(1), lit(perDoc))).as("pos"))
      .select(col("doc_id"),
        least(lit(vocab), greatest(lit(1L), exp(
          (pmod(xxhash64(col("doc_id"), col("pos")), lit(1000000L))
            .cast("double") / 1e6) * log(lit(vocab.toDouble))).cast("long")))
          .as("tok"))
    val tokTable = toks.persist()
    val n = tokTable.count()
    val hot = tokTable.filter(col("tok") === 1L).count()
    println(f"[skew] token rows=$n%,d hot-key rows=$hot%,d (${100.0 * hot / n}%.1f%%) vocab=$vocab%,d")

    def run(label: String, broadcastOff: Boolean, skewThreshold: String,
        shufflePartitions: Int, skewFactor: Int = 5): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", skewFactor)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.contains("SP_FORCE") && label.startsWith("D"))
      // production-like partition counts: at 32 the hot partition is only
      // ~2.4x the median (1/32 base + the hot key) and AQE's factor-5
      // test can never pass; a real cluster runs hundreds.
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (broadcastOff) "-1" else "1GB")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
        if (broadcastOff) "-1" else "1GB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThreshold)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        skewThreshold) // the split target must be <= the threshold to matter
      if (sys.env.contains("SP_DEBUG"))
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          "org.apache.spark.sql.execution.adaptive",
          org.apache.logging.log4j.Level.DEBUG)
      taskMs.clear(); taskBytes.clear()
      // `materializedVocab` (regime E): the vocab pre-written to parquet, so
      // the join's right child is a BARE scan→shuffle→sort — the only shape
      // OptimizeSkewedJoin's pattern accepts. Inline (A–D), the vocab's
      // FINAL aggregate sits between its shuffle and the join's sort and
      // the skew rule can never match, whatever the thresholds.
      val vocabDf =
        if (label.startsWith("E")) spark.read.parquet("/tmp/skewprobe_vocab")
        else tokTable.groupBy("tok").agg(count(lit(1)).as("tf"))
      val joined = tokTable.join(vocabDf, "tok")
        .groupBy("doc_id").agg(sum(col("tf")).as("s"))
      val t0 = System.nanoTime()
      joined.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // QueryExecutionListener dispatch is async; give it a beat
      val deadline = System.nanoTime() + 5000000000L
      while (lastPlan.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val plan = lastPlan // the WRITE's executed (post-AQE) plan, not the unexecuted twin's
      lastPlan = ""
      val skewed = plan.contains("skew=true")
      if (sys.env.contains("SP_DEBUG"))
        println(plan.linesIterator.filter(l => l.contains("Join") ||
          l.contains("ShuffleQueryStage") || l.contains("Exchange") ||
          l.contains("skew") || l.contains("AQEShuffleRead"))
          .map("[plan] " + _.trim.take(150)).mkString("\n"))
      val joinKind =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "sortmerge"
        else if (plan.contains("ShuffledHashJoin")) "shuffledhash" else "?"
      // report the two heaviest stages (join + final agg usually)
      println(f"[skew] $label%-24s wall=$wall%6.1fs join=$joinKind skew-split=$skewed")
      taskMs.toSeq.sortBy(-_._2.max).take(2).foreach { case (sid, ds) =>
        val sorted = ds.sorted
        val bs = taskBytes.getOrElse(sid, ArrayBuffer.empty[Long]).sorted
        val bmax = if (bs.nonEmpty) bs.last / 1e6 else 0.0
        val bp50 = if (bs.nonEmpty) bs(bs.size / 2) / 1e6 else 0.0
        println(f"[skew]   stage=$sid%-4d tasks=${ds.size}%4d " +
          f"max=${sorted.last / 1e3}%5.1fs p50=${sorted(ds.size / 2) / 1e3}%5.1fs " +
          f"spread=${sorted.last.toDouble / math.max(1, sorted(ds.size / 2))}%.1fx " +
          f"shufRead max=$bmax%.1fMB p50=$bp50%.1fMB")
      }
    }

    run("A-vocab-broadcast-1GB", broadcastOff = false, "256MB", 32)
    run("B-smj-default-256MB", broadcastOff = true, "256MB", 200)
    run("C-smj-threshold-8MB", broadcastOff = true, "8MB", 200)
    run("D-smj-1MB-factor2", broadcastOff = true, "1MB", 200, skewFactor = 2)
    tokTable.groupBy("tok").agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet("/tmp/skewprobe_vocab")
    run("E-bare-scan-8MB", broadcastOff = true, "8MB", 200)
    run("E2-bare-1MB-factor2", broadcastOff = true, "1MB", 200, skewFactor = 2)

    // F: the canonical textbook skew (one key = 95% of a 300 MB-raw
    // side, bare scans, no aggregates) — does OptimizeSkewedJoin fire
    // AT ALL on this build? Calibrates the instrument: if F splits and
    // A–E never do, the corpus regimes fail DETECTION (compressed
    // partition bytes under the factor×median bar), not pattern-match.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 5)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    spark.conf.set("spark.sql.shuffle.partitions", 200)
    spark.range(20000000L)
      .select(when(col("id") % 20L =!= 0L, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") * 2654435761L).as("v")) // v incompressible-ish
      .write.mode("overwrite").parquet("/tmp/skewprobe_left")
    spark.range(1000L).select(col("id").as("k"), col("id").as("w"))
      .write.mode("overwrite").parquet("/tmp/skewprobe_right")
    taskMs.clear(); lastPlan = ""
    val f = spark.read.parquet("/tmp/skewprobe_left")
      .join(spark.read.parquet("/tmp/skewprobe_right"), "k")
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"[skew] F-canonical-sanity       wall=${(System.nanoTime() - t0) / 1e9}%6.1fs " +
      s"skew-split=${ { val dl = System.nanoTime() + 5000000000L
        while (lastPlan.isEmpty && System.nanoTime() < dl) Thread.sleep(50)
        lastPlan.contains("skew=true") } }")
    taskMs.toSeq.sortBy(-_._2.max).take(2).foreach { case (sid, ds) =>
      val sorted = ds.sorted
      println(f"[skew]   stage=$sid%-4d tasks=${ds.size}%4d max=${sorted.last / 1e3}%5.1fs " +
        f"p50=${sorted(ds.size / 2) / 1e3}%5.1fs")
    }
    if (sys.env.contains("SP_DEBUG"))
      println(lastPlan.linesIterator.filter(l => l.contains("Join") ||
        l.contains("skew") || l.contains("AQEShuffleRead"))
        .map("[plan] " + _.trim.take(150)).mkString("\n"))

    // F2: the same canonical skew with tokenRarity's PARENT AGGREGATE on
    // top — if F splits and F2 doesn't, the blocker is the join sitting
    // inside a non-final stage under a downstream exchange, not detection.
    taskMs.clear(); lastPlan = ""
    val f2 = spark.read.parquet("/tmp/skewprobe_left")
      .join(spark.read.parquet("/tmp/skewprobe_right"), "k")
      .groupBy("v").agg(sum(col("w")).as("s"))
    val t2 = System.nanoTime()
    f2.write.format("noop").mode("overwrite").save()
    println(f"[skew] F2-canonical-under-agg   wall=${(System.nanoTime() - t2) / 1e9}%6.1fs " +
      s"skew-split=${ { val dl = System.nanoTime() + 5000000000L
        while (lastPlan.isEmpty && System.nanoTime() < dl) Thread.sleep(50)
        lastPlan.contains("skew=true") } }")
    taskMs.toSeq.sortBy(-_._2.max).take(2).foreach { case (sid, ds) =>
      val sorted = ds.sorted
      println(f"[skew]   stage=$sid%-4d tasks=${ds.size}%4d max=${sorted.last / 1e3}%5.1fs " +
        f"p50=${sorted(ds.size / 2) / 1e3}%5.1fs")
    }
    spark.stop()
  }
}
