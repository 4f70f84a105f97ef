package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.dsl._
import graft.stream.StreamCompiler

/** Streaming STATE-AT-SCALE bench (round-12 verdict task 1): the regular
  * `StreamBench` runs 100k events over ≤1,000 keys — state far below any
  * memory pressure, so the "RocksDB is the 100 TB provider" claim in
  * `OPERATIONS.md` had architecture behind it but no measurement. This
  * suite pushes key cardinality two orders up (defaults: 2M events /
  * 500k distinct fold keys; 2M-event dedupe feed with 1M distinct ids)
  * and records, per provider, BOTH throughput and the state operator's
  * own telemetry (`stateOperators`: numRowsTotal, memoryUsedBytes, and
  * the provider's memory/size custom metrics) from the last progress
  * entry that processed data.
  *
  * Scenarios (fold = running FoldAgg table, the tableChainState custom
  * op; dedupe = unbounded first-per-id `dropDuplicates` fragment;
  * dedupe_within = bounded-horizon `dropDuplicatesWithinWatermark`
  * fragment whose state expires with the watermark):
  *   - `fold_hdfs` / `fold_rocksdb` — 2M events round-robin over 500k
  *     keys; final state = 500k fold accs.
  *   - `dedupe_hdfs` / `dedupe_rocksdb` — each id appears twice in
  *     adjacent events (1M distinct ids); unbounded seen-set state grows
  *     to 1M rows by design.
  *   - `dedupe_within_rocksdb` / `dedupe_within_hdfs` — the SAME feed
  *     under a horizon (default 20k ms on the 1 ms-spaced timeline) that
  *     still covers every adjacent duplicate pair but expires ids as the
  *     watermark passes: live state stays ~horizon-sized instead of
  *     distinct-ids-ever. The rows/memory delta vs `dedupe_*` is the
  *     measured 100 TB trade.
  *
  * RocksDB runs enable `spark.sql.streaming.stateStore.rocksdb
  * .changelogCheckpointing.enabled` — the at-scale checkpoint mode
  * (per-batch changelog uploads instead of full snapshot zips), the
  * configuration `OPERATIONS.md` prescribes for large state.
  *
  * Output: ONE JSON line
  * `{"metric":"state_scale","scenarios":{name:{"eps":…,"state_rows":…,
  * "state_mem_bytes":…,"custom":{…}}},…}`, recorded per round in
  * `BASELINE_LOCAL.json` under `streaming.state_scale`.
  *
  * (Reference analogue: Kafka Streams defaults every materialized store
  * to RocksDB precisely for this regime — willa delegates state to it
  * via `streams.clj:34-39`; this suite measures the Spark-side
  * equivalent of that default actually mattering.) */
object StateScaleBench {

  final case class Result(
      eps: Double, stateRows: Long, stateMemBytes: Long,
      custom: Map[String, Long])

  private def mkSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Drive one topology and sample the state operator's telemetry from
    * the last progress entry that actually processed data (the final
    * `processAllAvailable` can leave a trailing no-data batch as
    * `lastProgress`, whose metrics lag the drain — ADVICE r11). */
  private def drive(
      spark: SparkSession,
      topo: Topology,
      rows: Seq[(String, Long, Long)],
      sink: String,
      mode: String,
      batches: Int,
      watermarkMs: Option[Long]): Result = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, Long)]
    val src = ms.toDF().toDF("key", "value", "__ms")
      .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
    val dfs = StreamCompiler.run(topo, Map("in" -> src), watermarkMs = watermarkMs)
    val q = dfs(sink).writeStream.format("noop").outputMode(mode).start()
    val chunks = rows.grouped(math.max(1, (rows.size + batches - 1) / batches)).toSeq
    val t0 = System.nanoTime()
    var t1 = t0
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      t1 = System.nanoTime()
      val so = graft.stream.Progress.lastDataProgress(q).stateOperators
      val custom = so.flatMap { op =>
        import scala.jdk.CollectionConverters._
        op.customMetrics.asScala.collect {
          case (k, v) if k.toLowerCase.matches(".*(memory|size).*") && v != 0L =>
            k -> Long2long(v)
        }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      Result(
        rows.size / ((t1 - t0) / 1e9),
        so.map(_.numRowsTotal).sum,
        so.map(_.memoryUsedBytes).sum,
        custom)
    } finally q.stop()
  }

  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Wrap a RocksDB run with changelog checkpointing enabled, restoring
    * the prior setting after (same scoping discipline as
    * [[StreamCompiler.withStateStore]], which this composes with). */
  private def withChangelog[A](spark: SparkSession)(body: => A): A = {
    val prior = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally prior match {
      case Some(p) => spark.conf.set(ChangelogKey, p)
      case None    => spark.conf.unset(ChangelogKey)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = mkSession()
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2000000").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_KEYS", "500000").toInt
    val b = sys.env.getOrElse("SPARK_GRAFT_SCALE_BATCHES", "10").toInt
    val horizon = sys.env.getOrElse("SPARK_GRAFT_SCALE_HORIZON_MS", "20000").toLong

    val foldTopo = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "tbl" -> Entity.KTable(aggregate =
          Some(AggSpec.FoldAgg(lit(0L), (acc, v) => acc + v))),
        "out" -> Entity.Topic("out")))
    // round-robin over k keys: every micro-batch touches n/b distinct
    // state rows; final state cardinality = k
    def foldRows(n: Int): Seq[(String, Long, Long)] =
      (0 until n).map(i => (s"k${i % k}", 1L, 1000L + i))

    def dedupeTopo(within: Boolean) = {
      val (edges, ents) =
        if (within) Fragments.dedupeWithin("in", "out", col("value"))
        else Fragments.dedupe("in", "out", col("value"))
      Topology(edges,
        Map("in" -> Entity.Topic("in"), "out" -> Entity.Topic("out")) ++ ents)
    }
    // each id appears on two ADJACENT events (1 ms apart on the 1 ms
    // timeline): n/2 distinct ids, every duplicate within any horizon
    // ≥ a few ms — so bounded and unbounded variants do the same dedup
    // WORK and differ only in what they retain
    def dupRows(n: Int): Seq[(String, Long, Long)] =
      (0 until n).map(i => (s"k${i % 1000}", (i / 2).toLong, 1000L + i))

    import StreamCompiler.{withStateStore, StateStore}

    // The feeds are built once: rebuilding 2M-element vectors (with
    // per-element string interpolation) per scenario would burn seconds
    // of driver CPU and GBs of garbage six times over for identical data.
    val foldFeed = foldRows(n)
    val dupFeed = dupRows(n)

    // Warm up EVERY (topology shape × provider) one-time cost outside
    // the timed windows: each distinct plan pays codegen/analysis on its
    // first-ever run, and the first RocksDB run additionally pays native
    // library + provider init. Warming only the fold topology (as this
    // main originally did) hands each *_hdfs scenario a cold plan its
    // rocksdb twin then skips, and hands fold_rocksdb the native init —
    // systematically skewing single-run provider comparisons.
    val warmFold = foldFeed.take(2000)
    val warmDup = dupFeed.take(2000)
    drive(spark, foldTopo, warmFold, "tbl", "update", 2, None)
    drive(spark, dedupeTopo(within = false), warmDup, "out", "append", 2, None)
    drive(spark, dedupeTopo(within = true), warmDup, "out", "append", 2,
      watermarkMs = Some(horizon))
    withChangelog(spark) {
      withStateStore(spark, StateStore.RocksDB) {
        drive(spark, foldTopo, warmFold, "tbl", "update", 2, None)
      }
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Result]
    out("fold_hdfs") =
      drive(spark, foldTopo, foldFeed, "tbl", "update", b, None)
    out("fold_rocksdb") = withChangelog(spark) {
      withStateStore(spark, StateStore.RocksDB) {
        drive(spark, foldTopo, foldFeed, "tbl", "update", b, None)
      }
    }
    out("dedupe_hdfs") =
      drive(spark, dedupeTopo(within = false), dupFeed, "out", "append", b, None)
    out("dedupe_rocksdb") = withChangelog(spark) {
      withStateStore(spark, StateStore.RocksDB) {
        drive(spark, dedupeTopo(within = false), dupFeed, "out", "append", b, None)
      }
    }
    out("dedupe_within_hdfs") =
      drive(spark, dedupeTopo(within = true), dupFeed, "out", "append", b,
        watermarkMs = Some(horizon))
    out("dedupe_within_rocksdb") = withChangelog(spark) {
      withStateStore(spark, StateStore.RocksDB) {
        drive(spark, dedupeTopo(within = true), dupFeed, "out", "append", b,
          watermarkMs = Some(horizon))
      }
    }

    val scen = out.map { case (name, r) =>
      val custom = r.custom.toSeq.sortBy(_._1)
        .map { case (ck, cv) => s"\"$ck\":$cv" }.mkString("{", ",", "}")
      s""""$name":{"eps":${math.round(r.eps)},"state_rows":${r.stateRows},""" +
        s""""state_mem_bytes":${r.stateMemBytes},"custom":$custom}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"state_scale","unit":"events_per_sec",""" +
      s""""scenarios":$scen,"n":$n,"keys":$k,"batches":$b,""" +
      s""""horizon_ms":$horizon}""")
    spark.stop()
  }
}
