package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._
import graft.batch.BatchCompiler
import graft.sources.{Admin, Sources}
import graft.stream.StreamCompiler

class SourcesAndFragmentsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  test("dedupe fragment keeps first occurrence per identity") {
    val (edges, ents) = Fragments.dedupe("in", "out", col("value") % 10)
    val topo = Topology(
      edges,
      Map("in" -> Entity.Topic("in"), "out" -> Entity.Topic("out")) ++ ents)
    // ids: 11→1, 21→1 (dup), 32→2: the ts-earliest per id survives
    val out = BatchCompiler.run(topo,
      Map("in" -> records(("a", 21, 300L), ("b", 11, 100L), ("c", 32, 200L))))("out")
    assert(kvInt(out) == Seq(("b", 11), ("c", 32)))
  }

  test("dedupe fragment dedupes arrival-ordered streams") {
    implicit val sql = spark.sqlContext
    val (edges, ents) = Fragments.dedupe("in", "out", col("value") % 10)
    val topo = Topology(
      edges,
      Map("in" -> Entity.Topic("in"), "out" -> Entity.Topic("out")) ++ ents)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, Long)]
    ms.addData(Seq(("b", 11, 100L), ("c", 32, 200L), ("a", 21, 300L)))
    val src = ms.toDF().toDF("key", "value", "__ms")
      .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
    val dfs = StreamCompiler.run(topo, Map("in" -> src))
    val q = dfs("out").writeStream.format("memory").queryName("dedupe_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    // ids 11%10=1 and 21%10=1 collide; first ARRIVAL (11) wins
    assert(kvInt(spark.table("dedupe_stream")) == Seq(("b", 11), ("c", 32)))
  }

  test("parquet topic source/sink round-trips records") {
    val dir = Files.createTempDirectory("graft-topic").toString
    val df = records(("k", 1, 100L), ("j", 2, 200L))
    Sources.writeParquetTopic(df, s"$dir/t")
    val back = Sources.parquetTopic(spark, s"$dir/t", col("key"), col("value"), col("ts"))
    assert(kvInt(back) == Seq(("j", 2), ("k", 1)))
  }

  test("topic admin config drives sink layout and provisioning specs") {
    val dir = Files.createTempDirectory("graft-admin").toString
    val out = Entity.Topic("out", partitionCount = Some(3),
      replicationFactor = Some(2))
    val rows = (1 to 40).map(i => (s"k$i", i, i * 10L))
    Sources.writeTopic(records(rows: _*), dir, out)
    // partitionCount fixes the file count — the scan-parallelism floor
    // a downstream reader sees (a Kafka topic's partition count)
    val files = new java.io.File(s"$dir/out").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files == 3)
    val back = Sources.parquetTopic(spark, s"$dir/out",
      col("key"), col("value"), col("ts"))
    assert(back.count() == 40)

    // provisioning specs: declared config + reference-example defaults
    val topo = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> Entity.Topic("in"), "s" -> Entity.KStream(), "out" -> out))
    assert(Admin.topicSpecs(topo) == Seq(
      Admin.TopicSpec("in", 1, 1, Nil),
      Admin.TopicSpec("out", 3, 2, Nil)))
    // conflicting configs for one physical topic are rejected
    val conflict = Topology(
      Seq("a" -> "s2", "s2" -> "b"),
      Map("a" -> Entity.Topic("t", partitionCount = Some(1)),
        "s2" -> Entity.KStream(),
        "b" -> Entity.Topic("t", partitionCount = Some(2))))
    intercept[IllegalArgumentException](Admin.topicSpecs(conflict))
  }

  test("writeSinks lands every sink topic with its admin config") {
    val dir = Files.createTempDirectory("graft-sinks").toString
    val topo = Topology(
      Seq("in" -> "s", "s" -> "out1", "s" -> "out2"),
      Map("in" -> Entity.Topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value") * 2))),
        "out1" -> Entity.Topic("t_out1", partitionCount = Some(2)),
        "out2" -> Entity.Topic("t_out2")))
    val results = BatchCompiler.run(topo,
      Map("in" -> records((1 to 20).map(i => (s"k$i", i, i * 10L)): _*)))
    Sources.writeSinks(topo, results, dir)
    val files1 = new java.io.File(s"$dir/t_out1").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files1 == 2)
    val back = Sources.parquetTopic(spark, s"$dir/t_out2",
      col("key"), col("value"), col("ts"))
    assert(back.count() == 20)
    // the source topic (no parents) is not written
    assert(!new java.io.File(s"$dir/in").exists())
  }

  test("co-bucketed tables join without a shuffle") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 10)).toDF("k", "rv")
    Sources.writeBucketedTable(left, "bkt_l", 4, Seq("k"), Seq("k"), Some(s"$dir/l"))
    Sources.writeBucketedTable(right, "bkt_r", 4, Seq("k"), Seq("k"), Some(s"$dir/r"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 500)
      // aggregation on the bucket key skips its exchange too
      val agg = spark.table("bkt_l").groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_l")
      spark.sql("DROP TABLE IF EXISTS bkt_r")
    }
  }

  test("file-stream topic source feeds the stream compiler") {
    val dir = Files.createTempDirectory("graft-stream-topic").toString
    val df = records(("k", 1, 100L), ("k", 2, 200L))
    Sources.writeParquetTopic(df, s"$dir/t")
    val src = Sources.fileStreamTopic(spark, s"$dir/t", df.schema,
      col("key"), col("value"), col("ts"))
    val topo = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value") * 10))),
        "out" -> Entity.Topic("out")))
    val outDf = StreamCompiler.run(topo, Map("in" -> src))("out")
    val q = outDf.writeStream.format("memory").queryName("filesrc")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(kvInt(spark.table("filesrc")) == Seq(("k", 10), ("k", 20)))
  }

  test("kafka serde wiring: wire-schema stand-in decodes to records and feeds the compiler") {
    // the spark-sql-kafka connector isn't in this sandbox; a MemoryStream
    // with Kafka's wire columns (key/value binary, timestamp) exercises
    // the exact projection kafkaStreamTopic applies to connector output
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.types._
    val valueSchema = StructType(Seq(
      StructField("amount", IntegerType), StructField("tag", StringType)))
    val ms = MemoryStream[(Array[Byte], Array[Byte], Long)]
    ms.addData(Seq(
      ("k1".getBytes("UTF-8"), """{"amount":7,"tag":"x"}""".getBytes("UTF-8"), 100L),
      ("k2".getBytes("UTF-8"), """{"amount":9,"tag":"y"}""".getBytes("UTF-8"), 200L)))
    val wire = ms.toDF().toDF("key", "value", "__ms")
      .withColumn("timestamp", timestamp_millis(col("__ms"))).drop("__ms")
    val src = Sources.decodeKafkaRecords(wire, valueSchema)
    assert(src.isStreaming)
    assert(src.columns.toSeq == Seq("key", "value", "ts"))
    // decoded records flow through a topology like any other source
    val topo = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value.amount") * 10))),
        "out" -> Entity.Topic("out")))
    val outDf = StreamCompiler.run(topo, Map("in" -> src))("out")
    val q = outDf.writeStream.format("memory").queryName("kafkasrc")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(kvInt(spark.table("kafkasrc")) == Seq(("k1", 70), ("k2", 90)))
  }

  test("kafka serde round-trip: encodeKafkaRecords inverts through decodeKafkaRecords") {
    import org.apache.spark.sql.types._
    val recs = records(("a", 5, 100L), ("b", 6, 200L))
    val encoded = Sources.encodeKafkaRecords(recs)
    assert(encoded.columns.toSeq == Seq("key", "value"))
    // a Kafka writer sends (key, value) and the broker stamps timestamp;
    // simulate the stamp, then decode with the matching envelope schema
    val wire = encoded
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"))
      .withColumn("timestamp", timestamp_millis(lit(999L)))
    val envelope = StructType(Seq(
      StructField("value", IntegerType), StructField("ts", TimestampType)))
    val back = Sources.decodeKafkaRecords(wire, envelope)
      .select(col("key"), col("value.value").as("value"))
    assert(kvInt(back) == Seq(("a", 5), ("b", 6)))
  }

  test("multimodal decodeImages runs a REAL javax.imageio codec through the seam") {
    // synthesize genuine PNG + BMP payloads with the JRE's own encoders,
    // plus a corrupt payload that must degrade to ok=false, not an error
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", out)
      out.toByteArray
    }
    // id 5: a valid PNG signature over a garbage body — the JDK reader
    // may return null OR throw a RuntimeException; either way the row
    // must degrade to ok=false, never kill the task
    val pngMagicGarbage = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ Array.tabulate[Byte](24)(i => (i * 37).toByte)
    val payloads = Seq(
      (1L, png(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB), "image/png"),
      (2L, png(3, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY), "image/png"),
      (3L, bmp(2, 9), "image/bmp"),
      (4L, Array[Byte](1, 2, 3, 4), "application/octet-stream"),
      (5L, pngMagicGarbage, "image/png"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.decodeImages(packed)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))).toMap
    assert(got(1L) == ((Some(7), Some(5), Some(3), true)))
    assert(got(2L) == ((Some(3), Some(4), Some(1), true)))
    assert(got(3L) == ((Some(2), Some(9), Some(3), true)))
    assert(got(4L) == ((None, None, None, false)))
    assert(got(5L) == ((None, None, None, false)))
  }

  test("multimodal decodeAudio runs a REAL javax.sound.sampled codec through the seam") {
    // synthesize genuine WAV payloads with the JRE's own encoder, plus a
    // corrupt payload that must degrade to ok=false, not an error
    def wav(sampleRate: Float, channels: Int, bits: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, bits, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // id 4: valid RIFF/WAVE magic over a garbage header — the JDK parser
    // may reject OR throw a RuntimeException; must degrade to ok=false
    val wavMagicGarbage = "RIFF".getBytes ++ Array[Byte](0x7f, 0, 0, 0) ++
      "WAVE".getBytes ++ Array.tabulate[Byte](20)(i => (i * 61).toByte)
    val payloads = Seq(
      (1L, wav(16000f, 1, 16, 1600), "audio/wav"),  // 100 ms mono 16 kHz
      (2L, wav(44100f, 2, 8, 441), "audio/wav"),    // 10 ms stereo 8-bit
      (3L, Array[Byte](82, 73, 70, 70, 0, 0), "application/octet-stream"),
      (4L, wavMagicGarbage, "audio/wav"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.decodeAudio(packed)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)), r.getBoolean(6))).toMap
    assert(got(1L) == ((Some(16000.0), Some(1), Some(16), Some(1600L), Some(100.0), true)))
    assert(got(2L) == ((Some(44100.0), Some(2), Some(8), Some(441L), Some(10.0), true)))
    assert(got(3L) == ((None, None, None, None, None, false)))
    assert(got(4L) == ((None, None, None, None, None, false)))
  }

  test("multimodal mapPartitions seam runs a per-partition kernel") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docs = Seq((1L, "hello"), (2L, "binary world")).toDF("doc_id", "text")
    val packed = graft.ops.Multimodal.pack(docs, col("doc_id"),
      encode(col("text"), "UTF-8"), lit("text/plain"), lit("test"))
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("n_bytes", IntegerType)))
    // stand-in decode kernel: one codec instance per partition, batched rows
    val out = graft.ops.Multimodal.mapBinaryPartitions(packed, outSchema,
      rows => rows.map(r => Row(r.getLong(0), r.getAs[Array[Byte]](1).length)))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).toMap ==
      Map(1L -> 5, 2L -> 12))
  }

  test("suppressed windowed aggregate emits only closed windows (append mode)") {
    implicit val sql = spark.sqlContext
    val topo = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "tbl" -> Entity.KTable(
          window = Some(WindowSpec.TimeWindows.tumbling(100L)),
          aggregate = Some(AggSpec.ExprAgg(sum(col("value")))),
          suppress = true),
        "out" -> Entity.Topic("out")))
    assert(StreamCompiler.modeFor(topo) == "append")
    val ms = MemoryStream[(String, Int, Long)]
    val src = ms.toDF().toDF("key", "value", "__ms")
      .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
    val dfs = StreamCompiler.run(topo, Map("in" -> src), watermarkMs = Some(0L))
    val q = dfs("tbl").writeStream.format("memory").queryName("suppressed")
      .outputMode("append").start()
    try {
      ms.addData(("k", 1, 0L), ("k", 2, 50L), ("k", 5, 500L))
      q.processAllAvailable() // watermark advances to 500 after this batch
      ms.addData(("z", 9, 100000L)) // pushes watermark past window [500,600)
      q.processAllAvailable()
    } finally q.stop()
    // closed windows: [0,100)=3 and [500,600)=5; the sentinel's own window
    // is still open and therefore suppressed
    assert(kvInt(spark.table("suppressed")) == Seq(("k", 3), ("k", 5)))
  }
}
