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

  test("streaming sink E2E: topology → encodeKafkaRecords → writeStream in all three modes") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types._
    // one full topology per output mode modeFor can produce: the wire
    // encoding must survive append (stateless), update (fold state op),
    // and complete (native streaming agg) end-to-end
    val wireSchema = StructType(Seq(StructField("value", IntegerType),
      StructField("ts", TimestampType)))
    def runE2E(topo: Topology, rows: Seq[(String, Int, Long)],
        expectMode: String): Seq[(String, Int)] = {
      assert(graft.stream.StreamCompiler.modeFor(topo) == expectMode)
      val ms = MemoryStream[(String, Int, Long)]
      ms.addData(rows)
      val src = ms.toDF().toDF("key", "value", "__ms")
        .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
      val dfs = graft.stream.StreamCompiler.run(topo, Map("in" -> src))
      val wire = graft.sources.Sources.encodeKafkaRecords(dfs("out"))
      val name = s"sink_e2e_$expectMode"
      val q = wire.writeStream.format("memory").queryName(name)
        .outputMode(expectMode).start()
      try { q.processAllAvailable() } finally q.stop()
      // decode the wire rows back: key string + JSON (value, ts)
      spark.table(name)
        .select(col("key"),
          from_json(col("value"), wireSchema).getField("value").as("v"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    }
    val rows = Seq(("a", 1, 1000L), ("a", 2, 2000L), ("b", 5, 1500L))
    // append: stateless map
    val tAppend = Topology(
      Seq("in" -> "up", "up" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "up" -> Entity.KStream(Some(Xform.MapValue(col("value") * 10))),
        "out" -> Entity.Topic("out")))
    assert(runE2E(tAppend, rows, "append") ==
      Seq(("a", 10), ("a", 20), ("b", 50)))
    // update: FoldAgg state op emits the running changelog
    val tUpdate = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "tbl" -> Entity.KTable(aggregate =
          Some(AggSpec.FoldAgg(lit(0), (acc, v) => acc + v))),
        "out" -> Entity.Topic("out")))
    assert(runE2E(tUpdate, rows, "update") ==
      Seq(("a", 1), ("a", 3), ("b", 5)))
    // complete: native streaming aggregation snapshot
    val tComplete = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "tbl" -> Entity.KTable(aggregate =
          Some(AggSpec.ExprAgg(sum(col("value")).cast("int")))),
        "out" -> Entity.Topic("out")))
    assert(runE2E(tComplete, rows, "complete") ==
      Seq(("a", 3), ("b", 5)))
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

  test("multimodal resizeImages scales real pixels, preserves aspect, never upscales") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val payloads = Seq(
      (1L, png(100, 40), "image/png"), // downscale to 50x20
      (2L, png(8, 6), "image/png"),    // small enough: passthrough
      (3L, Array[Byte](9, 9, 9), "application/octet-stream"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.resizeImages(packed, 50)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4),
          Option(r.getAs[Array[Byte]](1)))).toMap
    assert(got(1L)._1 == Some(50) && got(1L)._2 == Some(20) && got(1L)._3)
    // the resized payload is a REAL decodable PNG with the new dims
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L)._4.get))
    assert(back.getWidth == 50 && back.getHeight == 20)
    assert(got(2L)._1 == Some(8) && got(2L)._2 == Some(6))
    assert(got(3L) == ((None, None, false, None)))
  }

  test("multimodal extractImageFeatures computes real channel means and entropy") {
    // half pure red, half pure blue, 4x2: mean_r = mean_b = 127.5,
    // mean_g = 0; two equally-likely luma bins → entropy exactly 1 bit
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val payloads = Seq((1L, out.toByteArray, "image/png"),
      (2L, Array[Byte](1, 2), "application/octet-stream"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.extractImageFeatures(packed)
      .collect().map(r => r.getLong(0) -> r).toMap
    val f = got(1L)
    assert(math.abs(f.getDouble(1) - 127.5) < 1e-9) // mean_r
    assert(f.getDouble(2) == 0.0)                   // mean_g
    assert(math.abs(f.getDouble(3) - 127.5) < 1e-9) // mean_b
    assert(math.abs(f.getDouble(5) - 1.0) < 1e-9)   // 2-bin entropy = 1 bit
    assert(f.getBoolean(6))
    assert(!got(2L).getBoolean(6))
  }

  test("multimodal extractAudioFeatures decodes real PCM and computes rms/peak/zcr") {
    // a 16-bit mono square wave alternating ±16384: rms = peak = 0.5,
    // a zero crossing at every sample boundary → zcr → 1
    val n = 1000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i % 2 == 0) 16384 else -16384
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val payloads = Seq((1L, out.toByteArray, "audio/wav"),
      (2L, Array[Byte](0, 1, 2), "application/octet-stream"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.extractAudioFeatures(packed)
      .collect().map(r => r.getLong(0) -> r).toMap
    val f = got(1L)
    assert(math.abs(f.getDouble(1) - 0.5) < 1e-6)  // rms
    assert(math.abs(f.getDouble(2) - 0.5) < 1e-6)  // peak
    assert(f.getDouble(3) > 0.99)                  // zcr ~ 1
    assert(f.getLong(4) == n.toLong)
    assert(f.getBoolean(5))
    assert(!got(2L).getBoolean(5))
  }

  test("multimodal probeVideo parses REAL hand-built MP4 box trees (and degrades on garbage)") {
    import java.nio.ByteBuffer
    // build a genuine ISO-BMFF tree per the public 14496-12 layout:
    // ftyp(isom) + moov[ mvhd(v0, timescale 1000, duration 5000) +
    // trak[tkhd(v0, 640x360 as 16.16)] + trak[tkhd(v0, 0x0 audio)] ]
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val mvhd = {
      val p = ByteBuffer.allocate(100)
      p.putInt(0)             // version 0 + flags
      p.putInt(1); p.putInt(2) // ctime, mtime
      p.putInt(1000)          // timescale
      p.putInt(5000)          // duration → 5000 ms
      box("mvhd", p.array())
    }
    def tkhd(w: Int, h: Int) = {
      val p = ByteBuffer.allocate(84)
      p.putInt(0)                        // version 0 + flags
      p.putInt(1); p.putInt(2); p.putInt(1); p.putInt(0); p.putInt(5000)
      p.position(76)
      p.putInt(w << 16); p.putInt(h << 16) // 16.16 fixed-point dims
      box("tkhd", p.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd(640, 360)) ++ box("trak", tkhd(0, 0)))
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 1))
    val mp4 = ftyp ++ moov
    // truncated moov: valid ftyp, malformed box sizes — must not throw
    val truncated = ftyp ++ box("moov", Array[Byte](0, 0, 0, 99, 'm', 'v', 'h', 'd'))
    val payloads = Seq(
      (1L, mp4, "video/mp4"),
      (2L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16), "application/octet-stream"),
      (3L, truncated, "video/mp4"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.probeVideo(packed)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)), r.getBoolean(6))).toMap
    assert(got(1L) == ((Some("isom"), Some(5000.0), Some(640L), Some(360L), Some(2), true)))
    assert(got(2L) == ((None, None, None, None, None, false)))
    // malformed interior boxes: parse stops cleanly, brand still read
    assert(got(3L)._1 == Some("isom") && got(3L)._6 == true)

    // nested size-0 box: ISO 14496-12 permits "extends to EOF" only for
    // the LAST TOP-LEVEL box — a size-0 box INSIDE moov is malformed and
    // must stop the walk, NOT swallow its following siblings as payload
    // (ADVICE r9). A size-0 trak would otherwise cover the raw tkhd
    // bytes after it and hallucinate a track + dims from them.
    val sizeZeroNested = box("moov",
      ByteBuffer.allocate(8).putInt(0).put("trak".getBytes("US-ASCII")).array() ++
        tkhd(640, 360))
    val withNested = graft.ops.Multimodal.parseMp4(ftyp ++ sizeZeroNested)
    assert(withNested.exists(r => r._1 == "isom" && r._3.isEmpty && r._5 == 0))
    val lastTopLevelZero = ftyp ++
      ByteBuffer.allocate(8).putInt(0).put("moov".getBytes("US-ASCII")).array() ++
      mvhd ++ box("trak", tkhd(320, 240))
    val topZero = graft.ops.Multimodal.parseMp4(lastTopLevelZero)
    assert(topZero.exists(r => r._1 == "isom" && r._2 == Some(5000.0) &&
      r._3 == Some(320L) && r._4 == Some(240L)))

    // NON-last top-level size-0 box (a zero-size `free` before moov) is
    // malformed per §4.2 (size-0 is legal only for the last box). The walk
    // terminates DELIBERATELY at the size-0 box — the moov bytes are inside
    // its claimed payload, so they are not emitted as a sibling — and
    // metadata degrades to None while the brand read before it survives
    // (ADVICE r10).
    val freeZeroBeforeMoov = ftyp ++
      ByteBuffer.allocate(8).putInt(0).put("free".getBytes("US-ASCII")).array() ++
      moov
    val zeroMid = graft.ops.Multimodal.parseMp4(freeZeroBeforeMoov)
    assert(zeroMid.exists(r => r._1 == "isom" && r._2.isEmpty &&
      r._3.isEmpty && r._4.isEmpty && r._5 == 0))
  }

  test("multimodal parseMp3 uses the Xing/Info frame count for VBR and skips ID3v1 footers") {
    // MPEG1 LIII 128 kbps 44100 Hz joint stereo header (as above)
    val frameHdr = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x40.toByte)
    // Xing header: after 32 bytes of MPEG1-stereo side info; flags bit 0
    // set, frame count 441 → 441 * 1152 / 44100 = 11520 ms exactly —
    // byte-count estimation at 128 kbps would give a wildly smaller value
    val xing = new Array[Byte](32) ++ "Xing".getBytes ++
      Array[Byte](0, 0, 0, 1) ++ // flags: frames present
      java.nio.ByteBuffer.allocate(4).putInt(441).array()
    val vbr = frameHdr ++ xing ++ new Array[Byte](2000)
    val gotVbr = graft.ops.Multimodal.parseMp3(vbr)
    assert(gotVbr.exists(r => math.abs(r._5 - 11520.0) < 1e-6))
    // "Info" (LAME CBR tag) resolves the same exact way
    val info = vbr.clone()
    "Info".getBytes.copyToArray(info, 4 + 32)
    assert(graft.ops.Multimodal.parseMp3(info).exists(r => math.abs(r._5 - 11520.0) < 1e-6))
    // CRC-protected frame (protection bit CLEAR, 0xFA): a 16-bit CRC
    // sits between header and side info, shifting the Xing tag 2 bytes
    // — the lookup must skip it or fall back to the wrong CBR estimate
    val crcHdr = Array[Byte](0xff.toByte, 0xfa.toByte, 0x90.toByte, 0x40.toByte)
    val crcVbr = crcHdr ++ Array[Byte](0, 0) ++ xing ++ new Array[Byte](2000)
    assert(graft.ops.Multimodal.parseMp3(crcVbr).exists(r => math.abs(r._5 - 11520.0) < 1e-6))
    // no Xing: a trailing 128-byte ID3v1 "TAG" footer is metadata, not
    // audio — 1600 audio bytes at 128 kbps stays exactly 100 ms with the
    // footer appended
    val cbr = frameHdr ++ new Array[Byte](1600 - 4) ++
      ("TAG".getBytes ++ new Array[Byte](125))
    assert(graft.ops.Multimodal.parseMp3(cbr).exists(r => math.abs(r._5 - 100.0) < 1e-6))
  }

  test("multimodal probeMp3 parses REAL MPEG frame headers behind an ID3 tag") {
    // MPEG1 Layer III, 128 kbps, 44100 Hz, joint stereo:
    // 0xFF 0xFB (sync + v1 + LIII + noCRC) 0x90 (brIdx 9, srIdx 0) 0x40
    val frameHdr = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x40.toByte)
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 0) // 10-byte tag, size 0
    // 1600 audio bytes at 128 kbps → exactly 100 ms CBR estimate
    val mp3 = id3 ++ frameHdr ++ new Array[Byte](1600 - 4)
    // mono MPEG2 variant: 0xFF 0xF3 (v2, LIII), brIdx 1 (8 kbps), srIdx 0
    // (22050), mode 11 (mono)
    val mp3v2 = Array[Byte](0xff.toByte, 0xf3.toByte, 0x10.toByte, 0xc0.toByte) ++
      new Array[Byte](96)
    val payloads = Seq(
      (1L, mp3, "audio/mpeg"),
      (2L, mp3v2, "audio/mpeg"),
      (3L, Array[Byte](0x12, 0x34, 0x56, 0x78), "application/octet-stream"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.probeMp3(packed)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)), r.getBoolean(6))).toMap
    assert(got(1L) == ((Some("MPEG1"), Some(128), Some(44100), Some(2), Some(100.0), true)))
    assert(got(2L)._1 == Some("MPEG2"))
    assert(got(2L)._2 == Some(8) && got(2L)._3 == Some(22050) && got(2L)._4 == Some(1))
    assert(got(3L) == ((None, None, None, None, None, false)))
  }

  test("multimodal probeWebp parses REAL VP8/VP8L/VP8X headers") {
    import java.nio.{ByteBuffer, ByteOrder}
    def riff(chunk: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(20 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(12 + payload.length).put("WEBP".getBytes)
        .put(chunk.getBytes).putInt(payload.length).put(payload)
      bb.array()
    }
    // VP8X: 4 flag bytes + le24(w-1) + le24(h-1): 800x600
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0) ++
      Array[Byte]((799 & 0xff).toByte, ((799 >> 8) & 0xff).toByte, 0, // le24 799
        (599 & 0xff).toByte, ((599 >> 8) & 0xff).toByte, 0))          // le24 599
    // VP8L: 0x2F then le32 bits: (w-1) in 14 bits, (h-1) next 14: 5x7
    val vp8lBits = (5 - 1) | ((7 - 1) << 14)
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (vp8lBits & 0xff).toByte, ((vp8lBits >> 8) & 0xff).toByte,
      ((vp8lBits >> 16) & 0xff).toByte, ((vp8lBits >> 24) & 0xff).toByte))
    // VP8 lossy: 3-byte frame tag, 9D 01 2A start code, le16 w, le16 h: 4x3
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      4, 0, 3, 0))
    val payloads = Seq(
      (1L, vp8x, "image/webp"), (2L, vp8l, "image/webp"), (3L, vp8, "image/webp"),
      (4L, "RIFF????WAVE".getBytes ++ new Array[Byte](20), "audio/wav"))
      .toDF("doc_id", "bytes", "mime")
    val packed = graft.ops.Multimodal.pack(payloads, col("doc_id"),
      col("bytes"), col("mime"), lit("test"))
    val got = graft.ops.Multimodal.probeWebp(packed)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))).toMap
    assert(got(1L) == ((Some("extended"), Some(800L), Some(600L), true)))
    assert(got(2L) == ((Some("lossless"), Some(5L), Some(7L), true)))
    assert(got(3L) == ((Some("lossy"), Some(4L), Some(3L), true)))
    assert(got(4L) == ((None, None, None, false)))
  }

  test("multimodal container parsers survive byte-level fuzzing") {
    // every truncation/corruption of valid payloads must return cleanly
    // (Some or None), never throw — one bad payload can't kill a scan
    val rnd = new scala.util.Random(42)
    def fuzz(base: Array[Byte]): Seq[Array[Byte]] =
      (0 to 40).map { i =>
        val b = base.take(rnd.nextInt(base.length + 1))
        if (b.nonEmpty && i % 2 == 0) b.updated(rnd.nextInt(b.length), rnd.nextInt(256).toByte)
        else b
      }
    // ftyp + moov containing an EMPTY mvhd leaf ending exactly at EOF:
    // the parser must length-check before reading the version byte
    val emptyLeaf = java.nio.ByteBuffer.allocate(28)
      .putInt(12).put("ftypisom".getBytes)
      .putInt(16).put("moov".getBytes)
      .putInt(8).put("mvhd".getBytes).array()
    assert(graft.ops.Multimodal.parseMp4(emptyLeaf).exists(_._1 == "isom"))
    val mp4ish = "....ftypisom....".getBytes ++ Array.fill(64)(rnd.nextInt(256).toByte)
    val mp3ish = "ID3".getBytes ++ Array.fill(64)(rnd.nextInt(256).toByte)
    val webpish = "RIFF....WEBPVP8X".getBytes ++ Array.fill(32)(rnd.nextInt(256).toByte)
    (fuzz(mp4ish) ++ fuzz(mp3ish) ++ fuzz(webpish)).foreach { b =>
      graft.ops.Multimodal.parseMp4(b)
      graft.ops.Multimodal.parseMp3(b)
      graft.ops.Multimodal.parseWebp(b)
    }
    succeed
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

  test("idempotentBatchWriter skips re-delivered batches, across writer restarts too") {
    import spark.implicits._
    // foreachBatch is AT-LEAST-once after a crash (offsets logged, commit
    // not): the guard must drop a batchId at or below the durable mark,
    // including when the guard itself is re-created on restart, and the
    // mark must only advance AFTER a successful write
    val dir = Files.createTempDirectory("graft-idem-").toString
    val writes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def mkWriter() = Sources.idempotentBatchWriter(dir) { (b, id) =>
      if (id == 99L) sys.error("sink outage") // simulated write failure
      writes += ((id, b.count()))
    }
    val w1 = mkWriter()
    w1(Seq(1, 2).toDF("v"), 0L)
    w1(Seq(3).toDF("v"), 1L)
    w1(Seq(3).toDF("v"), 1L) // same-incarnation re-delivery: skipped
    val w2 = mkWriter()      // "driver restart": fresh guard, same trackDir
    w2(Seq(3).toDF("v"), 1L) // post-restart re-delivery: still skipped
    w2(Seq(4, 5).toDF("v"), 2L)
    assert(writes.toSeq == Seq((0L, 2L), (1L, 1L), (2L, 2L)))
    // a FAILED write must not advance the mark: the retried batch runs
    // (checked while w2 is still the newest epoch — a later incarnation
    // would fence it before the sink even ran)
    intercept[RuntimeException] { w2(Seq(9).toDF("v"), 99L) }
    // a batchId BELOW the mark is impossible under one checkpoint lineage
    // (only the last batch re-delivers): loud error, not a silent skip
    intercept[IllegalStateException] { mkWriter()(Seq(9).toDF("v"), 0L) }
    val w3 = mkWriter()
    w3(Seq(6).toDF("v"), 3L) // 3 > committed mark (2): the retry writes
    assert(writes.toSeq.last == ((3L, 1L)))
    // zombie fencing: w2 lost ownership when the later incarnations
    // claimed higher epochs — its next delivery fails fast BEFORE the
    // sink effect, it does not keep writing from its stale cached mark
    val writesBefore = writes.size
    intercept[Sources.FencedWriterException] { w2(Seq(7).toDF("v"), 4L) }
    assert(writes.size == writesBefore, "fenced zombie ran its sink effect")

    // end-to-end: the signature plugs into foreachBatch and survives a
    // graceful checkpoint restart without re-writing committed batches
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Int]
    val ckpt = Files.createTempDirectory("graft-idem-ck-").toString
    val outDir = Files.createTempDirectory("graft-idem-out-").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    def startQ() = ms.toDF().writeStream
      .option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch(Sources.idempotentBatchWriter(outDir) { (b, _) =>
        seen.synchronized { seen ++= b.collect().map(_.getInt(0)) }; ()
      }).start()
    val q1 = startQ()
    try { ms.addData(10); q1.processAllAvailable() } finally q1.stop()
    val q2 = startQ()
    try { ms.addData(20); q2.processAllAvailable() } finally q2.stop()
    assert(seen.synchronized(seen.sorted.toSeq) == Seq(10, 20))
  }

  test("property: idempotentBatchWriter is exactly-once under random kill points (r11 verdict task 5)") {
    import spark.implicits._
    // the crash matrix the fixed test samples, randomized: at any batch
    // the driver may die (a) INSIDE the write, before the sink effect;
    // (b) BETWEEN the write's effect and the mark write — the window the
    // guard exists for: the effect landed, the durable mark did not, so
    // the restarted driver re-delivers and the per-batch-idempotent sink
    // overwrites; or (c) cleanly AFTER the mark, where the engine still
    // re-delivers the last batch on restart and the guard must SKIP it.
    // Exactly-once = every batch's final output is its fed rows, and a
    // batch never re-runs once the mark covers it.
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed * 7919)
      val dir = Files.createTempDirectory("graft-idem-prop-").toString
      val n = 4 + rnd.nextInt(5)
      def rowsOf(id: Long): Seq[Int] = Seq(id.toInt * 10, id.toInt * 10 + 1)
      // the per-batch-idempotent sink of the doc contract
      // (overwrite-by-batch): output(id) is REPLACED, never appended
      val output = scala.collection.mutable.Map.empty[Long, Seq[Int]]
      val runs = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      // 0 = no crash, 1 = crash before the effect, 2 = crash after the
      // effect but before the wrapper persists the mark
      var crashMode = 0
      def mkWriter() = Sources.idempotentBatchWriter(dir) { (b, id) =>
        if (crashMode == 1) { crashMode = 0; sys.error("crash during write") }
        val rows = b.collect().map(_.getInt(0)).toSeq
        runs(id) += 1
        output(id) = rows
        if (crashMode == 2) { crashMode = 0; sys.error("crash before mark") }
      }
      var writer = mkWriter()
      for (id <- 0L until n) {
        var delivered = false
        while (!delivered) {
          crashMode = rnd.nextInt(5) match {
            case 0 => 1
            case 1 => 2
            case _ => 0
          }
          val injected = crashMode != 0
          try {
            writer(rowsOf(id).toDF("v"), id)
            delivered = true
          } catch {
            case e: RuntimeException if injected &&
                e.getMessage.startsWith("crash") =>
              writer = mkWriter() // driver restart: fresh guard, same dir
          }
        }
        // sometimes the driver dies cleanly AFTER the mark advanced: the
        // restarted engine re-delivers this batch (at-least-once) and the
        // guard must skip it without re-running the effect
        if (rnd.nextInt(3) == 0) {
          writer = mkWriter()
          val before = runs(id)
          writer(rowsOf(id).toDF("v"), id)
          assert(runs(id) == before,
            s"seed $seed: committed batch $id re-ran after restart")
        }
      }
      // exactly-once OUTPUT: every batch present with exactly its rows
      assert(output.keySet == (0L until n).toSet, s"seed $seed: lost batches")
      (0L until n).foreach { id =>
        assert(output(id) == rowsOf(id), s"seed $seed: batch $id corrupted")
      }
      // and the below-mark fail-fast survives the whole crash history
      intercept[IllegalStateException] { mkWriter()(rowsOf(0L).toDF("v"), 0L) }
    }
  }

  test("property: split-brain — fenced zombie fails fast, output stays exactly-once (r12 verdict task 1)") {
    import spark.implicits._
    // the failover the r12 kill-point property does NOT cover: the old
    // driver survives its own replacement. Two live writer incarnations
    // share one trackDir; after the new one claims its epoch, every
    // delivery attempted by the old (zombie) incarnation must fail fast
    // with FencedWriterException BEFORE its sink effect runs — never
    // keep writing from its stale cached mark — and the surviving
    // incarnation's output must be exactly-once as if it ran alone.
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed * 104729)
      val dir = Files.createTempDirectory("graft-fence-prop-").toString
      val n = 5 + rnd.nextInt(4)
      def rowsOf(id: Long): Seq[Int] = Seq(id.toInt * 10, id.toInt * 10 + 1)
      val output = scala.collection.mutable.Map.empty[Long, Seq[Int]]
      val effects = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def mkWriter(tag: String) = Sources.idempotentBatchWriter(dir) { (b, id) =>
        val rows = b.collect().map(_.getInt(0)).toSeq
        effects += ((tag, id))
        output(id) = rows // overwrite-by-batch: the documented sink contract
      }
      // old incarnation runs normally up to a random takeover point
      val old = mkWriter("old")
      val takeover = 1 + rnd.nextInt(n - 1)
      for (id <- 0L until takeover) old(rowsOf(id).toDF("v"), id)
      // failover: the new incarnation starts WHILE the old is still live.
      // Its first delivery is the engine's at-least-once re-delivery of
      // the last batch (skipped against the durable mark), then it
      // continues the lineage.
      val nw = mkWriter("new")
      nw(rowsOf(takeover - 1).toDF("v"), takeover - 1)
      for (id <- takeover until n) {
        // at random interleave points the zombie attempts a delivery —
        // a re-delivery of an old id or the id it believes is next; every
        // attempt must fence BEFORE the sink effect
        if (rnd.nextBoolean()) {
          val zid = if (rnd.nextBoolean()) rnd.nextLong(takeover) else id
          val before = effects.size
          intercept[Sources.FencedWriterException] { old(rowsOf(zid).toDF("v"), zid) }
          assert(effects.size == before,
            s"seed $seed: fenced zombie ran its sink effect for batch $zid")
        }
        nw(rowsOf(id).toDF("v"), id)
      }
      // exactly-once OUTPUT: every batch present with exactly its rows,
      // and nothing ran twice on the surviving incarnation
      assert(output.keySet == (0L until n).toSet, s"seed $seed: lost batches")
      (0L until n).foreach { id =>
        assert(output(id) == rowsOf(id), s"seed $seed: batch $id corrupted")
      }
      assert(effects.count(_._1 == "new") == (n - takeover).toInt,
        s"seed $seed: surviving incarnation re-ran or skipped batches")
    }
  }

  test("fence epochs: concurrent claimers resolve by claim order, output stays exactly-once") {
    import spark.implicits._
    // the claim loop's races, exercised for real: 8 threads race
    // mkWriter + first delivery of batch 0 on ONE trackDir. Claim files
    // are unique per incarnation (epoch.<n>.<uid>), so two racers may
    // claim the same NUMBER; the (n, uid) order resolves ownership.
    // Any interleaving is legal as long as (a) batch 0's effect runs at
    // least once and the final output is exactly its rows (idempotent
    // overwrite), and (b) a writer only ever completes, skips, or fails
    // FENCED — nothing else.
    val dir = Files.createTempDirectory("graft-fence-conc-").toString
    val output = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Int]]()
    val effectRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    val df = Seq(1, 2).toDF("v")
    df.persist(); df.count() // materialize once: no concurrent job planning noise
    val outcomes = (1 to 8).map { _ =>
      new Thread { var outcome = "unset"
        override def run(): Unit = outcome =
          try {
            val w = Sources.idempotentBatchWriter(dir) { (b, id) =>
              effectRuns.incrementAndGet()
              output.put(id, Seq(1, 2))
            }
            w(df, 0L); "delivered"
          } catch {
            case _: Sources.FencedWriterException => "fenced"
            case e: Throwable => s"UNEXPECTED: $e"
          }
      }
    }
    outcomes.foreach(_.start()); outcomes.foreach(_.join(60000))
    df.unpersist()
    assert(outcomes.forall(t => t.outcome == "delivered" || t.outcome == "fenced"),
      s"bad outcomes: ${outcomes.map(_.outcome)}")
    // at least one incarnation completed batch 0; skips don't run effects
    assert(outcomes.exists(_.outcome == "delivered"))
    assert(effectRuns.get >= 1 && output.get(0L) == Seq(1, 2))
    // the durable mark covers batch 0 exactly once for the next incarnation
    val before = effectRuns.get
    Sources.idempotentBatchWriter(dir)((_, _) => sys.error("must skip"))(df, 0L)
    assert(effectRuns.get == before)
  }

  test("split-brain: takeover claimed MID-batch — zombie's mark swap is fenced, batch re-runs idempotently") {
    import spark.implicits._
    // the documented in-flight race: the zombie passes the pre-write
    // fence, the new incarnation claims its epoch while the zombie's
    // sink effect is running. The pre-swap fence must then reject the
    // mark advance (the effect landed but the mark did not), and the new
    // incarnation — which claimed BEFORE reading the mark — re-runs the
    // batch under the per-batch-idempotent contract: re-run, never skip.
    val dir = Files.createTempDirectory("graft-fence-race-").toString
    val output = scala.collection.mutable.Map.empty[Long, Seq[Int]]
    var newRuns = 0
    val newWriter = Sources.idempotentBatchWriter(dir) { (b2, id2) =>
      newRuns += 1
      output(id2) = b2.collect().map(_.getInt(0)).map(_ + 100).toSeq
    }
    var takeoverDone = false
    val zombie = Sources.idempotentBatchWriter(dir) { (b, id) =>
      output(id) = b.collect().map(_.getInt(0)).toSeq
      if (id == 1L && !takeoverDone) {
        takeoverDone = true
        // the takeover lands INSIDE the zombie's write: the new
        // incarnation claims its epoch (lazily, at first delivery),
        // reads mark=0, and re-runs the in-flight batch 1 itself
        newWriter(b, id)
      }
    }
    zombie(Seq(1, 2).toDF("v"), 0L) // pre-takeover batch commits normally
    // batch 1: zombie's effect lands, the takeover claims + re-runs it,
    // then the zombie's PRE-SWAP fence fires — the zombie cannot commit
    intercept[Sources.FencedWriterException] { zombie(Seq(3, 4).toDF("v"), 1L) }
    // the survivor's re-run overwrote the zombie's half-committed output
    // (per-batch-idempotent contract): re-run, never skip, never interleave
    assert(newRuns == 1 && output(1L) == Seq(103, 104),
      "takeover must re-run the in-flight batch and own its output")
    // the survivor advanced the mark as the owner: its next delivery of
    // batch 1 (engine at-least-once re-delivery) is skipped
    newWriter(Seq(3, 4).toDF("v"), 1L)
    assert(newRuns == 1, "committed batch re-ran on the survivor")
    newWriter(Seq(5).toDF("v"), 2L)
    assert(output(2L) == Seq(105))
    // and the zombie stays fenced
    intercept[Sources.FencedWriterException] { zombie(Seq(9).toDF("v"), 3L) }
  }

  test("parseJsonQuarantine: malformed flagged, schema drift and null payload are NOT corrupt, live plan stateless") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("lang", StringType)))
    val rows = Seq(
      (1L, """{"id":1,"lang":"en"}"""), // clean
      (2L, """{"id":2,"lang":"de""""), // truncated: malformed
      (3L, """{"id":3}"""), // schema drift: lang missing, NOT corrupt
      (4L, null.asInstanceOf[String]), // absent payload, NOT corrupt
      (5L, "not json at all")) // malformed
    val got = Sources.parseJsonQuarantine(rows.toDF("src", "payload"),
      col("payload"), schema)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "-" else r.getString(4)))).toMap
    assert(got(1L) == ((false, 1L, "en")))
    assert(got(2L) == ((true, -1L, "-")))
    assert(got(3L) == ((false, 3L, "-")), "missing field is drift, not corruption")
    assert(got(4L) == ((false, -1L, "-")), "null payload is absent, not corrupt")
    assert(got(5L) == ((true, -1L, "-")))
    // the quarantine is one stateless projection: identical on readStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = Sources.parseJsonQuarantine(ms.toDF().toDF("src", "payload"),
      col("payload"), schema)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rs = b.collect().map(r => (r.getLong(0), r.getBoolean(2)))
        out.synchronized { out ++= rs }
        ()
      }.start()
    try {
      ms.addData(rows.filter(_._2 != null): _*); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty, "stateless plan")
    } finally q.stop()
    assert(out.synchronized(out.toMap) ==
      Map(1L -> false, 2L -> true, 3L -> false, 5L -> true))
  }

  test("Artifacts: ensureTable builds exactly once per catalog (lazy " +
      "build, no rebuild on re-run); tableName pins corpus identity " +
      "including the dir when the stamp is 0") {
    import graft.sources.Artifacts
    val tbl = "graft_test_artifact_once"
    val path = java.nio.file.Files
      .createTempDirectory("graft-artifact-").toString
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    var builds = 0
    def build() = {
      import spark.implicits._
      builds += 1
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    Artifacts.ensureTable(spark, tbl, path = path + "/t")(build())
    Artifacts.ensureTable(spark, tbl, path = path + "/t")(build())
    assert(builds === 1, "second ensure must not re-build")
    assert(spark.table(tbl).count() === 2L)
    // non-local corpora stamp 0 (SparkEntry.corpusStamp contract):
    // the dir hash is what keeps two corpora from sharing an artifact
    val a = Artifacts.tableName("p", "s3://bucket/corpusA", 0L)
    val b = Artifacts.tableName("p", "s3://bucket/corpusB", 0L)
    assert(a !== b)
    // and regenerated local data (stamp moves) changes the name too
    assert(Artifacts.tableName("p", "/d", 1L) !==
      Artifacts.tableName("p", "/d", 2L))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path))
  }

  test("Artifacts: refreshTable rebuilds in place (the refit step); a " +
      "later ensureTable sees the refreshed table and does not rebuild") {
    import graft.sources.Artifacts
    val tbl = "graft_test_artifact_refresh"
    val path = java.nio.file.Files
      .createTempDirectory("graft-artifact-r-").toString
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    import spark.implicits._
    Artifacts.ensureTable(spark, tbl, path = path + "/t") {
      Seq((1, "old")).toDF("id", "v")
    }
    assert(spark.table(tbl).select("v").as[String].collect().toSeq ===
      Seq("old"))
    // the drift loop fires: rebuild with new content at a new path
    // (a refit writes a new model snapshot)
    Artifacts.refreshTable(spark, tbl, path = path + "/t2") {
      Seq((1, "new"), (2, "new")).toDF("id", "v")
    }
    assert(spark.table(tbl).select("v").as[String].collect().toSet ===
      Set("new"))
    assert(spark.table(tbl).count() === 2L)
    // build-once respects the refreshed artifact
    var built = false
    Artifacts.ensureTable(spark, tbl, path = path + "/t3") {
      built = true; Seq((9, "x")).toDF("id", "v")
    }
    assert(!built, "ensure after refresh must not rebuild")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path))
  }
}
