package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Sessionize}

/** Specs for the distributed operators outside the audio path: span-based
  * greedy merge (flatMapGroups), multimodal featurize plumbing, streaming
  * windowed ingest vs its batch twin. */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("spanMerge: span budget includes gaps; short sessions dropped") {
    import spark.implicits._
    val ev = Seq(
      // key 1: points at 0, 8, 14, 16 s (µs) with max span 15 s:
      // 0+8+14 merge (span 14); 16 starts fresh and is dropped (span 0 < min 3)
      Sessionize.Event(1, 0L, 1L),
      Sessionize.Event(1, 8000000L, 2L),
      Sessionize.Event(1, 14000000L, 3L),
      Sessionize.Event(1, 16000000L, 4L),
      // key 2: single point => zero span, dropped
      Sessionize.Event(2, 5000000L, 9L)
    ).toDS()
    val out = Sessionize.spanMerge(ev, minSpanUs = 3000000L, maxSpanUs = 15000000L)
      .collect().toSet
    assert(out == Set(Sessionize.Session(1, 0L, 14000000L, 3, 6L)))
  }

  test("spanMerge is deterministic across partitionings") {
    import spark.implicits._
    val ev = (0 until 200).map(i =>
      Sessionize.Event(i % 5, (i / 5).toLong * 4000000L, i.toLong))
    val a = Sessionize.spanMerge(ev.toDS().repartition(7), 3000000L, 15000000L).collect().toSet
    val b = Sessionize.spanMerge(ev.toDS().repartition(2), 3000000L, 15000000L).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("spanMerge streams a pathologically hot key without buffering it") {
    // 1M events on ONE key: the old groupByKey formulation buffered the whole
    // key in heap; the secondary-sort fold holds only the open session's
    // scalars, so this must complete and produce the exact closed-form
    // result. 1M events at 1 s spacing, 15 s max span, 3 s min span:
    // sessions are 16-event blocks (0..15 s span) -> 62500 sessions, every
    // one kept (span 15 s >= 3 s).
    import spark.implicits._
    val hot = spark.range(0, 1000000L)
      .selectExpr("cast(7 as long) as key", "id * 1000000 as tsUs",
                  "cast(1 as long) as value")
      .as[Sessionize.Event]
    val out = Sessionize.spanMerge(hot, minSpanUs = 3000000L, maxSpanUs = 15000000L)
    val agg = out.selectExpr("count(*) as n", "sum(nEvents) as tot",
                             "cast(min(nEvents) as long) as mn",
                             "cast(max(nEvents) as long) as mx").head()
    assert(agg.getLong(0) == 62500L)
    assert(agg.getLong(1) == 1000000L)
    assert(agg.getLong(2) == 16L && agg.getLong(3) == 16L)
  }

  // Deterministic gradient PNG synthesized in memory (no fixtures on disk).
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) |
                       ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("motifCountFold matches the HOF journey path, incl. a 1M-event hot key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // (a) real-path parity at sf0.001: the streaming twin emits exactly
    // the board query's rows
    val dir = "/root/testdata/sf0.001"
    val hofRows = graft.queries.AnalyticsOps.q176(spark, dir).collect().toSeq
    val foldRows = graft.queries.AnalyticsOps.q176Streaming(spark, dir).collect().toSeq
    assert(hofRows.nonEmpty && hofRows == foldRows)

    // (b) the swap case q176's scaladoc documents: one bot-grade key with
    // 1M events (journey = 1M chars on a single task for the HOF path),
    // plus normal keys. Tokens are a closed-form function of the index so
    // the fixture is deterministic; 'vcpx'-ish cycling yields real motif
    // hits, including runs like 'vcvcp' that test the KMP restart.
    val toks = Array("v", "c", "p", "x", "v", "c", "v", "p")
    val hot = (0 until 1000000).map { i =>
      graft.ops.Sessionize.KeyedToken(7L, (i * 13 % 997).toLong * 1000 + i / 997,
        i.toLong, toks(i % toks.length))
    }
    val cold = (0 until 500).map { i =>
      graft.ops.Sessionize.KeyedToken(i.toLong % 3, i.toLong * 10, i.toLong,
        toks((i * 5 + 1) % toks.length))
    }
    val ev = spark.createDataset(hot ++ cold).repartition(4)
    val folded = graft.ops.Sessionize.motifCountFold(ev, "vcp").collect()
      .map(m => m.key -> (m.seqLen, m.nMotif)).toMap
    // HOF replica over the same dataset — q176's exact expression chain
    val hof = ev.toDF()
      .groupBy(col("key"))
      .agg(org.apache.spark.sql.functions.expr(
        "array_join(transform(array_sort(collect_list(struct(tsUs, seq, token))), x -> x.token), '')")
        .as("journey"))
      .select(col("key"), length(col("journey")).cast("long").as("seq_len"),
        ((length(col("journey")) - length(expr("replace(journey, 'vcp', '')"))) / 3)
          .cast("long").as("n"))
      .collect()
    assert(hof.length == folded.size)
    hof.foreach { r =>
      val (n, hits) = folded(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == hits,
        s"key ${r.getLong(0)}: HOF (${r.getLong(1)},${r.getLong(2)}) != fold ($n,$hits)")
    }
    assert(folded(7L)._1 == 1000000L && folded(7L)._2 > 0L)
  }

  test("multimodal featurize: real imageio decode, undecodable payload dropped") {
    import spark.implicits._
    val png = pngBytes(32, 16)
    val rows = Seq(
      Multimodal.MediaRow(1, png),
      Multimodal.MediaRow(2, Array.emptyByteArray),          // empty -> dropped
      Multimodal.MediaRow(3, "not an image".getBytes("UTF-8")) // garbage -> dropped
    ).toDS()
    val out = Multimodal.featurize(rows).collect().map(d => d.docId -> d.meta).toMap
    assert(out.keySet == Set(1L))
    val m = out(1L)
    // REAL decoded dimensions and the PNG signature, not derived pseudo-values
    assert(m.width == 32 && m.height == 16)
    assert(m.magic == "89504e47") // \x89PNG
    assert(m.nBytes == png.length.toLong)
    // checksum is over decoded PIXELS: a BMP re-encode of the same picture
    // (different bytes, different size) must checksum identically
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(!java.util.Arrays.equals(bmp, png))
    val asBmp = Multimodal.decodeImage(bmp)
    assert(asBmp.checksum == m.checksum && asBmp.magic.startsWith("424d")) // "BM"
  }

  test("streaming windowed ingest equals the batch window aggregation (q32)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming.runOnce(spark, dir, "spec_stream")
      .orderBy("window_start_us", "event_type").collect().toSeq
    val batch = graft.queries.PipelineQueries.q32(spark, dir).collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stub transcriber is deterministic and batch-size independent") {
    val t = new graft.ops.Inference.StubTranscriber
    val in = (1 to 10).map(i => graft.ops.Inference.AsrInput(
      Array.tabulate(100 * i)(j => (j % 7) / 7.0f), 16000))
    val once = t.transcribe(in)
    assert(once == t.transcribe(in))
    assert(once == in.grouped(3).flatMap(g => t.transcribe(g)).toSeq)
  }

  test("Sinks.appendIgnore: INSERT OR IGNORE semantics across batches") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sink").resolve("t").toString
    val b1 = Seq(("k1", 1, "first"), ("k1", 2, "dup-in-batch"), ("k2", 1, "first"))
      .toDF("wav_path", "ord", "text")
    assert(graft.io.Sinks.appendIgnore(spark, b1, path, "wav_path", Seq("ord")) == 2)
    val b2 = Seq(("k1", 0, "cross-batch-dup"), ("k3", 1, "new"))
      .toDF("wav_path", "ord", "text")
    assert(graft.io.Sinks.appendIgnore(spark, b2, path, "wav_path", Seq("ord")) == 1)
    val fin = spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("wav_path") -> r.getAs[String]("text")).toMap
    assert(fin == Map("k1" -> "first", "k2" -> "first", "k3" -> "new"))
  }

  test("streaming spanMerge emits exactly the batch sessions minus each key's open tail") {
    val dir = "/root/testdata/sf0.001"
    val minUs = 3L * 60 * 1000000
    val maxUs = 15L * 60 * 1000000
    val streamed = graft.streaming.Streaming
      .spanMergeOnce(spark, dir, minUs, maxUs, "spec_spanmerge")
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("startUs"), r.getAs[Long]("endUs"),
                 r.getAs[Int]("nEvents"))).toSet
    // exact expectation: a driver-side replica of the greedy fold that emits
    // CLOSED sessions only (the open tail per key stays in streaming state)
    val events = graft.core.Tables.events(spark, dir)
      .selectExpr("user_id", "ts_us", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = events.groupBy(_._1).flatMap { case (key, rows) =>
      val sorted = rows.sortBy(e => (e._2, e._3))
      val out = Seq.newBuilder[(Long, Long, Long, Int)]
      var start = sorted.head._2; var end = start; var n = 1
      sorted.tail.foreach { e =>
        if (e._2 - start <= maxUs) { end = e._2; n += 1 }
        else {
          if (end - start >= minUs) out += ((key, start, end, n)) // closed
          start = e._2; end = e._2; n = 1
        }
      }
      out.result() // the final open run is NOT emitted
    }.toSet
    assert(streamed.nonEmpty && streamed == expected)
  }

  test("saltedAggregate equals direct aggregation on a skewed key distribution") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 90% of rows on one hot key
    val df = (0 until 20000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 0L
      (k, i.toLong, (i % 13).toDouble)
    }.toDF("key", "id", "v")
    val direct = df.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,4)")).cast("double").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = graft.ops.Skew.saltedAggregate(df, Seq("key"), 16, Seq($"id"),
      partial = Seq(count(lit(1)).as("n"), sum($"v".cast("decimal(18,4)")).as("s")),
      merge = Seq(sum($"n").as("n"), sum($"s").cast("double").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
    // phase-1 parallelism: the hot key really is spread over multiple salts
    val buckets = df.withColumn("salt", graft.ops.Skew.salt(16, $"id"))
      .filter($"key" === 0L).select("salt").distinct().count()
    assert(buckets > 8)
  }

  test("multimodal resize + frameSample: schema/explosion contracts, error-skip") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1, pngBytes(128, 96)),
      Multimodal.MediaRow(2, Array.emptyByteArray),          // skipped
      Multimodal.MediaRow(3, "junk junk junk".getBytes("UTF-8")) // skipped
    ).toDS()
    val resized = Multimodal.resize(media, 64, 48).collect().map(r => r.docId -> r).toMap
    assert(resized.keySet == Set(1L))
    assert(resized(1L).width == 64 && resized(1L).height == 48)
    // output is a REAL image: re-decoding it yields the target raster dims
    val back = Multimodal.decodeImage(resized(1L).content)
    assert(back.width == 64 && back.height == 48 && back.magic == "89504e47")
    // deterministic re-encode: same input, same output bytes
    assert(resized(1L).content.toSeq ==
      Multimodal.resizeImage(pngBytes(128, 96), 64, 48).toSeq)
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRow(1, Array.tabulate[Byte](1024)(_.toByte)),
          Multimodal.MediaRow(2, Array.emptyByteArray)).toDS(),
      frameBytes = 128, everyNth = 2).collect()
    val byDoc = frames.groupBy(_.docId)
    assert(byDoc(1L).map(_.frameIdx).sorted.toSeq == Seq(0, 2, 4, 6)) // 8 frames, every 2nd
    assert(byDoc(1L).forall(_.content.length == 128))
    assert(!byDoc.contains(2L))
  }

  test("MJPEG-in-AVI frames decode to real raster stats; alien codecs keep byte windows") {
    import spark.implicits._
    val (w, h) = (48, 32)
    val jpegs = (0 until 5).map(i => Multimodal.synthesizeJpegFrame(w, h, i))
    val mjpeg = Multimodal.synthesizeAviWithFrames(w, h, jpegs)
    // a same-shape AVI whose 00dc payloads are NOT a JDK-decodable codec
    val alien = Multimodal.synthesizeAvi(w, h, 3, 256)
    val media = Seq(Multimodal.MediaRow(1, mjpeg), Multimodal.MediaRow(2, alien)).toDS()
    val stats = Multimodal.frameStats(
      Multimodal.frameSample(media, frameBytes = 4096, everyNth = 1))
      .collect().groupBy(_.docId)

    val dec = stats(1L).sortBy(_.frameIdx)
    assert(dec.length == 5 && dec.forall(_.decoded))
    assert(dec.forall(f => f.width == w && f.height == h))
    assert(dec.forall(_.magic.startsWith("ffd8")), "JPEG SOI magic expected")
    // the pixel CRC is the STILL-IMAGE path's semantics on the same payload
    dec.zipWithIndex.foreach { case (f, i) =>
      val still = Multimodal.decodeImage(jpegs(i))
      assert(f.checksum == still.checksum && f.nBytes == jpegs(i).length.toLong,
        s"frame $i diverges from decodeImage on the identical payload")
    }
    // distinct frames -> distinct rasters (the CRC is content, not constant)
    assert(dec.map(_.checksum).distinct.length == 5)

    val raw = stats(2L).sortBy(_.frameIdx)
    assert(raw.length == 3 && raw.forall(!_.decoded))
    assert(raw.forall(f => f.width == 0 && f.height == 0 && f.nBytes == 256L))
    // byte-window checksum: CRC32 over the raw coded bytes
    val crc0 = { val c = new java.util.zip.CRC32(); c.update(Array.fill[Byte](256)(0)); c.getValue }
    assert(raw.head.checksum == crc0)
  }

  // -- synthesized containers for the demux probe -----------------------
  // Minimal but STRUCTURALLY REAL files: the probe reads actual RIFF chunk
  // headers / MP4 box headers, so the test must write byte-exact layouts.
  private def leInt(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def beInt(v: Long): Array[Byte] = leInt(v).reverse
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF/AVI: hdrl LIST with a real 56-byte avih MainAVIHeader, movi LIST
    * with `nFrames` 00dc video chunks of `frameLen` bytes each. */
  private def aviBytes(w: Int, h: Int, nFrames: Int, frameLen: Int): Array[Byte] = {
    val avih = {
      val f = new Array[Byte](56)
      def put(off: Int, v: Long): Unit = System.arraycopy(leInt(v), 0, f, off, 4)
      put(0, 33333L)        // dwMicroSecPerFrame (30 fps)
      put(16, nFrames.toLong) // dwTotalFrames
      put(24, 1L)           // dwStreams
      put(32, w.toLong); put(36, h.toLong)
      f
    }
    val hdrl = cc("LIST") ++ leInt(4 + 8 + avih.length) ++ cc("hdrl") ++
      cc("avih") ++ leInt(avih.length) ++ avih
    val frames = (0 until nFrames).flatMap { i =>
      cc("00dc") ++ leInt(frameLen.toLong) ++ Array.fill[Byte](frameLen)(i.toByte) ++
        (if (frameLen % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    }.toArray
    val movi = cc("LIST") ++ leInt(4L + frames.length) ++ cc("movi") ++ frames
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ leInt(body.length.toLong) ++ body
  }

  /** MP4/ISO-BMFF: ftyp(isom) + moov(mvhd v0 timescale/duration) + mdat. */
  private def mp4Bytes(timescale: Long, duration: Long): Array[Byte] = {
    val ftypPayload = cc("isom") ++ leInt(0) ++ cc("isom") ++ cc("iso2")
    val ftyp = beInt(8L + ftypPayload.length) ++ cc("ftyp") ++ ftypPayload
    val mvhdPayload = new Array[Byte](100) // v0: 4 flags + 96 fixed fields
    System.arraycopy(beInt(timescale), 0, mvhdPayload, 12, 4) // @+20 from box
    System.arraycopy(beInt(duration), 0, mvhdPayload, 16, 4)  // @+24 from box
    val mvhd = beInt(8L + mvhdPayload.length) ++ cc("mvhd") ++ mvhdPayload
    val moov = beInt(8L + mvhd.length) ++ cc("moov") ++ mvhd
    val mdat = beInt(16L) ++ cc("mdat") ++ Array.fill[Byte](8)(7)
    ftyp ++ moov ++ mdat
  }

  /** MP4 with a REAL sample table: `samples` grouped into chunks of
    * `chunkSizes` samples each; stsz/stsc/stco computed exactly, stco
    * holding absolute file offsets into mdat. */
  private def mp4WithSamples(samples: Seq[Array[Byte]], chunkSizes: Seq[Int]): Array[Byte] = {
    require(chunkSizes.sum == samples.length, "chunk sizes must cover samples")
    def box(id: String, payload: Array[Byte]): Array[Byte] =
      beInt(8L + payload.length) ++ cc(id) ++ payload
    val ftyp = box("ftyp", cc("isom") ++ leInt(0) ++ cc("isom"))
    val mvhd = box("mvhd", new Array[Byte](100))
    val stsz = box("stsz", beInt(0) ++ beInt(0) ++ beInt(samples.length.toLong) ++
      samples.flatMap(s => beInt(s.length.toLong)).toArray)
    val stsc = box("stsc", beInt(0) ++ beInt(chunkSizes.length.toLong) ++
      chunkSizes.zipWithIndex.flatMap { case (n, c) =>
        beInt(c + 1L) ++ beInt(n.toLong) ++ beInt(1L) }.toArray)
    def stcoWith(offsets: Seq[Long]): Array[Byte] =
      box("stco", beInt(0) ++ beInt(offsets.length.toLong) ++
        offsets.flatMap(beInt).toArray)
    def moovWith(offsets: Seq[Long]): Array[Byte] = {
      val stbl = box("stbl", stsz ++ stsc ++ stcoWith(offsets))
      box("moov", mvhd ++ box("trak", box("mdia", box("minf", stbl))))
    }
    // moov's length is offset-value-independent, so build once with zeros to
    // learn the mdat data offset, then rebuild with the real chunk offsets
    val mdatDataOff = ftyp.length + moovWith(chunkSizes.map(_ => 0L)).length + 8L
    val sampleOffsets = samples.scanLeft(mdatDataOff)(_ + _.length)
    val chunkStarts = chunkSizes.scanLeft(0)(_ + _).dropRight(1) // sample idx per chunk
    val offsets = chunkStarts.map(sampleOffsets(_))
    ftyp ++ moovWith(offsets) ++ box("mdat", samples.flatten.toArray)
  }

  test("mp4 sample-table demux: stsz/stsc/stco resolve the exact sample payloads") {
    import spark.implicits._
    val samples = (0 until 5).map(i => Array.fill[Byte](10 + 3 * i)(i.toByte))
    val mp4 = mp4WithSamples(samples, chunkSizes = Seq(3, 2)) // uneven chunking
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRow(9, mp4)).toDS(), frameBytes = 9999, everyNth = 1)
      .collect().sortBy(_.frameIdx)
    assert(frames.length == 5)
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frameIdx == i)
      assert(f.content.toSeq == samples(i).toSeq,
        s"sample $i bytes must round-trip through the chunk walk")
    }
    // and the probe still reads the same file's box structure
    val p = Multimodal.probeContainer(mp4)
    assert(p.format == "mp4" && p.chunks.map(_.id) == Seq("ftyp", "moov", "mdat"))
  }

  test("q74 BPE merges match hand-computed segmentations (right-boundary guard)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "there to", 8L), (2L, "a.b", 3L), (3L, "and", 3L))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q74_bpe_tokenize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "there": (t,h)->th, (e,r)->er, then (th,e) must NOT consume the 'e'
    // prefix of the adjacent "er" symbol -> [th, er, e] = 3; "to" -> 1
    assert(out(1L) == ((2L, 4L)), s"got ${out(1L)}")
    // punctuation pre-token '.' counts as 1, never merges with neighbors
    assert(out(2L) == ((3L, 3L)), s"got ${out(2L)}")
    // chained merges: (a,n)->an then (an,d)->and = 1 token
    assert(out(3L) == ((1L, 1L)), s"got ${out(3L)}")
  }

  test("container probe: real RIFF/AVI + MP4 box metadata, error-skip, movi demux") {
    import spark.implicits._
    val avi = aviBytes(w = 320, h = 240, nFrames = 5, frameLen = 64)
    val mp4 = mp4Bytes(timescale = 600, duration = 7200) // 12 s at 600 units/s
    val media = Seq(
      Multimodal.MediaRow(1, avi),
      Multimodal.MediaRow(2, mp4),
      Multimodal.MediaRow(3, "not a container at all".getBytes("UTF-8")) // skipped
    ).toDS()
    val probed = Multimodal.probe(media).collect().map(p => p.docId -> p.probe).toMap
    assert(probed.keySet == Set(1L, 2L))
    // AVI: avih fields surfaced, both top-level LISTs walked with types
    val a = probed(1L)
    assert(a.format == "riff-avi" && a.brand == "AVI")
    assert(a.width == 320 && a.height == 240 && a.totalFrames == 5 && a.streams == 1)
    assert(a.chunks.map(c => (c.id, c.listType)) ==
      Seq(("LIST", "hdrl"), ("LIST", "movi")))
    // MP4: ftyp brand + mvhd timescale/duration, boxes in file order
    val m = probed(2L)
    assert(m.format == "mp4" && m.brand == "isom")
    assert(m.timescale == 600 && m.durationUnits == 7200)
    assert(m.chunks.map(_.id) == Seq("ftyp", "moov", "mdat"))
    // frameSample on the AVI demuxes REAL movi chunks: every 2nd of 5 frames,
    // payload bytes are the chunk contents (frame i filled with byte i)
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRow(1, avi)).toDS(), frameBytes = 9999, everyNth = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(f => f.content.length == 64 &&
      f.content.forall(_ == f.frameIdx.toByte)))
  }

  test("streaming simhash near-dup: cross-batch flagging + batch signature parity") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textC = "completely unrelated words about spark catalyst optimizer internals"
    val dir = java.nio.file.Files.createTempDirectory("graft_simdedup").toString
    // two files -> two micro-batches (maxFilesPerTrigger=1): state must
    // carry doc 1's signature into the second batch
    Seq((1L, textA), (3L, textC)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, textA), (4L, textA)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val out = graft.streaming.Streaming.simhashDedupOnce(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(!out(1L)._2 && out(1L)._3 == -1L)
    assert(!out(3L)._2)
    assert(out(2L)._2 && out(2L)._3 == 1L) // cross-batch near-dup of doc 1
    assert(out(4L)._2 && out(4L)._3 == 1L)
    // signature parity: the streaming Scala twin must equal q25's
    // expression-pipeline simhash for the same texts
    val qdir = java.nio.file.Files.createTempDirectory("graft_simpar").toString
    Seq((1L, textA), (2L, textA), (3L, textC), (4L, textA)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$qdir/documents.parquet")
    val batchSig = graft.SparkEntry.queries("q25_simhash")(spark, qdir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (sh, _, _)) =>
      assert(sh == batchSig(id), s"streaming/batch simhash diverged for doc $id")
    }
  }

  test("streaming dedup: duplicates across micro-batches drop within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    def batch(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("k", "ts_s", "payload")
        .selectExpr("k", "cast(ts_s as timestamp) as ts", "payload")
        .coalesce(1).write.mode("append").parquet(dir)
    // batch A: keys 1, 2; batch B replays key 1 (dup, inside horizon) and
    // adds key 3 — written as separate files so maxFilesPerTrigger=1 turns
    // them into separate micro-batches
    batch(Seq((1L, "2026-01-01 00:00:01", "first"),
              (2L, "2026-01-01 00:00:02", "first")))
    batch(Seq((1L, "2026-01-01 00:00:03", "replay"),
              (3L, "2026-01-01 00:00:04", "first")))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("payload", StringType)))
    val out = graft.streaming.Streaming
      .dedupOnce(spark, dir, schema, "ts", "10 minutes", Seq("k"), "spec_sdedup")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("payload"))
    assert(out.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    // key 1 kept exactly once; payload proves it was deduplicated, not merged
    assert(out.count(_._1 == 1L) == 1)
  }

  test("stream-stream interval join equals its batch twin") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming
      .intervalJoinOnce(spark, dir, withinMinutes = 5, "spec_ssjoin")
      .selectExpr("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "timestamp_micros(ts_us) AS ts_t")
    val a = ev.toDF("a_id", "a_user", "a_ts")
    val b = ev.toDF("b_id", "b_user", "b_ts")
    val batch = a.join(b, org.apache.spark.sql.functions.expr(
        "a_user = b_user AND a_id <> b_id AND b_ts >= a_ts AND b_ts <= a_ts + INTERVAL 5 MINUTES"))
      .selectExpr("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("chained stateful ops: streamed join→window agg equals the batch rollup") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val maxUs = graft.core.Tables.events(spark, dir)
      .agg(max(col("ts_us"))).head().getLong(0)
    val cutoffUs = maxUs - 16L * 60L * 1000000L
    val streamed = graft.streaming.Streaming
      .joinWindowOnce(spark, dir, withinMinutes = 5, "spec_jwin")
      .filter(col("window_end_us") <= cutoffUs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "timestamp_micros(ts_us) AS ts_t")
    val a = ev.toDF("a_id", "a_user", "a_ts")
    val b = ev.toDF("b_id", "b_user", "b_ts")
    val batch = a.join(b, expr(
        "a_user = b_user AND a_id <> b_id AND b_ts >= a_ts AND b_ts <= a_ts + INTERVAL 5 MINUTES"))
      .groupBy(window(col("a_ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("b_id")).as("s"))
      .select(unix_micros(col("window.start")).as("ws"),
        unix_micros(col("window.end")).as("we"), col("n"), col("s"))
      .filter(col("we") <= cutoffUs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("orc source round-trips a table sample losslessly") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .limit(500)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    li.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.schema == li.schema) // ORC preserves types exactly
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).toSet
    assert(key(back) == key(li) && back.count() == 500)
  }

  test("csv and json sources round-trip a table sample losslessly") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .limit(500)
    val dir = java.nio.file.Files.createTempDirectory("graft_io")
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    li.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    val fromJson = spark.read.json(s"$dir/json")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .collect().map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString, r.get(3).toString)).toSet
    assert(key(fromCsv) == key(li) && key(fromJson) == key(li))
  }

  test("q81/q82 board entries are stable across repeated in-session runs") {
    // Bench times every query twice in one session with the same memory-sink
    // query name — a stale sink or accumulating temp view would double rows
    val d = "/root/testdata/sf0.001"
    val q81 = graft.SparkEntry.queries("q81_stream_interval_join")
    val q82 = graft.SparkEntry.queries("q82_stream_dedup_watermark")
    val r81a = q81(spark, d).collect().map(_.toSeq).toSeq
    val r81b = q81(spark, d).collect().map(_.toSeq).toSeq
    assert(r81a == r81b && r81a.nonEmpty)
    val r82a = q82(spark, d).collect().map(_.toSeq).toSeq
    val r82b = q82(spark, d).collect().map(_.toSeq).toSeq
    assert(r82a == r82b && r82a.nonEmpty)
    val q87 = graft.SparkEntry.queries("q87_stream_span_merge")
    val r87a = q87(spark, d).collect().map(_.toSeq).toSeq
    val r87b = q87(spark, d).collect().map(_.toSeq).toSeq
    assert(r87a == r87b && r87a.nonEmpty)
  }

  test("q80 substring spans: maximal merge, position arithmetic, hot-fp guard") {
    import spark.implicits._
    // doc 1 and doc 2 share the 10-token run "c1..c10" (doc 2 offset by 2);
    // docs 100..117 (18 > the 16-doc guard) all share one 8-token run that
    // must be suppressed as a hot fingerprint
    val shared = (1 to 10).map(i => s"c$i").mkString(" ")
    val hot = (1 to 8).map(i => s"h$i").mkString(" ")
    val docs =
      Seq((1L, s"$shared u1 u2 u3"), (2L, s"x1 x2 $shared y1")) ++
        (100L to 117L).map(i => (i, s"p$i q$i $hot"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q80").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
                  "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupSim.q80(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // one maximal span: tokens 1..10 of doc 1 == tokens 3..12 of doc 2
    // (3 window hits at diagonal -2 merge to length 3 + 8 - 1 = 10);
    // zero spans from the 18-doc hot run
    assert(out.toSeq == Seq((1L, 2L, 1L, 3L, 10L)))
    // q86 reduces the same spans to per-doc coverage: 10 of 13 tokens on
    // both pair members, zero on every hot-guarded doc
    val cov = graft.queries.DedupSim.q86(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cov(1L) == ((13L, 10L, 10.0 / 13)))
    assert(cov(2L) == ((13L, 10L, 10.0 / 13)))
    assert((100L to 117L).forall(cov(_)._2 == 0L))
  }

  test("globalOrdinal: partition-count invariant and equal to the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.ops.Ordinals
    val df = spark.range(0, 5000).selectExpr("(id * 2654435761) % 100003 AS k", "id AS payload")
      .filter(col("k").isNotNull)
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select("k", "payload", "ordinal").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val via4 = rows(Ordinals.globalOrdinal(df, col("k"), 4))
    val via9 = rows(Ordinals.globalOrdinal(df, col("k"), 9))
    val viaWindow = rows(df.withColumn("ordinal",
      row_number().over(Window.orderBy(col("k"))).cast("long")))
    assert(via4 == viaWindow, "range+offset ordinals must equal the global-sort window")
    assert(via9 == viaWindow, "ordinals must be invariant to the partition count")
    // the ranged stage the operator rides carries a range exchange, never
    // the window's all-to-one SinglePartition sort
    val stage = Ordinals.rangedStage(df, col("k"), 4)
      .queryExecution.executedPlan.toString
    assert(stage.contains("rangepartitioning(k"), stage)
    assert(!stage.contains("SinglePartition"), stage)
  }

  test("globalPrefixSum: equals the window running sum, partition-count invariant") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.ops.Ordinals
    val df = spark.range(0, 3000).selectExpr("(id * 2654435761) % 100003 AS k", "id % 97 AS v")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select("k", "v", "running").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val via3 = rows(Ordinals.globalPrefixSum(df, col("k"), "v", 3))
    val via8 = rows(Ordinals.globalPrefixSum(df, col("k"), "v", 8))
    val viaWindow = rows(df.withColumn("running",
      sum(col("v")).over(Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0))))
    assert(via3 == viaWindow, "scan-sum must equal the window running sum")
    assert(via8 == viaWindow, "prefix sums must be invariant to the partition count")
  }

  test("transformWithState billing alerts: ValueState carries the total across triggers") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.streaming.Streaming
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // generation-agnostic read: Tables.events normalizes ts to ts_us
    val raw = graft.core.Tables.events(s2, "/root/testdata/sf0.001")
    // time-split into two arrival files: equal ts always lands in one file,
    // so per-key cross-trigger order stays (ts, event_id)
    val cut = raw.selectExpr("CAST(approx_percentile(ts_us, 0.5) AS BIGINT)").head.getLong(0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_tws_src").toString
    val fileCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props").map(col)
    raw.filter(col("ts_us") <= cut).select(fileCols: _*).coalesce(1).write.parquet(s"$streamDir/a")
    val q = Streaming.billingAlertsStream(s2, streamDir + "/a", thresholdCents = 100000L)
      .writeStream.outputMode("append").format("memory").queryName("tws_spec").start()
    try {
      q.processAllAvailable()
      val afterBatch1 = s2.table("tws_spec").count()
      raw.filter(col("ts_us") > cut).select(fileCols: _*).coalesce(1).write.mode("append").parquet(s"$streamDir/a")
      q.processAllAvailable()
      val got = s2.table("tws_spec")
        .select("user_id", "event_id", "k", "cum_cents").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val want = raw
        .withColumn("cents", expr("CAST(floor(value * 100) AS BIGINT)"))
        .withColumn("cum", sum(col("cents")).over(w))
        .filter(expr("cum div 100000 > (cum - cents) div 100000"))
        .select(col("user_id"), col("event_id"), expr("cum div 100000").as("k"), col("cum"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, "streamed crossings must equal the batch running-sum twin")
      // both triggers contributed rows — a state reset in trigger 2 would
      // restart every user at k=1 and break the set equality above, but
      // assert the split was real so this test can't silently degrade
      assert(afterBatch1 > 0 && afterBatch1 < want.size,
        s"expected crossings in both triggers, got $afterBatch1 of ${want.size} in trigger 1")
    } finally q.stop()
  }

  test("statestore reader: q188's RocksDB ValueState reads back as the exact per-user totals") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streaming
    // the ops-debugging loop at 100 TB: after (or during) a run, open the
    // checkpoint with the `statestore` source and audit the state variables
    // directly — no re-execution, no instrumented build
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("graft_ssr_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssr_ckpt").toString
    val q = Streaming.billingAlertsStream(s2, staged.toString, thresholdCents = 100000L)
      .writeStream.outputMode("append").format("memory").queryName("ssr_spec")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val state = s2.read.format("statestore")
      .option("stateVarName", "cum")
      .load(ckpt)
      .select(col("key.value").as("user_id"), col("value.value").as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = s2.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == want,
      s"state read-back must equal the exact per-user cents totals (got ${state.size} keys)")
  }

  test("transformWithState timers: sessions emit on expiry, carry across triggers") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.streaming.Streaming
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val raw = graft.core.Tables.events(s2, "/root/testdata/sf0.001")
    // time-split into two arrival files; the 10-min watermark delay makes an
    // early-emitted session uncontinuable by construction (any continuing
    // event would have ts <= end+gap <= wm1 < cut < batch-2 ts)
    val cut = raw.selectExpr("CAST(approx_percentile(ts_us, 0.5) AS BIGINT)").head.getLong(0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_timer_src").toString
    val fileCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props").map(col)
    raw.filter(col("ts_us") <= cut).select(fileCols: _*).coalesce(1).write.parquet(s"$streamDir/a")
    val q = Streaming.sessionTimeoutStream(s2, streamDir + "/a", gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("timer_spec").start()
    try {
      q.processAllAvailable()
      val afterBatch1 = s2.table("timer_spec").count()
      raw.filter(col("ts_us") > cut).select(fileCols: _*).coalesce(1)
        .write.mode("append").parquet(s"$streamDir/a")
      q.processAllAvailable()
      val got = s2.table("timer_spec")
        .select("user_id", "start_us", "end_us", "n_events", "sum_cents").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      // batch twin: gap sessions over the full data, closed by the FINAL
      // ms-floored watermark (the q218 oracle's rule)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val maxUs = raw.agg(max(col("ts_us"))).head.getLong(0)
      val wmUs = (maxUs / 1000L - 600000L) * 1000L
      val want = raw
        .withColumn("cents", expr("CAST(floor(value * 100) AS BIGINT)"))
        .withColumn("brk", when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .filter(col("end_us") + 1800000000L <= wmUs)
        .select("user_id", "start_us", "end_us", "n_events", "sum_cents").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == want, "timer-emitted sessions must equal the batch gap-session twin")
      // timers fired in BOTH stream segments: mid-stream expiry emitted some
      // sessions after batch 1, and batch 2's watermark advance emitted more
      assert(afterBatch1 > 0 && afterBatch1 < want.size.toLong,
        s"expected timer emissions in both segments, got $afterBatch1 of ${want.size}")
    } finally q.stop()
  }

  test("count-min: never undercounts, honors the ε·N bound, prefilter is exact") {
    import org.apache.spark.sql.functions._
    import graft.ops.CountMin
    // skewed long-key stream: key k appears ~floor(4000/(k+1)) times
    // (harmonic, Zipf-ish), 200 distinct keys, N ≈ 4000·H(200)
    val df = spark.range(0, 200).selectExpr("id AS k", "CAST(floor(4000 / (id + 1)) AS INT) AS reps")
      .selectExpr("explode(array_repeat(k, reps)) AS k")
      .repartition(7) // arbitrary layout: the sketch must not care
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum

    val sk = CountMin.build(df, col("k"), depth = 4, width = 64)
    assert(sk.total == n, "row 0 must sum to the observation count")
    val est = spark.range(0, 200).toDF("k")
      .select(col("k"), sk.estimate(col("k")).as("est")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided guarantee: estimate >= true, always
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"undercount at key $k: est ${est(k)} < true $c")
    }
    // CM bound: est <= true + ε·N with ε = e/width, per-key w.h.p.; assert
    // it for every key — deterministic here since data and hashes are fixed
    val eps = math.E / 64
    exact.foreach { case (k, c) =>
      assert(est(k) <= c + (eps * n).toLong + 1,
        s"key $k: est ${est(k)} vs true $c breaks the ε·N bound")
    }
    // the q183 pattern: estimate-prefilter then exact recount == plain
    // groupBy-having, for any threshold (prefilter is per-key all-or-nothing
    // and never drops a heavy key)
    val t = n / 100
    val got = df.filter(sk.estimate(col("k")) >= t)
      .groupBy("k").count().filter(col("count") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exact.filter(_._2 >= t).toSet
    assert(got == want, "prefiltered recount must equal the exact heavy-key set")
  }

  test("lateDataAuditOnce: late groups drop with engine accounting; none leak") {
    // recent wave: 100 rows over 100 s at epoch 1706000000 (2 minute-hours
    // irrelevant — 1h windows ⇒ ONE window), plus a late wave 4 days older
    // in 3 distinct (window × type) groups. The drive must (a) keep every
    // late row out of the emitted aggregation, (b) report exactly 3 dropped
    // state rows (group granularity — 50 late input rows), and (c) emit the
    // recent window(s) the final watermark closed.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val baseUs = 1706000000000000L
    // recent: one row per minute for 100 min; the base epoch sits 53m20s
    // into its hour, so hour boundaries fall at +6:40 and +66:40 — the
    // final watermark (+99min − 10s) closes the first two windows (7 and
    // 60 rows) and leaves the third open
    val recent = ss.range(100).selectExpr(
      s"timestamp_micros($baseUs + id * 60000000) AS ts_t",
      "'a' AS event_type", "1.0 AS value")
    val barrier = ss.range(1).selectExpr(
      s"timestamp_micros($baseUs + 99L * 60000000) AS ts_t",
      "'barrier' AS event_type", "0.0 AS value")
    val lateUs = baseUs - 4L * 86400L * 1000000L
    // 75 rows in two types. The base epoch sits 53m20s into its hour, so
    // epoch-aligned hour boundaries fall at +6:40 and +66:40: x at
    // +0..24 min straddles the first boundary (groups (H0,x), (H1,x)); y at
    // +30..54 min is inside H1; y at +70..94 min is inside H2 — 4 distinct
    // (window × type) groups, which is what the state operator refuses
    val late = ss.range(75).selectExpr(
      s"""timestamp_micros($lateUs + CASE WHEN id < 25 THEN id
         |  WHEN id < 50 THEN 30 + (id - 25)
         |  ELSE 70 + (id - 50) END * 60000000) AS ts_t""".stripMargin,
      "CASE WHEN id < 25 THEN 'x' ELSE 'y' END AS event_type",
      "1.0 AS value")
    val (tbl, dropped) = graft.streaming.Streaming.lateDataAuditOnce(
      ss, recent, barrier, late, delay = "10 seconds",
      queryName = "graft_lateaudit_spec")
    assert(dropped == 4L, s"expected 4 dropped groups, got $dropped")
    val rows = tbl.collect()
    // nothing from the late wave (its epoch-hour starts are 4 days old)
    assert(rows.forall(_.getLong(0) >= baseUs - 3600000000L),
      rows.mkString("; "))
    // the two closed recent windows were emitted with exact counts; the
    // open third window was not
    val h0 = baseUs - (baseUs % 3600000000L)
    val counts = rows.filter(_.getString(1) == "a")
      .map(r => (r.getLong(0) - h0) / 3600000000L -> r.getLong(2)).toMap
    assert(counts == Map(0L -> 7L, 1L -> 60L), rows.mkString("; "))
  }
}
