package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.io.PngCodec
import graft.ops.ImageOps

/** IMAGE MULTIMODAL family: binary image columns decoded by a REAL
  * pure-JVM PNG codec ([[graft.io.PngCodec]] — chunks, CRC32, zlib, all
  * five scanline filters), then feature-extracted / resized /
  * fingerprinted by integer-exact kernels ([[graft.ops.ImageOps]]).
  *
  * The oracle story is stronger than the audio family's golden values:
  * pixels are synthesized from closed-form integer formulas of
  * (image id, x, y), so DuckDB REGENERATES every pixel relationally
  * (correlated `generate_series`) and recomputes each metric — the
  * Spark side only hash-matches if `decode(encode(pixels))` reproduced
  * every byte AND every kernel's integer arithmetic agrees. No float
  * tolerance, no frozen constants.
  *
  * Scale shape: images ride as a `binary` column; encode/decode/kernels
  * run inside `Dataset.map` on executors (one image per row, no driver
  * loop, no shuffle before the final per-image projection); the dedup
  * entry shuffles once on the 64-bit fingerprint — pair space is
  * Σ bucket², never N², the same contract as the text dedup family. */
object ImageQueries {

  /** Per-image synthesis parameters — integer formulas both engines
    * restate: w = 16+8·(id%5) ∈ [16,48], h = 16+8·(id%7) ∈ [16,64],
    * kind = id%4 (3 = RGB). */
  private case class Spec(id: Long, w: Int, h: Int, kind: Int)
  private def specs(s: SparkSession, d: String, everyNth: Long) = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % everyNth === 0)
      .as[Long]
      .map(id => Spec(id, 16 + (id % 5).toInt * 8, 16 + (id % 7).toInt * 8,
        (id % 4).toInt))
  }

  // ---------------------------------------------------------------- q293
  /** PNG encode → bytes → decode → integer metrics, one row per image:
    * dims/channels, pixel sum, clipped-white count, the position-weighted
    * checksum (value AND position pinned), and the same checksum after a
    * nearest-neighbor resize to 12×12. A decoder that mis-reconstructs
    * any filter row, or a resize off by one source pixel, hash-fails. */
  def q293(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val png = PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind))
        (sp.id, sp.kind, png) // the binary column at rest
      }
      .map { case (id, kind, png) =>
        val img = PngCodec.decode(png)
        val (sum, clip, wsum) = ImageOps.stats(img)
        val (_, _, rzWsum) = ImageOps.stats(ImageOps.resizeNearest(img, 12, 12))
        (id, img.width, img.height, img.channels, sum, clip, wsum, rzWsum)
      }
      .toDF("img_id", "w", "h", "ch", "px_sum", "clip_cnt", "wsum", "rz_wsum")
      .orderBy(col("img_id"))
  }

  private val pixelCte =
    """ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST(doc_id % 4 AS BIGINT) AS kind
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, w, h, kind, gx.x AS x, gy.y AS y, gc.c AS c,
      |         CASE CASE WHEN kind = 3 THEN gc.c ELSE kind END
      |           WHEN 0 THEN gx.x * 255 // (w - 1)
      |           WHEN 1 THEN gy.y * 255 // (h - 1)
      |           ELSE ((gx.x // 8 + gy.y // 8) % 2) * 255 END AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  JOIN generate_series(0, 2) gc(c)
      |    ON gc.c <= CASE WHEN kind = 3 THEN 2 ELSE 0 END)""".stripMargin

  val q293Sql: String =
    s"""WITH $pixelCte,
      |rz AS (
      |  SELECT ids.id, gi.i, gj.j, gc.c,
      |         gi.i * ids.w // 12 AS sx, gj.j * ids.h // 12 AS sy
      |  FROM ids
      |  JOIN generate_series(0, 11) gi(i) ON TRUE
      |  JOIN generate_series(0, 11) gj(j) ON TRUE
      |  JOIN generate_series(0, 2) gc(c)
      |    ON gc.c <= CASE WHEN ids.kind = 3 THEN 2 ELSE 0 END),
      |rzv AS (
      |  SELECT rz.id, rz.i, rz.j, rz.c, px.v
      |  FROM rz JOIN px ON px.id = rz.id AND px.x = rz.sx
      |                 AND px.y = rz.sy AND px.c = rz.c)
      |SELECT ids.id AS img_id,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.kind = 3 THEN 3 ELSE 1 END AS INT) AS ch,
      |       m.px_sum, m.clip_cnt, m.wsum, r.rz_wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS px_sum,
      |             CAST(SUM(CASE WHEN v = 255 THEN 1 ELSE 0 END) AS BIGINT) AS clip_cnt,
      |             CAST(SUM(v * (x + 1) * (3 * y + 7) * (c + 1)) AS BIGINT) AS wsum
      |      FROM px GROUP BY id) m ON m.id = ids.id
      |JOIN (SELECT id, CAST(SUM(v * (i + 1) * (3 * j + 7) * (c + 1)) AS BIGINT) AS rz_wsum
      |      FROM rzv GROUP BY id) r ON r.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q294
  /** Image near-dup dedup by dHash fingerprint: decode → grayscale →
    * 9×8 box means → 64-bit difference hash (as a bit string), then ONE
    * shuffle groups identical fingerprints — the same pattern at any
    * size collides (a horizontal gradient is a horizontal gradient at
    * 16×16 and 48×64), different patterns separate. Output: one row per
    * duplicate GROUP (hash, group size, id span, sizes-in-group count)
    * — the image analogue of the text-dedup cluster entries. */
  def q294(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val png = PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind))
        val img = PngCodec.decode(png)
        (sp.id, ImageOps.dhash(img), s"${img.width}x${img.height}")
      }
      .toDF("img_id", "dhash", "dims")
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_imgs"), min(col("img_id")).as("min_id"),
        max(col("img_id")).as("max_id"),
        countDistinct(col("dims")).as("n_dims"))
      .filter(col("n_imgs") >= 2)
      .orderBy(col("dhash"))
  }

  val q294Sql: String =
    s"""WITH $pixelCte,
      |gpx AS (
      |  SELECT id, w, h, x, y,
      |         CASE WHEN kind = 3 THEN SUM(v) // 3 ELSE SUM(v) END AS g
      |  FROM px GROUP BY id, w, h, kind, x, y),
      |boxes AS (
      |  SELECT id, x * 9 // w AS bi, y * 8 // h AS bj,
      |         SUM(g) // COUNT(*) AS m
      |  FROM gpx GROUP BY id, x * 9 // w, y * 8 // h),
      |bits AS (
      |  SELECT l.id, l.bj, l.bi,
      |         CASE WHEN l.m < r.m THEN '1' ELSE '0' END AS b
      |  FROM boxes l JOIN boxes r
      |    ON l.id = r.id AND l.bj = r.bj AND r.bi = l.bi + 1
      |  WHERE l.bi < 8),
      |hashes AS (
      |  SELECT id, STRING_AGG(b, '' ORDER BY bj, bi) AS dhash,
      |         ANY_VALUE(w) AS w, ANY_VALUE(h) AS h
      |  FROM bits JOIN ids USING (id) GROUP BY id)
      |SELECT dhash, COUNT(*) AS n_imgs, MIN(id) AS min_id, MAX(id) AS max_id,
      |       COUNT(DISTINCT CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR)) AS n_dims
      |FROM hashes GROUP BY dhash HAVING COUNT(*) >= 2
      |ORDER BY dhash""".stripMargin

  // ---------------------------------------------------------------- q295
  /** The fixed 24-image JPEG e2e corpus shared by q295 (baseline) and
    * q306 (progressive): per-8×8-block-FLAT content, the one class where
    * lossy JPEG is provably exact or exactly bounded (the q318 12-bit
    * discipline, at 8 bits) — what lets both entries gate against a
    * fully RELATIONAL oracle instead of frozen GoldenDump VALUES
    * (round-12 verdict item 3). Even ids: gray (DC = 8·(v−128),
    * Q(0,0)=8 → every decoded pixel EQUALS the closed form). Odd ids:
    * RGB (flat blocks survive the color transform as flat-but-
    * non-integer Y/Cb/Cr planes, so only the DC rounds: max-abs-diff
    * ≤ 3 — an envelope valid at any corpus size, stated literally). */
  private[queries] def flatJpegCorpus(id: Long,
                                      rgbGrain: Int = 8): PngCodec.Image = {
    val w = 16 + (id % 5).toInt * 8
    val h = 16 + (id % 7).toInt * 8
    if (id % 2 == 0) {
      val px = Array.tabulate[Byte](w * h) { p =>
        val bx = (p % w) / 8; val by = (p / w) / 8
        ((((bx * 7 + by * 13) % 32) * 8 + 3)).toByte
      }
      PngCodec.Image(w, h, 1, px)
    } else {
      // rgbGrain 16 keeps the blocks flat at the 4:2:0 MCU grain too
      // (q302): a chroma 8×8 sample block spans 16×16 luma pixels, and
      // only a plane that is flat ACROSS the whole MCU stays DC-only
      // after box-averaging — 8-grain content would step inside it
      val px = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val bx = (p % w) / rgbGrain; val by = (p / w) / rgbGrain
        px(p * 3) = (((bx * 11 + by * 3) % 16) * 16 + 7).toByte
        px(p * 3 + 1) = (255 - ((bx + by * 2) % 16) * 13).toByte
        px(p * 3 + 2) = (((bx * bx + by) % 13) * 19 + 4).toByte
        p += 1
      }
      PngCodec.Image(w, h, 3, px)
    }
  }

  /** One (id, fam, w, h, ch, a, b) row per corpus image: fam 0 (gray)
    * reports the decoded pixel sum + position-weighted sum — EXACT, the
    * oracle restates them closed-form; fam 1 (RGB) reports the ≤3
    * envelope as a flag + the sample count. */
  private def jpegE2e(s: SparkSession, enc: PngCodec.Image => Array[Byte],
                      rgbGrain: Int = 8): DataFrame = {
    import s.implicits._
    s.range(0, 24).as[Long]
      .map { id =>
        val src = flatJpegCorpus(id, rgbGrain)
        val dec = graft.io.JpegCodec.decode(enc(src))
        val fam = (id % 2).toInt
        if (fam == 0) {
          val (sum, _, wsum) = ImageOps.stats(dec)
          (id, fam, dec.width, dec.height, dec.channels, sum, wsum)
        } else {
          var md = 0
          var i = 0
          while (i < src.pixels.length) {
            md = math.max(md,
              math.abs((src.pixels(i) & 0xff) - (dec.pixels(i) & 0xff)))
            i += 1
          }
          (id, fam, dec.width, dec.height, dec.channels,
            if (md <= 3) 1L else 0L, src.pixels.length.toLong)
        }
      }
      .toDF("img_id", "fam", "w", "h", "ch", "a", "b")
      .orderBy(col("img_id"))
  }

  /** Baseline JPEG e2e — the LOSSY image class ([[graft.io.JpegCodec]]):
    * the flat-block corpus encodes to real baseline JPEG (in-stream DQT
    * + frequency-built DHT), decodes back, and gates RELATIONALLY (no
    * goldens). Gradient/checker/noise round-trip bounds stay pinned in
    * JpegCodecSpec — this entry owns the e2e digest. */
  def q295(s: SparkSession, d: String): DataFrame =
    jpegE2e(s, img => graft.io.JpegCodec.encode(img))

  /** RELATIONAL oracle shared by q295 and q306 (progressive transmission
    * reconstructs the identical quantized-coefficient matrix, so every
    * decoded pixel — and every metric — must match the baseline's): the
    * gray rows restate every decoded pixel closed-form in the block
    * coordinates; the RGB rows state the ≤3 envelope literally. */
  val q295Sql: String =
    """WITH ids AS (
      |  SELECT i AS id, 16 + (i % 5) * 8 AS w, 16 + (i % 7) * 8 AS h,
      |         i % 2 AS fam
      |  FROM generate_series(0, 23) t(i)),
      |px AS (
      |  SELECT id, w, h, gx.x AS x, gy.y AS y,
      |         ((gx.x // 8) * 7 + (gy.y // 8) * 13) % 32 * 8 + 3 AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  WHERE fam = 0)
      |SELECT ids.id AS img_id, CAST(ids.fam AS INT) AS fam,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.fam = 0 THEN 1 ELSE 3 END AS INT) AS ch,
      |       CASE WHEN ids.fam = 0 THEN m.px_sum ELSE 1 END AS a,
      |       CASE WHEN ids.fam = 0 THEN m.wsum
      |            ELSE CAST(ids.w * ids.h * 3 AS BIGINT) END AS b
      |FROM ids
      |LEFT JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS px_sum,
      |                  CAST(SUM(v * (x + 1) * (3 * y + 7)) AS BIGINT) AS wsum
      |           FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q296
  /** Per-video flat-block MJPEG frames shared by q296 (AVI) and q322
    * (MP4): gray per-8×8-block-flat rasters with a per-frame phase, so
    * every frame decodes BIT-EXACTLY (the q295 DC-only argument) and
    * both containers gate against fully RELATIONAL oracles — the q296
    * golden is retired (round-12 verdict item 3). */
  private def videoFrame(w: Int, h: Int, f: Int): PngCodec.Image = {
    val px = Array.tabulate[Byte](w * h) { p =>
      val bx = (p % w) / 8; val by = (p / w) / 8
      ((((bx * 7 + by * 13 + f * 11) % 32) * 8 + 3)).toByte
    }
    PngCodec.Image(w, h, 1, px)
  }

  /** VIDEO leg of the multimodal family ([[graft.io.AviMjpeg]]): six
    * fixed MJPEG-in-AVI clips (one baseline JPEG per frame, per-frame
    * phase in the block formula), muxed → demuxed → FRAME-SAMPLED
    * (every 3rd frame — the op that makes video tractable at 100 TB:
    * demux walks metadata-sized chunk headers, decode is paid only for
    * kept frames) → decoded through [[graft.io.JpegCodec]] → integer
    * metrics per sampled frame, restated closed-form by the oracle. */
  def q296(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.range(0, 6).as[Long]
      .flatMap { vid =>
        val w = 16 + (vid % 3).toInt * 16
        val h = 16 + (vid % 2).toInt * 8
        val nFrames = 8 + (vid % 5).toInt
        val frames = Vector.tabulate(nFrames)(f =>
          graft.io.JpegCodec.encode(videoFrame(w, h, f)))
        val avi = graft.io.AviMjpeg.mux(graft.io.AviMjpeg.Video(w, h, 24, frames))
        val video = graft.io.AviMjpeg.demux(avi)
        graft.io.AviMjpeg.sampleFrames(video, 3).map { case (idx, jpg) =>
          val img = graft.io.JpegCodec.decode(jpg)
          val (sum, _, wsum) = ImageOps.stats(img)
          (vid, idx, video.width, video.height, video.fps,
            video.frames.length, img.channels, sum, wsum)
        }
      }
      .toDF("vid", "frame_idx", "w", "h", "fps", "n_frames", "ch",
        "px_sum", "wsum")
      .orderBy(col("vid"), col("frame_idx"))
  }

  /** Relational oracle: the sampled frames' decoded pixels restate
    * closed-form in (⌊x/8⌋, ⌊y/8⌋, frame). */
  val q296Sql: String =
    """WITH vids AS (
      |  SELECT i AS vid, 16 + (i % 3) * 16 AS w, 16 + (i % 2) * 8 AS h,
      |         8 + (i % 5) AS nf
      |  FROM generate_series(0, 5) t(i)),
      |frames AS (
      |  SELECT vid, w, h, nf, gf.f AS f
      |  FROM vids JOIN generate_series(0, 12) gf(f)
      |    ON gf.f < nf AND gf.f % 3 = 0),
      |px AS (
      |  SELECT vid, f, w, h, nf, gx.x AS x, gy.y AS y,
      |         ((gx.x // 8) * 7 + (gy.y // 8) * 13 + f * 11) % 32 * 8 + 3 AS v
      |  FROM frames
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 23) gy(y) ON gy.y < h)
      |SELECT vid, CAST(f AS INT) AS frame_idx, CAST(w AS INT) AS w,
      |       CAST(h AS INT) AS h, CAST(24 AS INT) AS fps,
      |       CAST(nf AS INT) AS n_frames, CAST(1 AS INT) AS ch,
      |       CAST(SUM(v) AS BIGINT) AS px_sum,
      |       CAST(SUM(v * (x + 1) * (3 * y + 7)) AS BIGINT) AS wsum
      |FROM px GROUP BY vid, f, w, h, nf
      |ORDER BY vid, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q322
  /** MJPEG-in-MP4 e2e (round-13, closing the round-12 verdict's "MP4
    * sample decode" gap): six clips mux through [[graft.io.Mp4Mjpeg]]
    * (real ISO-BMFF sample tables — stsz/stsc/stco with UNEVEN chunk
    * runs), demux through the standard box walk
    * ([[graft.ops.Multimodal.mp4Samples]]), and every extracted sample
    * decodes through the engine's OWN [[graft.io.JpegCodec]] — the same
    * flat-block frames as q296, so the oracle restates every decoded
    * pixel closed-form. Non-JPEG sample payloads refuse loudly at the
    * magic sniff (Mp4MjpegSpec pins that boundary); every 2nd sample is
    * kept — the decode-only-what-you-keep contract that makes a 100 TB
    * video corpus tractable (chunk offsets are absolute, so a real
    * reader fetches byte ranges, never whole blobs). */
  def q322(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.range(0, 6).as[Long]
      .flatMap { vid =>
        val w = 16 + (vid % 3).toInt * 16
        val h = 16 + (vid % 2).toInt * 8
        val nFrames = 6 + (vid % 4).toInt
        val frames = Vector.tabulate(nFrames)(f =>
          graft.io.JpegCodec.encode(videoFrame(w, h, f)))
        // uneven chunking: 3,2,3,2,... — several stsc runs per file
        val sizes = {
          val b = Vector.newBuilder[Int]
          var left = nFrames; var three = true
          while (left > 0) {
            val n = math.min(if (three) 3 else 2, left)
            b += n; left -= n; three = !three
          }
          b.result()
        }
        val mp4 = graft.io.Mp4Mjpeg.mux(frames, sizes)
        val samples = graft.ops.Multimodal.mp4SamplesStrict(mp4).getOrElse(
          throw new IllegalStateException("muxed MP4 failed to demux"))
        require(samples.length == nFrames,
          s"demux returned ${samples.length} of $nFrames samples")
        samples.zipWithIndex.collect { case (jpg, idx) if idx % 2 == 0 =>
          val img = graft.io.ImageCodecs.decodeAny(jpg) match {
            case Left(i) => i
            case Right(_) => throw new IllegalStateException("deep MJPEG?")
          }
          val (sum, _, wsum) = ImageOps.stats(img)
          (vid, idx, img.width, img.height, nFrames, img.channels, sum, wsum)
        }
      }
      .toDF("vid", "frame_idx", "w", "h", "n_frames", "ch", "px_sum", "wsum")
      .orderBy(col("vid"), col("frame_idx"))
  }

  val q322Sql: String =
    """WITH vids AS (
      |  SELECT i AS vid, 16 + (i % 3) * 16 AS w, 16 + (i % 2) * 8 AS h,
      |         6 + (i % 4) AS nf
      |  FROM generate_series(0, 5) t(i)),
      |frames AS (
      |  SELECT vid, w, h, nf, gf.f AS f
      |  FROM vids JOIN generate_series(0, 8) gf(f)
      |    ON gf.f < nf AND gf.f % 2 = 0),
      |px AS (
      |  SELECT vid, f, w, h, nf, gx.x AS x, gy.y AS y,
      |         ((gx.x // 8) * 7 + (gy.y // 8) * 13 + f * 11) % 32 * 8 + 3 AS v
      |  FROM frames
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 23) gy(y) ON gy.y < h)
      |SELECT vid, CAST(f AS INT) AS frame_idx, CAST(w AS INT) AS w,
      |       CAST(h AS INT) AS h, CAST(nf AS INT) AS n_frames,
      |       CAST(1 AS INT) AS ch,
      |       CAST(SUM(v) AS BIGINT) AS px_sum,
      |       CAST(SUM(v * (x + 1) * (3 * y + 7)) AS BIGINT) AS wsum
      |FROM px GROUP BY vid, f, w, h, nf
      |ORDER BY vid, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q324
  /** BOX-FILTER thumbnail e2e (round 13): decode → area-average
    * downscale ([[ImageOps.resizeBox]] — the antialiased integer kernel
    * a vision-training pipeline wants where nearest-neighbor aliases) →
    * integer metrics of the 10×9 thumbnails. Every source pixel belongs
    * to exactly one output cell by the inverse floor map, and the cell
    * value is Σv / count in integers, so the oracle recomputes every
    * thumbnail pixel RELATIONALLY from the regenerated source pixels —
    * a kernel slip (wrong cell map, float rounding, channel mixing)
    * hash-fails. */
  def q324(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val img = PngCodec.decode(PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind)))
        val tb = ImageOps.resizeBox(img, 10, 9)
        var sum = 0L; var wsum = 0L
        var i = 0
        while (i < tb.pixels.length) {
          val v = tb.pixels(i) & 0xff
          val p = i / tb.channels
          sum += v
          wsum += v.toLong * (p % 10 + 1) * (3 * (p / 10) + 7) * (i % tb.channels + 1)
          i += 1
        }
        (sp.id, tb.width, tb.height, tb.channels, sum, wsum)
      }
      .toDF("img_id", "w", "h", "ch", "tb_sum", "tb_wsum")
      .orderBy(col("img_id"))
  }

  val q324Sql: String =
    s"""WITH $pixelCte,
      |cells AS (
      |  SELECT id, kind, x * 10 // w AS i, y * 9 // h AS j, c,
      |         CAST(SUM(v) // COUNT(*) AS BIGINT) AS tv
      |  FROM px GROUP BY id, kind, x * 10 // w, y * 9 // h, c)
      |SELECT ids.id AS img_id, CAST(10 AS INT) AS w, CAST(9 AS INT) AS h,
      |       CAST(CASE WHEN ids.kind = 3 THEN 3 ELSE 1 END AS INT) AS ch,
      |       m.tb_sum, m.tb_wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(tv) AS BIGINT) AS tb_sum,
      |             CAST(SUM(tv * (i + 1) * (3 * j + 7) * (c + 1)) AS BIGINT) AS tb_wsum
      |      FROM cells GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q300
  /** IMAGE CURATION PIPELINE e2e — the reference's pipeline shape
    * (decode → quality gate → dedup → transform → lossy sink) on the
    * image corpus, composing the whole round-10 image stack:
    * PNG decode → integer-Laplacian SHARPNESS gate (flat gradients score
    * ~0 per pixel and drop; checkers/RGB score ≥5 per pixel and stay —
    * thresholds stated with a wide deterministic margin) → dHash
    * keep-first dedup over survivors → resize 24×24 → JPEG re-encode →
    * decode-back with a bounded-error contract. Faces:
    *   - `census` (per kind): total vs gate-kept counts — relational
    *     oracle recomputes the Laplacian by neighbor joins on the
    *     regenerated pixels
    *   - `keeper` (per duplicate group): first-writer id + group size
    *   - `jpeg_ok`: EVERY keeper's 24×24 JPEG roundtrip lands within
    *     max-abs-diff ≤ 72 with exact dims (resize shifts the checker
    *     edges off the 8×8 block grid, so ringing peaks at 61 across
    *     the corpus — measured; the bound is the honest envelope, not
    *     flat exactness) — a bounded claim that holds at ANY scale
    *     factor, so the face is a literal TRUE, not a golden. */
  def q300(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val metas = specs(s, d, 3L)
      .map { sp =>
        val png = PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind))
        val img = PngCodec.decode(png)
        (sp.id, sp.kind, img.width, img.height,
          ImageOps.sharpness(img), ImageOps.dhash(img))
      }
      .toDF("id", "kind", "w", "h", "sharp", "dhash")
      .localCheckpoint()
    val kept = metas.filter(col("sharp") * 4 >= col("w") * col("h") * 20)
    val census = metas
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("sharp") * 4 >= col("w") * col("h") * 20, 1L)
          .otherwise(0L)).as("m"))
      .select(lit("census").as("face"), col("kind").cast("string").as("k"),
        col("n"), col("m"))
    val keepers = kept.groupBy(col("dhash"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("n"))
      .select(lit("keeper").as("face"), col("keeper").cast("string").as("k"),
        col("n"), lit(null).cast("long").as("m"))
    val jpegOk = kept.select(col("id"), col("kind"), col("w"), col("h"))
      .as[(Long, Int, Int, Int)]
      .map { case (id, kind, w, h) =>
        val rz = ImageOps.resizeNearest(ImageOps.synth(w, h, kind), 24, 24)
        val dec = graft.io.JpegCodec.decode(graft.io.JpegCodec.encode(rz))
        val ok = dec.width == 24 && dec.height == 24 &&
          dec.channels == rz.channels &&
          rz.pixels.indices.forall(i =>
            math.abs((rz.pixels(i) & 0xff) - (dec.pixels(i) & 0xff)) <= 72)
        (id, if (ok) 1L else 0L)
      }.toDF("id", "ok")
      .agg(min(col("ok")).as("allok"), count(lit(1)).as("nk"))
      .select(lit("jpeg_ok").as("face"), lit("all").as("k"),
        col("allok").as("n"), col("nk").as("m"))
    census.unionByName(keepers).unionByName(jpegOk)
      .orderBy(col("face"), col("k"))
  }

  val q300Sql: String =
    s"""WITH $pixelCte,
      |gpx AS (
      |  SELECT id, w, h, kind, x, y,
      |         CASE WHEN kind = 3 THEN SUM(v) // 3 ELSE SUM(v) END AS g
      |  FROM px GROUP BY id, w, h, kind, x, y),
      |lap AS (
      |  SELECT c.id, CAST(SUM(ABS(4 * c.g - l.g - r.g - u.g - dn.g)) AS BIGINT) AS sharp
      |  FROM gpx c
      |  JOIN gpx l  ON l.id = c.id AND l.y = c.y AND l.x = c.x - 1
      |  JOIN gpx r  ON r.id = c.id AND r.y = c.y AND r.x = c.x + 1
      |  JOIN gpx u  ON u.id = c.id AND u.x = c.x AND u.y = c.y - 1
      |  JOIN gpx dn ON dn.id = c.id AND dn.x = c.x AND dn.y = c.y + 1
      |  GROUP BY c.id),
      |meta AS (
      |  SELECT ids.id, ids.kind, ids.w, ids.h, lap.sharp,
      |         lap.sharp * 4 >= ids.w * ids.h * 20 AS kept
      |  FROM ids JOIN lap ON lap.id = ids.id),
      |boxes AS (
      |  SELECT id, x * 9 // w AS bi, y * 8 // h AS bj, SUM(g) // COUNT(*) AS m
      |  FROM gpx WHERE id IN (SELECT id FROM meta WHERE kept)
      |  GROUP BY id, x * 9 // w, y * 8 // h),
      |bits AS (
      |  SELECT l.id, l.bj, l.bi, CASE WHEN l.m < r.m THEN '1' ELSE '0' END AS b
      |  FROM boxes l JOIN boxes r
      |    ON l.id = r.id AND l.bj = r.bj AND r.bi = l.bi + 1
      |  WHERE l.bi < 8),
      |hashes AS (
      |  SELECT id, STRING_AGG(b, '' ORDER BY bj, bi) AS dhash
      |  FROM bits GROUP BY id),
      |faces AS (
      |  SELECT 'census' AS face, CAST(kind AS VARCHAR) AS k,
      |         COUNT(*) AS n,
      |         CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS m
      |  FROM meta GROUP BY kind
      |  UNION ALL
      |  SELECT 'keeper', CAST(MIN(id) AS VARCHAR), COUNT(*), CAST(NULL AS BIGINT)
      |  FROM hashes GROUP BY dhash
      |  UNION ALL
      |  SELECT 'jpeg_ok', 'all', 1,
      |         (SELECT COUNT(*) FROM meta WHERE kept))
      |SELECT * FROM faces ORDER BY face, k""".stripMargin

  // ---------------------------------------------------------------- q301
  /** IMAGE SIMILARITY SEARCH — the similarity-search family extended to
    * image features: each image embeds as a 64-dim INTEGER vector (8×8
    * grayscale box means — [[ImageOps.boxFeatures]]), query images
    * (every 5th) rank the corpus by EXACT integer dot product through
    * codegen'd higher-order functions (`zip_with` + `aggregate` — no
    * UDF), top-3 per query with the (dot desc, id asc) tie-break the
    * oracle restates. Float-free by construction, so ranking is
    * bit-deterministic cross-engine. Scale shape: the query WORKLOAD is
    * a CONSTANT (24 fixed ids — a query set, not a second corpus), so
    * the broadcast nested-loop scan is strictly LINEAR in corpus size
    * (q27's brute-force-baseline contract; measured 94× at 10× data
    * when the query side was mistakenly let scale with the corpus —
    * the LSH-bucketed q29 path is the design for corpus-sized query
    * sets); one row per (query, candidate) pair, the rank filter
    * lowers to the bounded heap when WindowTopKRewrite is live. */
  def q301(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = specs(s, d, 3L)
      .map { sp =>
        val img = PngCodec.decode(PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind)))
        (sp.id, ImageOps.boxFeatures(img))
      }
      .toDF("id", "f").localCheckpoint()
    val queries = feats.filter(col("id") % 15 === 0 && col("id") < 360)
      .select(col("id").as("q_id"), col("f").as("qf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dot").desc, col("c_id"))
    feats.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("c_id"),
        expr("aggregate(zip_with(qf, f, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("dot"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("c_id"), col("dot"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val q301Sql: String =
    s"""WITH $pixelCte,
      |gpx AS (
      |  SELECT id, w, h, x, y,
      |         CASE WHEN kind = 3 THEN SUM(v) // 3 ELSE SUM(v) END AS g
      |  FROM px GROUP BY id, w, h, kind, x, y),
      |feat AS (
      |  SELECT id, x * 8 // w AS bi, y * 8 // h AS bj,
      |         SUM(g) // COUNT(*) AS m
      |  FROM gpx GROUP BY id, x * 8 // w, y * 8 // h),
      |dots AS (
      |  SELECT qf.id AS q_id, cf.id AS c_id,
      |         CAST(SUM(qf.m * cf.m) AS BIGINT) AS dot
      |  FROM feat qf JOIN feat cf
      |    ON qf.bi = cf.bi AND qf.bj = cf.bj AND cf.id <> qf.id
      |  WHERE qf.id % 15 = 0 AND qf.id < 360 GROUP BY qf.id, cf.id),
      |ranked AS (
      |  SELECT q_id, c_id, dot,
      |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, c_id) AS rnk
      |  FROM dots)
      |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id, dot
      |FROM ranked WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q302
  /** JPEG 4:2:0 + RESTART-INTERVAL e2e (round-10 verdict item 1): the
    * flat-block corpus re-encoded the way REAL camera/web JPEGs arrive —
    * RGB images carry 2×2 luma subsampling (chroma planes box-averaged
    * to half resolution, content flat at the 16×16 MCU grain so chroma
    * blocks stay DC-only), and EVERY stream carries DRI with an RSTn
    * marker every 1–3 MCUs (width-dependent, so marker cadence varies
    * across the corpus). The oracle is q295's RELATIONAL SQL VERBATIM
    * (round-13, golden retired): restart markers are lossless framing,
    * so the gray rows must still equal the closed form, and the RGB
    * envelope flag absorbs the bounded subsampling cost; JpegCodecSpec
    * pins the bounds and the resync behavior. */
  def q302(s: SparkSession, d: String): DataFrame =
    jpegE2e(s, { img =>
      // restart cadence varies across the corpus (1-3 MCUs)
      graft.io.JpegCodec.encode(img, subsample = img.channels == 3,
        restartInterval = 1 + (img.width / 8 % 3))
    }, rgbGrain = 16)

  // ---------------------------------------------------------------- q304
  /** CORPUS-SIZED image ANN (round-10 verdict item 4) — q301's query set
    * is a pinned constant; here EVERY image is a query, and the search
    * stays sub-quadratic the way the text-ANN family does (q29's shape):
    *
    *   1. bucket each image by its dHash TOP-ROW (8 gradient bits — a
    *      similarity-preserving signature: same pattern ⇒ same bucket at
    *      any size, q294's collision property);
    *   2. HOT-BUCKET GUARD: each bucket's candidate pool is its 64
    *      smallest-id members (deterministic, oracle-restatable — a
    *      STATED recall boundary, not a silent cap: the synthetic corpus
    *      has O(1) distinct patterns, so any similarity-preserving hash
    *      concentrates; real corpora spread, and the pool then IS the
    *      bucket). The pool ranking itself is a bounded heap
    *      (rank ≤ 64 lowers through WindowTopKRewrite);
    *   3. queries join ONLY their bucket's pool — pair space is
    *      Σ bucket·min(bucket,64) ≤ 64·N, LINEAR in corpus size;
    *   4. exact integer dot on the 64-dim box-mean features (codegen'd
    *      zip_with/aggregate, no UDF), top-3 per query via the bounded
    *      heap, (dot desc, id asc) tie-break the oracle restates. */
  def q304(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = specs(s, d, 3L)
      .map { sp =>
        val img = PngCodec.decode(PngCodec.encode(ImageOps.synth(sp.w, sp.h, sp.kind)))
        (sp.id, ImageOps.boxFeatures(img), ImageOps.dhash(img).take(8))
      }
      .toDF("id", "f", "bucket").localCheckpoint()
    val wPool = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("id"))
    val pool = feats.withColumn("pr", row_number().over(wPool))
      .filter(col("pr") <= 64)
      .select(col("bucket"), col("id").as("c_id"), col("f").as("cf"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dot").desc, col("c_id"))
    feats.select(col("bucket"), col("id").as("q_id"), col("f").as("qf"))
      .join(pool, Seq("bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        expr("aggregate(zip_with(qf, cf, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("dot"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("c_id"), col("dot"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val q304Sql: String =
    s"""WITH $pixelCte,
      |gpx AS (
      |  SELECT id, w, h, kind, x, y,
      |         CASE WHEN kind = 3 THEN SUM(v) // 3 ELSE SUM(v) END AS g
      |  FROM px GROUP BY id, w, h, kind, x, y),
      |dboxes AS (
      |  SELECT id, x * 9 // w AS bi, y * 8 // h AS bj, SUM(g) // COUNT(*) AS m
      |  FROM gpx GROUP BY id, x * 9 // w, y * 8 // h),
      |dbits AS (
      |  SELECT l.id, l.bi, CASE WHEN l.m < r.m THEN '1' ELSE '0' END AS b
      |  FROM dboxes l JOIN dboxes r
      |    ON l.id = r.id AND r.bj = 0 AND l.bj = 0 AND r.bi = l.bi + 1
      |  WHERE l.bi < 8),
      |bk AS (
      |  SELECT id, STRING_AGG(b, '' ORDER BY bi) AS bucket
      |  FROM dbits GROUP BY id),
      |feat AS (
      |  SELECT id, x * 8 // w AS bi, y * 8 // h AS bj, SUM(g) // COUNT(*) AS m
      |  FROM gpx GROUP BY id, x * 8 // w, y * 8 // h),
      |pool AS (
      |  SELECT bucket, id AS c_id,
      |         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY id) AS pr
      |  FROM bk),
      |pairs AS (
      |  SELECT q.id AS q_id, c.c_id
      |  FROM bk q JOIN pool c ON q.bucket = c.bucket
      |  WHERE c.pr <= 64 AND c.c_id <> q.id),
      |dots AS (
      |  SELECT p.q_id, p.c_id, CAST(SUM(qf.m * cf.m) AS BIGINT) AS dot
      |  FROM pairs p
      |  JOIN feat qf ON qf.id = p.q_id
      |  JOIN feat cf ON cf.id = p.c_id AND cf.bi = qf.bi AND cf.bj = qf.bj
      |  GROUP BY p.q_id, p.c_id),
      |ranked AS (
      |  SELECT q_id, c_id, dot,
      |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, c_id) AS rnk
      |  FROM dots)
      |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id, dot
      |FROM ranked WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q307
  /** ADAM7-INTERLACED PNG e2e: q293's corpus re-encoded with the
    * interlace method real web PNGs often ship with (seven sub-image
    * passes, each filtered independently, scattered back on the 8×8
    * lattice; checkers additionally route through PALETTE color — the
    * PLTE-indexed layout). PNG is LOSSLESS, so the oracle is q293's
    * FULLY-RELATIONAL pixel restatement VERBATIM: DuckDB regenerates
    * every pixel and recomputes every metric; the hash matches only if
    * the interlaced (and palette) decode reproduced every byte. */
  def q307(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val src = ImageOps.synth(sp.w, sp.h, sp.kind)
        val png = PngCodec.encode(src, interlaced = true,
          palette = sp.kind == 2) // checkers: 2 colors → PLTE layout
        (sp.id, sp.kind, png)
      }
      .map { case (id, kind, png) =>
        val img0 = PngCodec.decode(png)
        // palette decode expands to RGB; gray checkers fold back so the
        // metrics stay q293's (all three channels equal by construction)
        val img =
          if (kind == 2 && img0.channels == 3)
            PngCodec.Image(img0.width, img0.height, 1,
              Array.tabulate[Byte](img0.width * img0.height)(p => img0.pixels(p * 3)))
          else img0
        val (sum, clip, wsum) = ImageOps.stats(img)
        val (_, _, rzWsum) = ImageOps.stats(ImageOps.resizeNearest(img, 12, 12))
        (id, img.width, img.height, img.channels, sum, clip, wsum, rzWsum)
      }
      .toDF("img_id", "w", "h", "ch", "px_sum", "clip_cnt", "wsum", "rz_wsum")
      .orderBy(col("img_id"))
  }

  // ---------------------------------------------------------------- q306
  /** PROGRESSIVE JPEG e2e: the q295 flat-block corpus encoded as SOF2
    * multi-scan streams (spectral selection + successive approximation —
    * the other layout real web JPEGs ship in) and decoded back. The
    * oracle is q295's RELATIONAL SQL VERBATIM, which is the point:
    * progressive transmission reconstructs the IDENTICAL quantized-
    * coefficient matrix, so every decoded pixel — and therefore every
    * metric — must equal the baseline entry's (and, for the gray rows,
    * the closed form itself). A defect anywhere in the progressive
    * machinery (EOB runs, refinement correction bits, band walks)
    * hash-fails against values derived from a DIFFERENT code path. */
  def q306(s: SparkSession, d: String): DataFrame =
    jpegE2e(s, img => graft.io.JpegCodec.encode(img, progressive = true))

  // ---------------------------------------------------------------- q308
  /** PNG TRANSPARENCY e2e — the two remaining real-world PNG shapes:
    * even ids synthesize an RGBA graphic with ≤15 distinct colors and
    * REAL transparency (fully-transparent + translucent + opaque) and
    * ship it as PALETTE + tRNS (the transparent-web-graphic layout —
    * per-entry alpha, tRNS truncated after the last non-opaque entry);
    * odd ids synthesize gray+alpha and ship as COLOR TYPE 4 (2 bytes/px,
    * every fourth one Adam7-interlaced on top). Decode EXPANDS the
    * transparency back to per-pixel alpha (type 3+tRNS → RGBA, type 4 →
    * gray+alpha), and the oracle restates every channel of every pixel
    * relationally from the same closed-form integer formulas — the hash
    * matches only if PLTE lookup, tRNS expansion (including the implied-
    * 255 tail), and the 2-channel filter path reproduced every byte.
    * Alpha is DATA here: color_sum/alpha_sum/transp_cnt/wsum all pin it. */
  def q308(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val png =
          if (sp.id % 2 == 0) {
            // palette+tRNS route: 5 base colors × 3 alpha levels
            val px = new Array[Byte](sp.w * sp.h * 4)
            var y = 0
            while (y < sp.h) {
              var x = 0
              while (x < sp.w) {
                val ci = (x * 7 + y * 3) % 5
                val base = (y * sp.w + x) * 4
                px(base) = (ci * 50 + 10).toByte
                px(base + 1) = ((ci * ci % 7) * 30).toByte
                px(base + 2) = (255 - ci * 40).toByte
                px(base + 3) =
                  (if ((x + y) % 4 == 0) 0
                   else if ((x * y) % 7 == 0) 128 else 255).toByte
                x += 1
              }
              y += 1
            }
            PngCodec.encode(PngCodec.Image(sp.w, sp.h, 4, px), palette = true)
          } else {
            // gray+alpha route (color type 4), some interlaced
            val px = new Array[Byte](sp.w * sp.h * 2)
            var y = 0
            while (y < sp.h) {
              var x = 0
              while (x < sp.w) {
                val base = (y * sp.w + x) * 2
                px(base) = ((x * 13 + y * 7) % 256).toByte
                px(base + 1) = ((x + y * 5) % 256).toByte
                x += 1
              }
              y += 1
            }
            PngCodec.encode(PngCodec.Image(sp.w, sp.h, 2, px),
              interlaced = sp.id % 4 == 3)
          }
        (sp.id, png)
      }
      .map { case (id, png) =>
        val img = PngCodec.decode(png)
        val alphaC = img.channels - 1 // RGBA→3, gray+alpha→1
        var colorSum = 0L; var alphaSum = 0L; var transp = 0L; var wsum = 0L
        var p = 0
        while (p < img.width * img.height) {
          val x = p % img.width; val y = p / img.width
          var c = 0
          while (c < img.channels) {
            val v = img.pixels(p * img.channels + c) & 0xff
            if (c == alphaC) {
              alphaSum += v
              if (v == 0) transp += 1
            } else colorSum += v
            wsum += v.toLong * (x + 1) * (3 * y + 7) * (c + 1)
            c += 1
          }
          p += 1
        }
        (id, img.width, img.height, img.channels, colorSum, alphaSum,
          transp, wsum)
      }
      .toDF("img_id", "w", "h", "ch", "color_sum", "alpha_sum",
        "transp_cnt", "wsum")
      .orderBy(col("img_id"))
  }

  val q308Sql: String =
    """WITH ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST(doc_id % 2 AS BIGINT) AS fam
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, w, h, fam, gx.x AS x, gy.y AS y, gc.c AS c,
      |         CASE WHEN fam = 0 THEN
      |           CASE gc.c
      |             WHEN 0 THEN ((gx.x * 7 + gy.y * 3) % 5) * 50 + 10
      |             WHEN 1 THEN (((gx.x * 7 + gy.y * 3) % 5)
      |                          * ((gx.x * 7 + gy.y * 3) % 5) % 7) * 30
      |             WHEN 2 THEN 255 - ((gx.x * 7 + gy.y * 3) % 5) * 40
      |             ELSE CASE WHEN (gx.x + gy.y) % 4 = 0 THEN 0
      |                       WHEN (gx.x * gy.y) % 7 = 0 THEN 128
      |                       ELSE 255 END
      |           END
      |         ELSE
      |           CASE gc.c WHEN 0 THEN (gx.x * 13 + gy.y * 7) % 256
      |                     ELSE (gx.x + gy.y * 5) % 256 END
      |         END AS v,
      |         CASE WHEN fam = 0 THEN 3 ELSE 1 END AS ac
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  JOIN generate_series(0, 3) gc(c)
      |    ON gc.c <= CASE WHEN fam = 0 THEN 3 ELSE 1 END)
      |SELECT ids.id AS img_id,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.fam = 0 THEN 4 ELSE 2 END AS INT) AS ch,
      |       m.color_sum, m.alpha_sum, m.transp_cnt, m.wsum
      |FROM ids
      |JOIN (SELECT id,
      |             CAST(SUM(CASE WHEN c <> ac THEN v ELSE 0 END) AS BIGINT) AS color_sum,
      |             CAST(SUM(CASE WHEN c = ac THEN v ELSE 0 END) AS BIGINT) AS alpha_sum,
      |             CAST(SUM(CASE WHEN c = ac AND v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS transp_cnt,
      |             CAST(SUM(v * (x + 1) * (3 * y + 7) * (c + 1)) AS BIGINT) AS wsum
      |      FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q312
  /** PNG bit-depth e2e (round 12): the corpus through every depth class
    * beyond 8 — 4-bit gray (left-bit-replication expansion, some
    * Adam7), 2-bit palette (sub-byte indices), and 16-BIT RGB through
    * the deep-color surface ([[PngCodec.encode16]]/[[PngCodec.decode16]]
    * — full 16-bit samples, never silently halved). PNG is lossless at
    * every depth, so each family gates BIT-EXACTLY: the oracle restates
    * every sample value of every pixel relationally (closed-form in
    * (x, y, c)), summed raw — a decoder off by one bit position, one
    * replication step, or one byte of a 16-bit pair hash-fails. */
  def q312(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val fam = ((sp.id % 9) / 3).toInt
        val png = fam match {
          case 0 => // 4-bit gray on the replication lattice
            val px = Array.tabulate[Byte](sp.w * sp.h) { p =>
              val x = p % sp.w; val y = p / sp.w
              (((x * 5 + y * 3) % 16) * 17).toByte
            }
            PngCodec.encode(PngCodec.Image(sp.w, sp.h, 1, px),
              interlaced = sp.id % 2 == 0, bitDepth = 4)
          case 1 => // 2-bit palette, 4 colors
            val px = new Array[Byte](sp.w * sp.h * 3)
            var p = 0
            while (p < sp.w * sp.h) {
              val x = p % sp.w; val y = p / sp.w
              val ci = (x + 2 * y) % 4
              px(p * 3) = (ci * 60 + 15).toByte
              px(p * 3 + 1) = (200 - ci * 50).toByte
              px(p * 3 + 2) = (ci * ci * 31 % 256).toByte
              p += 1
            }
            PngCodec.encode(PngCodec.Image(sp.w, sp.h, 3, px),
              palette = true, bitDepth = 2)
          case _ => // 16-bit RGB through the deep surface
            val smp = new Array[Short](sp.w * sp.h * 3)
            var p = 0
            while (p < sp.w * sp.h) {
              val x = p % sp.w; val y = p / sp.w
              var c = 0
              while (c < 3) {
                smp(p * 3 + c) =
                  ((x * (257 + c * 31) + y * 1031 + c * 7777) % 65536).toShort
                c += 1
              }
              p += 1
            }
            PngCodec.encode16(PngCodec.Image16(sp.w, sp.h, 3, smp),
              interlaced = sp.id % 2 == 0)
        }
        (sp.id, fam, png)
      }
      .map { case (id, fam, png) =>
        var sampSum = 0L; var wsum = 0L; var w = 0; var h = 0; var ch = 0
        if (fam == 2) {
          val img = PngCodec.decode16(png)
          w = img.width; h = img.height; ch = img.channels
          var p = 0
          while (p < w * h) {
            val x = p % w; val y = p / w
            var c = 0
            while (c < ch) {
              val v = img.samples(p * ch + c) & 0xffff
              sampSum += v
              wsum += v.toLong * (x + 1) * (3 * y + 7) * (c + 1)
              c += 1
            }
            p += 1
          }
        } else {
          val img = PngCodec.decode(png)
          w = img.width; h = img.height; ch = img.channels
          var p = 0
          while (p < w * h) {
            val x = p % w; val y = p / w
            var c = 0
            while (c < ch) {
              val v = img.pixels(p * ch + c) & 0xff
              sampSum += v
              wsum += v.toLong * (x + 1) * (3 * y + 7) * (c + 1)
              c += 1
            }
            p += 1
          }
        }
        (id, fam, w, h, ch, sampSum, wsum)
      }
      .toDF("img_id", "fam", "w", "h", "ch", "samp_sum", "wsum")
      .orderBy(col("img_id"))
  }

  val q312Sql: String =
    """WITH ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST(CASE WHEN doc_id % 9 = 0 THEN 0
      |                   WHEN doc_id % 9 = 3 THEN 1 ELSE 2 END AS BIGINT) AS fam
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, w, h, fam, gx.x AS x, gy.y AS y, gc.c AS c,
      |         CASE WHEN fam = 0 THEN ((gx.x * 5 + gy.y * 3) % 16) * 17
      |              WHEN fam = 1 THEN
      |           CASE gc.c
      |             WHEN 0 THEN ((gx.x + 2 * gy.y) % 4) * 60 + 15
      |             WHEN 1 THEN 200 - ((gx.x + 2 * gy.y) % 4) * 50
      |             ELSE ((gx.x + 2 * gy.y) % 4) * ((gx.x + 2 * gy.y) % 4)
      |                  * 31 % 256
      |           END
      |              ELSE (gx.x * (257 + gc.c * 31) + gy.y * 1031
      |                    + gc.c * 7777) % 65536
      |         END AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  JOIN generate_series(0, 2) gc(c)
      |    ON gc.c <= CASE WHEN fam = 0 THEN 0 ELSE 2 END)
      |SELECT ids.id AS img_id, CAST(ids.fam AS INT) AS fam,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.fam = 0 THEN 1 ELSE 3 END AS INT) AS ch,
      |       m.samp_sum, m.wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS samp_sum,
      |             CAST(SUM(v * (x + 1) * (3 * y + 7) * (c + 1)) AS BIGINT) AS wsum
      |      FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q318
  /** 12-BIT JPEG e2e (round 12): the corpus through the deep-color
    * extended-sequential class (`JpegCodec.encode12`/`decode12` — SOF1,
    * 16-bit DQT entries, full 12-bit samples in [[PngCodec.Image16]]).
    * Two families, both with ORACLE-EXACT gates and no goldens:
    *   - fam 0 (gray, EXACT): per-8×8-block flat values — DC-only blocks
    *     with Q(0,0)=8 reconstruct exactly at ANY precision (the q295
    *     argument), so the oracle restates every 12-bit sample
    *     closed-form in (⌊x/8⌋, ⌊y/8⌋) and the digest is hash-exact.
    *   - fam 1 (RGB, BOUNDED, literal-TRUE): per-block flat colors keep
    *     every YCbCr plane block-flat, so only the DC rounds — the
    *     max-abs-diff ≤ 3 envelope folds to a flag the oracle states
    *     literally, valid at any corpus size. */
  def q318(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val fam = (sp.id % 2).toInt
        if (fam == 0) {
          val smp = Array.tabulate[Short](sp.w * sp.h) { p =>
            val bx = (p % sp.w) / 8; val by = (p / sp.w) / 8
            (((bx * 7 + by * 5) % 60) * 68 + 5).toShort
          }
          (sp.id, fam,
            graft.io.JpegCodec.encode12(PngCodec.Image16(sp.w, sp.h, 1, smp)),
            Array.empty[Short])
        } else {
          val smp = new Array[Short](sp.w * sp.h * 3)
          var p = 0
          while (p < sp.w * sp.h) {
            val bx = (p % sp.w) / 8; val by = (p / sp.w) / 8
            smp(p * 3) = ((bx * 11 + by * 3) % 16 * 250 + 40).toShort
            smp(p * 3 + 1) = (4095 - ((bx + by * 2) % 16) * 200).toShort
            smp(p * 3 + 2) = ((bx * bx + by) % 13 * 300 + 10).toShort
            p += 1
          }
          (sp.id, fam,
            graft.io.JpegCodec.encode12(PngCodec.Image16(sp.w, sp.h, 3, smp)), smp)
        }
      }
      .map { case (id, fam, jpg, src) =>
        val img = graft.io.JpegCodec.decode12(jpg)
        if (fam == 0) {
          var ss = 0L; var ws = 0L
          var p = 0
          while (p < img.width * img.height) {
            val x = p % img.width; val y = p / img.width
            val v = img.samples(p) & 0xffff
            ss += v
            ws += v.toLong * (x + 1) * (3 * y + 7)
            p += 1
          }
          (id, fam, img.width, img.height, img.channels, ss, ws)
        } else {
          var md = 0
          var i = 0
          while (i < src.length) {
            md = math.max(md,
              math.abs((src(i) & 0xffff) - (img.samples(i) & 0xffff)))
            i += 1
          }
          (id, fam, img.width, img.height, img.channels,
            if (md <= 3) 1L else 0L, img.samples.length.toLong)
        }
      }
      .toDF("img_id", "fam", "w", "h", "ch", "a", "b")
      .orderBy(col("img_id"))
  }

  val q318Sql: String =
    """WITH ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST(doc_id % 2 AS BIGINT) AS fam
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, w, h, gx.x AS x, gy.y AS y,
      |         ((CAST(FLOOR(gx.x / 8) AS BIGINT) * 7
      |           + CAST(FLOOR(gy.y / 8) AS BIGINT) * 5) % 60) * 68 + 5 AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  WHERE fam = 0)
      |SELECT ids.id AS img_id, CAST(ids.fam AS INT) AS fam,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.fam = 0 THEN 1 ELSE 3 END AS INT) AS ch,
      |       CASE WHEN ids.fam = 0 THEN m.samp_sum ELSE 1 END AS a,
      |       CASE WHEN ids.fam = 0 THEN m.wsum
      |            ELSE ids.w * ids.h * 3 END AS b
      |FROM ids
      |LEFT JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS samp_sum,
      |                  CAST(SUM(v * (x + 1) * (3 * y + 7)) AS BIGINT) AS wsum
      |           FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q319
  /** TIFF e2e (round 12): the ARCHIVAL/scan image class
    * ([[graft.io.TiffCodec]] — IFD walk, strip storage, both byte
    * orders, zlib-deflate compression, 8/16-bit). TIFF is LOSSLESS in
    * this scope, so all three families gate BIT-EXACTLY against a fully
    * relational per-sample oracle: fam 0 = 8-bit gray, deflate strips;
    * fam 1 = 8-bit RGB, uncompressed, BIG-ENDIAN (the MM order walks the
    * whole IFD differently); fam 2 = 16-bit gray, deflate, through the
    * deep surface (`decode16` — sample bytes honor the file's order);
    * fam 3 (round 13) = 8-bit RGB, LZW + HORIZONTAL PREDICTOR — the
    * dominant real-world archival-scan encoding (round-12 verdict item
    * 2), same pixels as fam 1 so the oracle rows restate one formula;
    * fam 4 = 16-bit gray, LZW + predictor on the 16-bit lanes, BIG-
    * ENDIAN (differencing before byte-packing in the file's order);
    * fam 5 = 8-bit gray TILED (16-px tiles, §15 — the layout large
    * scans/geo rasters use; edge tiles pad and the decode discards the
    * padding) under LZW + predictor, same pixels as fam 0;
    * fam 6 (round 13) = 8-bit RGB, PACKBITS (§9 — the byte-RLE the
    * fax/scan encoders emit), BIG-ENDIAN, same pixels as fam 1;
    * fam 7 = 16-bit gray, PackBits + predictor, TILED — RLE, lane
    * differencing and the §15 layout composed in one file. */
  def q319(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val fam = ((sp.id % 24) / 3).toInt
        def rgbPx: Array[Byte] = {
          val px = new Array[Byte](sp.w * sp.h * 3)
          var p = 0
          while (p < sp.w * sp.h) {
            val x = p % sp.w; val y = p / sp.w
            px(p * 3) = ((x * 5 + y) % 256).toByte
            px(p * 3 + 1) = ((x + y * 11) % 256).toByte
            px(p * 3 + 2) = ((x * y + 3) % 256).toByte
            p += 1
          }
          px
        }
        def graySmp: Array[Short] = Array.tabulate[Short](sp.w * sp.h) { p =>
          ((p % sp.w * 257 + p / sp.w * 1031) % 65536).toShort
        }
        val tif = fam match {
          case 0 =>
            val px = Array.tabulate[Byte](sp.w * sp.h) { p =>
              ((p % sp.w * 13 + p / sp.w * 7) % 256).toByte
            }
            graft.io.TiffCodec.encode(PngCodec.Image(sp.w, sp.h, 1, px),
              deflate = true)
          case 1 =>
            graft.io.TiffCodec.encode(PngCodec.Image(sp.w, sp.h, 3, rgbPx),
              bigEndian = true)
          case 2 =>
            graft.io.TiffCodec.encode16(PngCodec.Image16(sp.w, sp.h, 1, graySmp),
              deflate = true)
          case 3 =>
            graft.io.TiffCodec.encode(PngCodec.Image(sp.w, sp.h, 3, rgbPx),
              lzw = true, predictor = true)
          case 4 =>
            graft.io.TiffCodec.encode16(PngCodec.Image16(sp.w, sp.h, 1, graySmp),
              lzw = true, predictor = true, bigEndian = true)
          case 5 =>
            val px = Array.tabulate[Byte](sp.w * sp.h) { p =>
              ((p % sp.w * 13 + p / sp.w * 7) % 256).toByte
            }
            graft.io.TiffCodec.encode(PngCodec.Image(sp.w, sp.h, 1, px),
              lzw = true, predictor = true, tileSize = 16)
          case 6 =>
            graft.io.TiffCodec.encode(PngCodec.Image(sp.w, sp.h, 3, rgbPx),
              bigEndian = true, packbits = true)
          case _ =>
            graft.io.TiffCodec.encode16(PngCodec.Image16(sp.w, sp.h, 1, graySmp),
              packbits = true, predictor = true, tileSize = 16)
        }
        (sp.id, fam, tif)
      }
      .map { case (id, fam, tif) =>
        var ss = 0L; var ws = 0L; var w = 0; var h = 0; var ch = 0
        def fold(v: Int, p: Int, width: Int, chs: Int): Unit = {
          val x = p / chs % width; val y = p / chs / width; val c = p % chs
          ss += v
          ws += v.toLong * (x + 1) * (3 * y + 7) * (c + 1)
        }
        if (fam == 2 || fam == 4 || fam == 7) {
          val img = graft.io.TiffCodec.decode16(tif)
          w = img.width; h = img.height; ch = img.channels
          var i = 0
          while (i < img.samples.length) {
            fold(img.samples(i) & 0xffff, i, w, ch); i += 1
          }
        } else {
          val img = graft.io.TiffCodec.decode(tif)
          w = img.width; h = img.height; ch = img.channels
          var i = 0
          while (i < img.pixels.length) {
            fold(img.pixels(i) & 0xff, i, w, ch); i += 1
          }
        }
        (id, fam, w, h, ch, ss, ws)
      }
      .toDF("img_id", "fam", "w", "h", "ch", "samp_sum", "wsum")
      .orderBy(col("img_id"))
  }

  val q319Sql: String =
    """WITH ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST((doc_id % 24) // 3 AS BIGINT) AS fam
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, w, h, fam, gx.x AS x, gy.y AS y, gc.c AS c,
      |         CASE WHEN fam IN (0, 5) THEN (gx.x * 13 + gy.y * 7) % 256
      |              WHEN fam IN (1, 3, 6) THEN
      |           CASE gc.c WHEN 0 THEN (gx.x * 5 + gy.y) % 256
      |                     WHEN 1 THEN (gx.x + gy.y * 11) % 256
      |                     ELSE (gx.x * gy.y + 3) % 256 END
      |              ELSE (gx.x * 257 + gy.y * 1031) % 65536
      |         END AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  JOIN generate_series(0, 2) gc(c)
      |    ON gc.c <= CASE WHEN fam IN (1, 3, 6) THEN 2 ELSE 0 END)
      |SELECT ids.id AS img_id, CAST(ids.fam AS INT) AS fam,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(CASE WHEN ids.fam IN (1, 3, 6) THEN 3 ELSE 1 END AS INT) AS ch,
      |       m.samp_sum, m.wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS samp_sum,
      |             CAST(SUM(v * (x + 1) * (3 * y + 7) * (c + 1)) AS BIGINT) AS wsum
      |      FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q320
  /** MIXED-FORMAT corpus through ONE FRONT DOOR (round 12,
    * [[graft.io.ImageCodecs]]): real corpora arrive with PNG, JPEG and
    * TIFF side by side and unreliable extensions — routing sniffs the
    * MAGIC BYTES (O(1) per blob, no metadata column) and preserves the
    * family's precision contract (8-bit → Image, deep → Image16, never
    * silently quantized). Three families, one per format, EVERY one
    * oracle-exact: fam 0 = 8-bit PNG (lossless), fam 1 = 16-bit TIFF
    * through the DEEP side of the dispatcher (lossless), fam 2 = 8-bit
    * JPEG flat-blocks (DC-only ⇒ exact). The `fmt` column pins that the
    * sniffer routed each blob to the right codec. */
  def q320(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specs(s, d, 3L)
      .map { sp =>
        val fam = ((sp.id % 9) / 3).toInt
        val blob = fam match {
          case 0 =>
            val px = Array.tabulate[Byte](sp.w * sp.h) { p =>
              ((p % sp.w * 9 + p / sp.w * 4) % 256).toByte
            }
            PngCodec.encode(PngCodec.Image(sp.w, sp.h, 1, px))
          case 1 =>
            val smp = Array.tabulate[Short](sp.w * sp.h) { p =>
              ((p % sp.w * 313 + p / sp.w * 577) % 65536).toShort
            }
            graft.io.TiffCodec.encode16(PngCodec.Image16(sp.w, sp.h, 1, smp),
              deflate = true)
          case _ =>
            val px = Array.tabulate[Byte](sp.w * sp.h) { p =>
              val bx = (p % sp.w) / 8; val by = (p / sp.w) / 8
              (((bx * 3 + by) % 32) * 8 + 3).toByte
            }
            graft.io.JpegCodec.encode(PngCodec.Image(sp.w, sp.h, 1, px))
        }
        (sp.id, fam, blob)
      }
      .map { case (id, fam, blob) =>
        val fmt = graft.io.ImageCodecs.sniff(blob)
        var ss = 0L; var ws = 0L; var w = 0; var h = 0; var ch = 0
        graft.io.ImageCodecs.decodeAny(blob) match {
          case Left(img) =>
            w = img.width; h = img.height; ch = img.channels
            var p = 0
            while (p < img.pixels.length) {
              val x = p % w; val y = p / w
              val v = img.pixels(p) & 0xff
              ss += v; ws += v.toLong * (x + 1) * (3 * y + 7)
              p += 1
            }
          case Right(img) =>
            w = img.width; h = img.height; ch = img.channels
            var p = 0
            while (p < img.samples.length) {
              val x = p % w; val y = p / w
              val v = img.samples(p) & 0xffff
              ss += v; ws += v.toLong * (x + 1) * (3 * y + 7)
              p += 1
            }
        }
        (id, fam, fmt, w, h, ch, ss, ws)
      }
      .toDF("img_id", "fam", "fmt", "w", "h", "ch", "samp_sum", "wsum")
      .orderBy(col("img_id"))
  }

  val q320Sql: String =
    """WITH ids AS (
      |  SELECT doc_id AS id,
      |         CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS w,
      |         CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS h,
      |         CAST(CASE WHEN doc_id % 9 = 0 THEN 0
      |                   WHEN doc_id % 9 = 3 THEN 1 ELSE 2 END AS BIGINT) AS fam
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT id, gx.x AS x, gy.y AS y,
      |         CASE WHEN fam = 0 THEN (gx.x * 9 + gy.y * 4) % 256
      |              WHEN fam = 1 THEN (gx.x * 313 + gy.y * 577) % 65536
      |              ELSE ((CAST(FLOOR(gx.x / 8) AS BIGINT) * 3
      |                     + CAST(FLOOR(gy.y / 8) AS BIGINT)) % 32) * 8 + 3
      |         END AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h)
      |SELECT ids.id AS img_id, CAST(ids.fam AS INT) AS fam,
      |       CASE ids.fam WHEN 0 THEN 'png' WHEN 1 THEN 'tiff'
      |            ELSE 'jpeg' END AS fmt,
      |       CAST(ids.w AS INT) AS w, CAST(ids.h AS INT) AS h,
      |       CAST(1 AS INT) AS ch, m.samp_sum, m.wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS samp_sum,
      |             CAST(SUM(v * (x + 1) * (3 * y + 7)) AS BIGINT) AS wsum
      |      FROM px GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q310
  /** CMYK JPEG e2e (Adobe APP14, print-pipeline class) + EXIF
    * orientation passthrough — RELATIONAL oracle, no goldens (round-13):
    * the ink planes are per-8×8-block FLAT (stored ink-inverted), so
    *   - raw CMYK (odd ids, transform 0): every channel DCT's
    *     independently → DC-only → the decode is BIT-EXACT, and the
    *     integer composite R = C'·K'/255 ([[ImageOps.cmykToRgb]])
    *     restates closed-form in the block coordinates;
    *   - YCCK (even ids, transform 2 — the layout Photoshop emits): the
    *     CMY channels ride the YCbCr transform (flat but non-integer
    *     planes → only the DC rounds, ≤3 per ink sample; K passes
    *     through exactly) — stated as a literal envelope flag.
    * Orientation 1-8 rides a minimal EXIF APP1 and reads back as
    * METADATA (never applied to pixels here — auto-rotating would break
    * byte-level dedup against the original; q321 owns the APPLY). */
  def q310(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.range(0, 24).as[Long]
      .map { id =>
        val w = 16 + (id % 5).toInt * 8
        val h = 16 + (id % 7).toInt * 8
        val transform = if (id % 2 == 0) 2 else 0
        val orient = (id % 8 + 1).toInt
        val px = new Array[Byte](w * h * 4)
        var p = 0
        while (p < w * h) {
          val bx = (p % w) / 8; val by = (p / w) / 8
          px(p * 4) = (((bx * 5 + by * 7) % 16) * 16 + 5).toByte
          px(p * 4 + 1) = (255 - ((bx * 2 + by) % 16) * 11).toByte
          px(p * 4 + 2) = (((bx + by * 3) % 13) * 17 + 8).toByte
          px(p * 4 + 3) = (255 - ((bx + by) % 8) * 23).toByte
          p += 1
        }
        val src = PngCodec.Image(w, h, 4, px)
        val jpg = graft.io.JpegCodec.encode(src, cmykTransform = transform,
          exifOrientation = orient)
        val dec = graft.io.JpegCodec.decode(jpg)
        val orientRead = graft.io.JpegCodec.exifOrientation(jpg).getOrElse(-1)
        if (transform == 0) {
          val (sum, _, wsum) = ImageOps.stats(ImageOps.cmykToRgb(dec))
          (id, dec.width, dec.height, dec.channels, transform, orientRead,
            sum, wsum)
        } else {
          var md = 0
          var i = 0
          while (i < px.length) {
            md = math.max(md,
              math.abs((px(i) & 0xff) - (dec.pixels(i) & 0xff)))
            i += 1
          }
          (id, dec.width, dec.height, dec.channels, transform, orientRead,
            if (md <= 3) 1L else 0L, (w * h * 4).toLong)
        }
      }
      .toDF("img_id", "w", "h", "ch", "transform", "orient", "a", "b")
      .orderBy(col("img_id"))
  }

  /** Relational oracle: transform-0 rows composite the closed-form ink
    * planes with the exact integer kernel; transform-2 rows state the
    * ≤3 envelope flag literally. */
  val q310Sql: String =
    """WITH ids AS (
      |  SELECT i AS id, 16 + (i % 5) * 8 AS w, 16 + (i % 7) * 8 AS h,
      |         CASE WHEN i % 2 = 0 THEN 2 ELSE 0 END AS transform,
      |         i % 8 + 1 AS orient
      |  FROM generate_series(0, 23) t(i)),
      |px AS (
      |  SELECT id, gx.x AS x, gy.y AS y, gc.c AS c,
      |         CASE gc.c
      |           WHEN 0 THEN ((gx.x // 8 * 5 + gy.y // 8 * 7) % 16) * 16 + 5
      |           WHEN 1 THEN 255 - ((gx.x // 8 * 2 + gy.y // 8) % 16) * 11
      |           ELSE ((gx.x // 8 + gy.y // 8 * 3) % 13) * 17 + 8
      |         END AS ink,
      |         255 - ((gx.x // 8 + gy.y // 8) % 8) * 23 AS kk
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h
      |  JOIN generate_series(0, 2) gc(c) ON TRUE
      |  WHERE transform = 0),
      |rgb AS (SELECT id, x, y, c, ink * kk // 255 AS v FROM px)
      |SELECT ids.id AS img_id, CAST(ids.w AS INT) AS w,
      |       CAST(ids.h AS INT) AS h, CAST(4 AS INT) AS ch,
      |       CAST(ids.transform AS INT) AS transform,
      |       CAST(ids.orient AS INT) AS orient,
      |       CASE WHEN ids.transform = 0 THEN m.rgb_sum ELSE 1 END AS a,
      |       CASE WHEN ids.transform = 0 THEN m.rgb_wsum
      |            ELSE CAST(ids.w * ids.h * 4 AS BIGINT) END AS b
      |FROM ids
      |LEFT JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS rgb_sum,
      |                  CAST(SUM(v * (x + 1) * (3 * y + 7) * (c + 1)) AS BIGINT) AS rgb_wsum
      |           FROM rgb GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q321
  /** EXIF ORIENTATION APPLY e2e (round-13, the normalize face next to
    * q310's metadata-only read): camera-tagged JPEGs (gray flat-block
    * content — bit-exact through the codec) decode, read their tag, and
    * NORMALIZE through [[ImageOps.applyOrientation]] — all 8 EXIF values
    * are exact sample transpositions, so the oracle restates the
    * transformed position-weighted sum closed-form by mapping each
    * source coordinate through the same tag-274 case table. A pipeline
    * that ignored orientation would train on rotated images; one that
    * mis-mapped any of the 8 cases hash-fails here on wsum. */
  def q321(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.range(0, 24).as[Long]
      .map { i =>
        val src = flatJpegCorpus(i * 2) // the gray (exact) face
        val orient = (i % 8 + 1).toInt
        val jpg = graft.io.JpegCodec.encode(src, exifOrientation = orient)
        val o = graft.io.JpegCodec.exifOrientation(jpg).getOrElse(1)
        val up = ImageOps.applyOrientation(graft.io.JpegCodec.decode(jpg), o)
        val (sum, _, wsum) = ImageOps.stats(up)
        (i, o, up.width, up.height, sum, wsum)
      }
      .toDF("img_id", "orient", "w", "h", "px_sum", "wsum")
      .orderBy(col("img_id"))
  }

  val q321Sql: String =
    """WITH ids AS (
      |  SELECT i AS id, i % 8 + 1 AS orient,
      |         16 + (i * 2 % 5) * 8 AS w, 16 + (i * 2 % 7) * 8 AS h
      |  FROM generate_series(0, 23) t(i)),
      |px AS (
      |  SELECT id, orient, w, h, gx.x AS x, gy.y AS y,
      |         ((gx.x // 8) * 7 + (gy.y // 8) * 13) % 32 * 8 + 3 AS v
      |  FROM ids
      |  JOIN generate_series(0, 47) gx(x) ON gx.x < w
      |  JOIN generate_series(0, 63) gy(y) ON gy.y < h),
      |moved AS (
      |  SELECT id, v,
      |         CASE orient WHEN 2 THEN w - 1 - x WHEN 3 THEN w - 1 - x
      |                     WHEN 4 THEN x        WHEN 5 THEN y
      |                     WHEN 6 THEN h - 1 - y WHEN 7 THEN h - 1 - y
      |                     WHEN 8 THEN y        ELSE x END AS dx,
      |         CASE orient WHEN 2 THEN y        WHEN 3 THEN h - 1 - y
      |                     WHEN 4 THEN h - 1 - y WHEN 5 THEN x
      |                     WHEN 6 THEN x        WHEN 7 THEN w - 1 - x
      |                     WHEN 8 THEN w - 1 - x ELSE y END AS dy
      |  FROM px)
      |SELECT ids.id AS img_id, CAST(ids.orient AS INT) AS orient,
      |       CAST(CASE WHEN ids.orient >= 5 THEN ids.h ELSE ids.w END AS INT) AS w,
      |       CAST(CASE WHEN ids.orient >= 5 THEN ids.w ELSE ids.h END AS INT) AS h,
      |       m.px_sum, m.wsum
      |FROM ids
      |JOIN (SELECT id, CAST(SUM(v) AS BIGINT) AS px_sum,
      |             CAST(SUM(v * (dx + 1) * (3 * dy + 7)) AS BIGINT) AS wsum
      |      FROM moved GROUP BY id) m ON m.id = ids.id
      |ORDER BY img_id""".stripMargin

  // ---------------------------------------------------------------- q333
  /** RAW VIDEO (round 13, [[graft.io.Y4mCodec]]): the uncompressed
    * class completing the video story (AVI/MP4 carry MJPEG; Y4M is
    * what frame-accurate tooling hands around). Per document a
    * deterministic 8×8 C420 clip is ENCODED, decoded back through the
    * codec (header parse, FRAME walk, plane split all on trial),
    * TEMPORALLY SAMPLED (every 2nd frame — the frame-sample verb of a
    * vision pipeline; fixed frame size ⇒ ranged reads at 100 TB), and
    * converted to RGB via the integer BT.601 fixed-point form with
    * replicate chroma upsampling. All integer, so the oracle restates
    * generator + 4:2:0 indexing + color math relationally — a chroma
    * swap, an off-by-one in the plane walk, or a wrong >>8 rounding
    * all break the hash. Per-row, shuffle-free. */
  def q333(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.io.Y4mCodec
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val w = 8; val h = 8
        val nF = (4 + id % 3).toInt
        val frames = (0 until nF).map { f =>
          Y4mCodec.Frame(
            Array.tabulate(w * h)(i => ((i * 5 + f * 11 + id % 13) % 256).toByte),
            Array.tabulate(w * h / 4)(j => ((j * 7 + f * 3 + id % 5) % 256).toByte),
            Array.tabulate(w * h / 4)(j => ((j * 11 + f * 7 + id % 7) % 256).toByte))
        }.toVector
        val bytes = Y4mCodec.encode(Y4mCodec.Clip(w, h, 25, 1, "C420jpeg", frames))
        val clip = Y4mCodec.decode(bytes) // codec on trial
        require(clip.frames.length == nF && clip.width == w,
          s"doc $id: bad clip round trip")
        Y4mCodec.sampleIndices(nF, step = 2).map { f =>
          val fr = clip.frames(f)
          var rs = 0L; var gs = 0L; var bs = 0L
          var p = 0
          while (p < w * h) {
            val x = p % w; val y = p / w
            val cj = (y / 2) * (w / 2) + (x / 2) // replicate upsample
            val (r, g, b) = Y4mCodec.yuvToRgb(
              fr.y(p) & 0xff, fr.u(cj) & 0xff, fr.v(cj) & 0xff)
            rs += r; gs += g; bs += b
            p += 1
          }
          (id, f.toLong, rs, gs, bs)
        }
      }
      .toDF("doc_id", "f", "r_sum", "g_sum", "b_sum")
      .orderBy(col("doc_id"), col("f"))
  }
  val q333Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, fr.f, gy.y, gx.x,
      |    ((gy.y*8 + gx.x)*5 + fr.f*11 + d.doc_id % 13) % 256 AS yv,
      |    (((gy.y//2)*4 + gx.x//2)*7 + fr.f*3 + d.doc_id % 5) % 256 AS uv,
      |    (((gy.y//2)*4 + gx.x//2)*11 + fr.f*7 + d.doc_id % 7) % 256 AS vv
      |  FROM documents d
      |  JOIN generate_series(0, 6) fr(f)
      |    ON fr.f % 2 = 0 AND fr.f < 4 + d.doc_id % 3
      |  CROSS JOIN generate_series(0, 7) gy(y)
      |  CROSS JOIN generate_series(0, 7) gx(x)),
      |rgb AS (
      |  SELECT doc_id, f,
      |    LEAST(255, GREATEST(0, (298*(yv-16) + 409*(vv-128) + 128) // 256)) AS r,
      |    LEAST(255, GREATEST(0, (298*(yv-16) - 100*(uv-128) - 208*(vv-128) + 128) // 256)) AS g,
      |    LEAST(255, GREATEST(0, (298*(yv-16) + 516*(uv-128) + 128) // 256)) AS b
      |  FROM px)
      |SELECT doc_id, CAST(f AS BIGINT) AS f,
      |       CAST(SUM(r) AS BIGINT) AS r_sum, CAST(SUM(g) AS BIGINT) AS g_sum,
      |       CAST(SUM(b) AS BIGINT) AS b_sum
      |FROM rgb GROUP BY doc_id, f ORDER BY doc_id, f""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q333_video_y4m_sample" -> ((q333 _, Some(q333Sql))),
    "q321_image_orientation_apply" -> ((q321 _, Some(q321Sql))),
    "q322_video_mp4_mjpeg_e2e" -> ((q322 _, Some(q322Sql))),
    "q324_image_resize_box" -> ((q324 _, Some(q324Sql))),
    "q310_image_jpeg_cmyk_e2e" -> ((q310 _, Some(q310Sql))),
    "q312_image_png_bitdepth_e2e" -> ((q312 _, Some(q312Sql))),
    "q318_image_jpeg12_e2e" -> ((q318 _, Some(q318Sql))),
    "q319_image_tiff_e2e" -> ((q319 _, Some(q319Sql))),
    "q320_image_multiformat_e2e" -> ((q320 _, Some(q320Sql))),
    "q308_image_png_transparency_e2e" -> ((q308 _, Some(q308Sql))),
    "q306_image_jpeg_progressive_e2e" -> ((q306 _, Some(q295Sql))),
    "q307_image_png_interlaced_e2e" -> ((q307 _, Some(q293Sql))),
    "q304_image_ann_bucketed" -> ((q304 _, Some(q304Sql))),
    "q293_image_png_e2e" -> ((q293 _, Some(q293Sql))),
    "q294_image_dedup_dhash" -> ((q294 _, Some(q294Sql))),
    "q295_image_jpeg_e2e" -> ((q295 _, Some(q295Sql))),
    "q296_video_mjpeg_e2e" -> ((q296 _, Some(q296Sql))),
    "q300_image_curation_e2e" -> ((q300 _, Some(q300Sql))),
    "q301_image_similarity" -> ((q301 _, Some(q301Sql))),
    "q302_image_jpeg420_restart_e2e" -> ((q302 _, Some(q295Sql))))
}
