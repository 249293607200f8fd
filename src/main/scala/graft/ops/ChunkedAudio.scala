package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.Pipeline.{SegmentRow, TargetRate}

/** Chunked audio decode — the 100 TB design point for multi-hour sources
  * (the whole-file row model breaks the 2 GB array/row limits and skews the
  * per-file stages; see Pipeline.decodeWavRows for the reference-parity
  * whole-file path, pa.py:79-92).
  *
  * The decoder emits fixed-duration CHUNK rows (default 60 s) instead of one
  * whole-file row, each carrying a MinSilenceLenMs lookahead slice, so every
  * downstream row is bounded (~3.8 MB at 16 kHz) regardless of source length:
  *
  *   1. per chunk (parallel): canonical per-ms VAD energies + silent-run
  *      extraction over this chunk's window starts (the lookahead covers
  *      windows that cross the boundary);
  *   2. per file (tiny data): silent runs from all chunks merge into silent
  *      ranges; complement → split → greedy merge → pad — interval algebra
  *      over a few hundred tuples, never samples;
  *   3. segment assembly: segments join back to the chunks they overlap
  *      (≤ 2 chunks for a ≤ 15.4 s padded segment at 60 s chunks) and the
  *      padded slices concatenate in chunk order.
  *
  * Output is BIT-IDENTICAL to Pipeline.segmentFiles on the same bytes: the
  * decode→downmix→normalize→resample kernels are the same code, and VAD
  * window energies are canonical left-to-right per-ms sums (Segmentation
  * .msEnergies), not global prefix differences, so chunk-local evaluation
  * reproduces the whole-file decisions exactly (ChunkedAudioSpec proves it).
  *
  * Ingest caveat, stated honestly: rows arrive via binaryFile, so the DECODE
  * task still materializes one file (exactly the reference's memory model);
  * a true >2 GB source additionally needs a ranged-read WAV source, which
  * composes with everything below (chunk rows are the interface).
  */
object ChunkedAudio {

  /** One fixed-duration chunk of a decoded, normalized, resampled file.
    * `res` covers resampled samples [startMs*spms, endOut) where endOut is
    * the next chunk's start (or the global tail for the final chunk);
    * `look` holds the next MinSilenceLenMs of samples (empty on the final
    * chunk) so VAD windows starting in this chunk never need a neighbor. */
  final case class AudioChunk(name: String, idx: Int, startMs: Long, endMs: Long,
                              durationMs: Long, totalLen: Long,
                              res: Array[Float], look: Array[Float])

  // intermediate row types (public: Spark's encoder codegen needs access)
  final case class ChunkRuns(name: String, durationMs: Long,
                             runs: Seq[(Int, Int)])
  final case class SegSpec(name: String, segIdx: Int,
                           startMs: Long, endMs: Long,
                           padStartMs: Long, padEndMs: Long)
  final case class SegPart(name: String, segIdx: Int,
                           startMs: Long, endMs: Long,
                           padStartMs: Long, padEndMs: Long,
                           chunkIdx: Int, part: Array[Float])

  /** O1-O5 with chunked output: decode (path, content) rows exactly like
    * Pipeline.decodeWavRows, then slice the resampled file into chunk rows.
    * Decode failures skip the file (pa.py:91-92). */
  def decodeChunked(rows: DataFrame, chunkSec: Int = 60): Dataset[AudioChunk] = {
    require(chunkSec > 0, s"chunkSec must be positive, got $chunkSec")
    import rows.sparkSession.implicits._
    val lookMs = Segmentation.MinSilenceLenMs
    rows.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      graft.Pipeline.decodeToPcm(path, bytes).toSeq.flatMap { case (name, res) =>
        val spms = TargetRate / 1000
        val durationMs = (res.length / spms).toLong
        val chunkMs = chunkSec * 1000L
        val nChunks = math.max(1L, (durationMs + chunkMs - 1) / chunkMs).toInt
        (0 until nChunks).map { c =>
          val startMs = c * chunkMs
          val endMs = math.min(startMs + chunkMs, durationMs)
          val a = (startMs * spms).toInt
          // the final chunk absorbs the partial-ms tail
          val b = if (c == nChunks - 1) res.length else (endMs * spms).toInt
          val lookEnd = math.min((endMs + lookMs) * spms, res.length.toLong).toInt
          AudioChunk(name, c, startMs, endMs, durationMs, res.length.toLong,
            java.util.Arrays.copyOfRange(res, a, b),
            if (lookEnd > b) java.util.Arrays.copyOfRange(res, b, lookEnd)
            else Array.emptyFloatArray)
        }
      }
    }
  }

  /** O6-O9 over chunk rows: distributed VAD, per-file interval reduce,
    * chunk-join segment assembly. Produces exactly Pipeline.segmentFiles'
    * SegmentRows. */
  def segmentChunks(chunks: Dataset[AudioChunk]): Dataset[SegmentRow] = {
    import chunks.sparkSession.implicits._
    val spms = TargetRate / 1000
    val winMs = Segmentation.MinSilenceLenMs

    // stage 1 (parallel per chunk): silent runs among THIS chunk's window
    // starts, energies from chunk + lookahead
    val chunkRuns: Dataset[ChunkRuns] = chunks.map { ch =>
      val lastStart = ch.durationMs - winMs // last valid window start, global
      val from = ch.startMs.toInt
      val until = (math.min(ch.endMs, lastStart + 1)).toInt
      if (ch.durationMs < winMs || from >= until)
        ChunkRuns(ch.name, ch.durationMs, Nil)
      else {
        val arr =
          if (ch.look.isEmpty) ch.res
          else {
            val merged = new Array[Float](ch.res.length + ch.look.length)
            System.arraycopy(ch.res, 0, merged, 0, ch.res.length)
            System.arraycopy(ch.look, 0, merged, ch.res.length, ch.look.length)
            merged
          }
        val e = Segmentation.msEnergies(arr, spms)
        ChunkRuns(ch.name, ch.durationMs,
          Segmentation.silentStartRuns(e, from, spms, ch.totalLen, from, until))
      }
    }

    // stage 2 (per file, interval algebra only): merge cross-chunk runs,
    // complement, split, greedy-merge, pad
    val segSpecs: Dataset[SegSpec] = chunkRuns
      .groupByKey(_.name)
      .flatMapGroups { (name, it) =>
        val all = it.toSeq
        val durationMs = all.head.durationMs
        if (durationMs < winMs) {
          // whole clip non-silent if non-empty (pydub short-input rule)
          val ivs = if (durationMs > 0)
            Segmentation.mergeGreedy(Segmentation.splitLong(
              Seq(Segmentation.Interval(0, durationMs))))
          else Nil
          ivs.zipWithIndex.iterator.map { case (iv, i) =>
            val p = Segmentation.pad(iv, durationMs)
            SegSpec(name, i, iv.startMs, iv.endMs, p.startMs, p.endMs)
          }
        } else {
          // silent-start runs are disjoint and ordered once sorted; adjacent
          // runs from neighboring chunks (last+1 == first) fuse into one
          val sorted = all.flatMap(_.runs).sortBy(_._1)
          val fused = Seq.newBuilder[(Int, Int)]
          var cur: (Int, Int) = null
          sorted.foreach { r =>
            if (cur == null) cur = r
            else if (r._1 == cur._2 + 1) cur = (cur._1, r._2)
            else { fused += cur; cur = r }
          }
          if (cur != null) fused += cur
          val silent = fused.result().map { case (f, l) =>
            Segmentation.Interval(f.toLong, (l + winMs).toLong)
          }
          val ivs = Segmentation.mergeGreedy(Segmentation.splitLong(
            Segmentation.complement(silent, durationMs)))
          ivs.zipWithIndex.iterator.map { case (iv, i) =>
            val p = Segmentation.pad(iv, durationMs)
            SegSpec(name, i, iv.startMs, iv.endMs, p.startMs, p.endMs)
          }
        }
      }

    // stage 3: segments join the chunks they overlap; padded slices
    // concatenate in chunk order. Both sides shuffle on name only.
    val parts: Dataset[SegPart] = segSpecs
      .joinWith(chunks, segSpecs("name") === chunks("name"))
      .flatMap { case (seg, ch) =>
        val segA = seg.padStartMs * spms
        val segB = math.min(seg.padEndMs * spms, ch.totalLen)
        val chA = ch.startMs * spms
        val chB = chA + ch.res.length
        val a = math.max(segA, chA)
        val b = math.min(segB, chB)
        if (a >= b) None
        else Some(SegPart(seg.name, seg.segIdx, seg.startMs, seg.endMs,
          seg.padStartMs, seg.padEndMs, ch.idx,
          java.util.Arrays.copyOfRange(ch.res, (a - chA).toInt, (b - chA).toInt)))
      }

    parts
      .groupByKey(p => (p.name, p.segIdx))
      .mapGroups { (_, it) =>
        val ps = it.toArray.sortBy(_.chunkIdx)
        val h = ps.head
        val total = ps.map(_.part.length).sum
        val samples = new Array[Float](total)
        var off = 0
        ps.foreach { p =>
          System.arraycopy(p.part, 0, samples, off, p.part.length)
          off += p.part.length
        }
        SegmentRow(h.name, h.startMs, h.endMs, h.padStartMs, h.padEndMs,
          samples, TargetRate)
      }
  }

  /** Chunked equivalent of decode+segment: drop-in front end for
    * Pipeline.audioQuality and everything after it. */
  def segments(rows: DataFrame, chunkSec: Int = 60): Dataset[SegmentRow] =
    segmentChunks(decodeChunked(rows, chunkSec))
}
