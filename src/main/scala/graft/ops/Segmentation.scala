package graft.ops

/** Interval algebra for silence-based segmentation (O6-O9, pa.py:96-161).
  * Pure functions over ms intervals — unit/property-tested directly, then
  * lifted into the Spark pipeline per file (each file's interval list is
  * small and bounded, so the per-file fold is cheap; parallelism is across
  * files, which is where 100 TB scale lives — SURVEY §7.4 HARD #1).
  */
object Segmentation {

  val MinDurationMs = 3000L        // pa.py:17
  val MaxDurationMs = 15000L       // pa.py:18
  val SilenceThresholdDb = -35.0   // pa.py:19
  val MinSilenceLenMs = 300        // pa.py:20
  val SegmentPaddingMs = 200L      // pa.py:21

  final case class Interval(startMs: Long, endMs: Long)

  /** pydub detect_nonsilent equivalent (pa.py:104-106): slide a
    * MinSilenceLenMs window in 1 ms steps; a window is silent when its dBFS
    * is strictly below the threshold; contiguous silent window starts merge
    * into silent ranges ([start, lastStart + window]); non-silent = the
    * complement within [0, durationMs]. Implemented with a prefix sum of
    * squares so the scan is O(n) rather than O(n * window). */
  def detectNonSilent(samples: Array[Float], rate: Int,
                      minSilenceLenMs: Int = MinSilenceLenMs,
                      silenceThreshDb: Double = SilenceThresholdDb): Seq[Interval] = {
    // ms-indexed scan requires an integral samples-per-ms; the pipeline
    // canonicalizes to 16 kHz before VAD (pa.py:89), so this is a contract,
    // not a limitation — fail fast rather than drift on e.g. 44.1 kHz input
    require(rate >= 1000 && rate % 1000 == 0, s"VAD requires rate divisible by 1000, got $rate")
    val spms = rate / 1000 // samples per ms
    val durationMs = (samples.length / spms).toInt
    if (durationMs < minSilenceLenMs) {
      // pydub returns no silent ranges for audio shorter than the window,
      // so the whole clip is non-silent (if non-empty).
      return if (durationMs > 0) Seq(Interval(0, durationMs.toLong)) else Nil
    }
    // prefix(i) = sum of squares of int16-scale samples [0, i)
    val prefix = new Array[Double](samples.length + 1)
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toDouble * 32767.0
      prefix(i + 1) = prefix(i) + v * v
      i += 1
    }
    def windowSilent(startMs: Int): Boolean = {
      val a = startMs * spms
      val b = math.min((startMs + minSilenceLenMs) * spms, samples.length)
      val n = b - a
      if (n <= 0) return true
      val rms = math.sqrt((prefix(b) - prefix(a)) / n)
      Dsp.dbfs(rms) < silenceThreshDb
    }
    // silent window starts, then merge contiguous runs into silent ranges
    val lastStart = durationMs - minSilenceLenMs
    val silentRanges = Seq.newBuilder[Interval]
    var runStart = -1
    var prevStart = -2
    var s = 0
    while (s <= lastStart) {
      if (windowSilent(s)) {
        if (runStart < 0 || s != prevStart + 1) {
          if (runStart >= 0) silentRanges += Interval(runStart.toLong, (prevStart + minSilenceLenMs).toLong)
          runStart = s
        }
        prevStart = s
      }
      s += 1
    }
    if (runStart >= 0) silentRanges += Interval(runStart.toLong, (prevStart + minSilenceLenMs).toLong)
    // complement
    val silent = silentRanges.result()
    val nonsilent = Seq.newBuilder[Interval]
    var cursor = 0L
    silent.foreach { r =>
      if (r.startMs > cursor) nonsilent += Interval(cursor, r.startMs)
      cursor = r.endMs
    }
    if (cursor < durationMs) nonsilent += Interval(cursor, durationMs.toLong)
    nonsilent.result()
  }

  /** Pass 1 (O7, pa.py:111-122): split any interval longer than
    * MaxDurationMs into MaxDurationMs chunks (last chunk = remainder). */
  def splitLong(intervals: Seq[Interval], maxMs: Long = MaxDurationMs): Seq[Interval] =
    intervals.flatMap { iv =>
      val dur = iv.endMs - iv.startMs
      if (dur > maxMs) {
        (0L until dur by maxMs).map { off =>
          Interval(iv.startMs + off, math.min(iv.startMs + off + maxMs, iv.endMs))
        }
      } else Seq(iv)
    }

  /** Pass 2 (O8, pa.py:124-147): greedy merge of adjacent intervals while the
    * SPAN (next.end - mergedStart, gaps included — pa.py:140) stays within
    * MaxDurationMs; emit merged runs, dropping any shorter than
    * MinDurationMs (pa.py:128-131). Inherently a sequential fold per file. */
  def mergeGreedy(intervals: Seq[Interval],
                  minMs: Long = MinDurationMs,
                  maxMs: Long = MaxDurationMs): Seq[Interval] = {
    if (intervals.isEmpty) return Nil
    val out = Seq.newBuilder[Interval]
    var start = intervals.head.startMs
    var end = intervals.head.endMs
    def saveIfValid(): Unit = if (end - start >= minMs) out += Interval(start, end)
    intervals.tail.foreach { next =>
      if (next.endMs - start <= maxMs) {
        end = next.endMs
      } else {
        saveIfValid()
        start = next.startMs
        end = next.endMs
      }
    }
    saveIfValid()
    out.result()
  }

  /** Padding (O9, pa.py:149-161): ±SegmentPaddingMs clamped to [0, len].
    * Returns (paddedStart, paddedEnd); the unpadded interval remains the
    * segment's identity (naming, DB row — pa.py:339-343). */
  def pad(iv: Interval, durationMs: Long, padMs: Long = SegmentPaddingMs): Interval =
    Interval(math.max(0L, iv.startMs - padMs), math.min(durationMs, iv.endMs + padMs))

  /** Full per-file segmentation: VAD → split → merge. */
  def segment(samples: Array[Float], rate: Int): Seq[Interval] =
    mergeGreedy(splitLong(detectNonSilent(samples, rate)))
}
