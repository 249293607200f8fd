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

  /** Per-ms int16-scale energies (left-to-right sum of squares within each
    * ms; a final partial ms covers the tail). This is the CANONICAL energy
    * unit for VAD: window energies are defined as left-to-right sums of
    * these per-ms energies — never global prefix-sum differences — so any
    * ms-aligned slicing of the file computes bit-identical window decisions.
    * That invariant is what makes the chunked decode path
    * (ChunkedAudio.scala) produce exactly the whole-file segmentation. */
  def msEnergies(samples: Array[Float], spms: Int): Array[Double] = {
    val nMs = (samples.length + spms - 1) / spms
    val out = new Array[Double](nMs)
    var m = 0
    while (m < nMs) {
      val a = m * spms
      val b = math.min(a + spms, samples.length)
      var acc = 0.0
      var i = a
      while (i < b) { val v = samples(i).toDouble * 32767.0; acc += v * v; i += 1 }
      out(m) = acc
      m += 1
    }
    out
  }

  /** Runs of consecutive silent window starts for start positions
    * [fromMs, untilMs), as inclusive (first, last) pairs. `e` holds per-ms
    * energies for ms indices [baseMs, baseMs + e.length) and must extend at
    * least minSilenceLenMs past untilMs (or to end-of-file); `totalLen` is
    * the GLOBAL sample count, clamping the final windows. Shared by the
    * whole-file and chunked paths so both sum the same energies in the same
    * order. */
  def silentStartRuns(e: Array[Double], baseMs: Int, spms: Int, totalLen: Long,
                      fromMs: Int, untilMs: Int,
                      minSilenceLenMs: Int = MinSilenceLenMs,
                      silenceThreshDb: Double = SilenceThresholdDb): Seq[(Int, Int)] = {
    val runs = Seq.newBuilder[(Int, Int)]
    var runStart = -1
    var prev = -2
    var s = fromMs
    while (s < untilMs) {
      val a = s.toLong * spms
      val b = math.min((s + minSilenceLenMs).toLong * spms, totalLen)
      val n = (b - a).toInt
      val silent = if (n <= 0) true else {
        // ms range of the window relative to e's base
        val mEnd = math.min((((b - baseMs.toLong * spms) + spms - 1) / spms).toInt, e.length)
        var acc = 0.0
        var m = s - baseMs
        while (m < mEnd) { acc += e(m); m += 1 }
        Dsp.dbfs(math.sqrt(acc / n)) < silenceThreshDb
      }
      if (silent) {
        if (runStart < 0) { runStart = s; prev = s }
        else if (s == prev + 1) prev = s
        else { runs += ((runStart, prev)); runStart = s; prev = s }
      }
      s += 1
    }
    if (runStart >= 0) runs += ((runStart, prev))
    runs.result()
  }

  /** Non-silent complement of silent ranges within [0, durationMs). */
  def complement(silent: Seq[Interval], durationMs: Long): Seq[Interval] = {
    val nonsilent = Seq.newBuilder[Interval]
    var cursor = 0L
    silent.foreach { r =>
      if (r.startMs > cursor) nonsilent += Interval(cursor, r.startMs)
      cursor = r.endMs
    }
    if (cursor < durationMs) nonsilent += Interval(cursor, durationMs)
    nonsilent.result()
  }

  /** pydub detect_nonsilent equivalent (pa.py:104-106): slide a
    * MinSilenceLenMs window in 1 ms steps; a window is silent when its dBFS
    * is strictly below the threshold; contiguous silent window starts merge
    * into silent ranges ([start, lastStart + window]); non-silent = the
    * complement within [0, durationMs]. Window energies come from the
    * canonical per-ms energies (see msEnergies) — the scan is
    * O(durationMs * window), with the window in ms units (300 adds per
    * position), which stays cheap at any file length and keeps the chunked
    * path bit-identical. */
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
    val e = msEnergies(samples, spms)
    val runs = silentStartRuns(e, 0, spms, samples.length.toLong,
      0, durationMs - minSilenceLenMs + 1, minSilenceLenMs, silenceThreshDb)
    val silent = runs.map { case (f, l) => Interval(f.toLong, (l + minSilenceLenMs).toLong) }
    complement(silent, durationMs.toLong)
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
