package graft.ops

/** Forced alignment — the step a TTS/ASR corpus builder runs AFTER
  * transcription to get per-token timings (which word spans which
  * frames), the input to prosody models, word-level subtitle cuts, and
  * alignment-confidence filters. The reference stops at segment-level
  * text (pa.py:296); per-word timing is the next thing its users shell
  * out to an aligner for.
  *
  * The alignment lattice is the standard monotonic DTW on a (tokens ×
  * frames) grid: a path starts at (token 0, frame 0), ends at (last
  * token, last frame), and at each frame either STAYS on the current
  * token or ADVANCES to the next — so every token owns a contiguous,
  * non-empty frame span and the spans partition the clip. The
  * minimum-cost path under a per-(token, frame) local cost is exact
  * dynamic programming, O(tokens × frames) per row.
  *
  * The ACOUSTIC model that scores (token, frame) pairs is a caller-
  * supplied function — in production a posterior from the executor-
  * lazy model singleton (the O16/O26 pattern in [[Inference]]); in the
  * oracle entry a deterministic integer stub, so the DP itself gates
  * against a fully relational DuckDB oracle (a recursive CTE carrying
  * the cost vector as a LIST — q329). All arithmetic is INTEGER: local
  * costs are Long, the infeasible sentinel is 10^15, and min/plus is
  * exact in both engines — zero float drift.
  *
  * Distribution: per-row (one clip = one grid), shuffle-free; at
  * 100 TB the aligner rides the same map as the decode. */
object Align {

  /** One aligned token: frames [startFrame, endFrame] inclusive. */
  final case class TokenSpan(token: Int, startFrame: Int, endFrame: Int)

  /** The infeasible-path sentinel: large enough to never be chosen,
    * small enough that sentinel + any real path cost can't overflow. */
  val Inf: Long = 1000000000000000L // 10^15, matches the SQL restatement

  /** Minimum-cost monotonic alignment of `nTokens` transcript tokens to
    * `nFrames` acoustic frames under `localCost(token, frame)`.
    * Returns (total path cost, per-token spans). Tie rule: a cell keeps
    * its stay-path unless advancing is STRICTLY cheaper — which lands
    * the traceback on the earliest-boundary alignment when whole paths
    * tie. Documented because span boundaries depend on it; the total
    * cost does not. */
  def forcedAlign(nTokens: Int, nFrames: Int,
                  localCost: (Int, Int) => Long): (Long, Array[TokenSpan]) = {
    require(nTokens >= 1, s"need at least one token, got $nTokens")
    require(nFrames >= nTokens,
      s"infeasible: $nTokens tokens cannot partition $nFrames frames")
    // a path sums nFrames cells; bounding each below Inf/nFrames keeps
    // every REAL accumulated cost strictly under the sentinel, so the
    // `< Inf` reachability tests stay valid (costs at the raw 10^15−1
    // cap could otherwise push a feasible path past Inf and silently
    // corrupt both the total and the traceback)
    val cellCap = Inf / nFrames
    val prev = Array.fill(nTokens)(Inf)
    val back = Array.ofDim[Byte](nFrames, nTokens) // 1 = advanced at this frame
    prev(0) = checked(localCost, 0, 0, cellCap)
    var f = 1
    while (f < nFrames) {
      val cur = Array.fill(nTokens)(Inf)
      var t = math.max(0, nTokens - (nFrames - f)) // tokens still reachable
      val tHi = math.min(nTokens - 1, f)           // can't pass token f at frame f
      while (t <= tHi) {
        val stay = prev(t)
        val adv = if (t > 0) prev(t - 1) else Inf
        if (adv < stay) { // strict: ties prefer stay
          cur(t) = adv + checked(localCost, t, f, cellCap); back(f)(t) = 1
        } else if (stay < Inf) {
          cur(t) = stay + checked(localCost, t, f, cellCap)
        }
        t += 1
      }
      System.arraycopy(cur, 0, prev, 0, nTokens)
      f += 1
    }
    val total = prev(nTokens - 1)
    // traceback: walk frames right-to-left; an ADVANCE at frame f means
    // token t's span starts at f (and t-1's ends at f-1)
    val spans = new Array[TokenSpan](nTokens)
    var t = nTokens - 1
    var end = nFrames - 1
    f = nFrames - 1
    while (f >= 1) {
      if (back(f)(t) == 1) {
        spans(t) = TokenSpan(t, f, end)
        end = f - 1
        t -= 1
      }
      f -= 1
    }
    spans(0) = TokenSpan(0, 0, end)
    (total, spans)
  }

  private def checked(localCost: (Int, Int) => Long, t: Int, f: Int,
                      cap: Long): Long = {
    val c = localCost(t, f)
    require(c >= 0 && c < cap,
      s"local cost out of range at ($t, $f): $c (cap $cap = Inf/nFrames " +
        "so accumulated path costs stay below the infeasible sentinel)")
    c
  }
}
