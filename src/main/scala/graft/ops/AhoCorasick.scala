package graft.ops

import scala.collection.mutable

/** Aho–Corasick multi-pattern string matching — the blocklist/PII-term
  * scanner a training-data pipeline runs over every document: ONE
  * automaton pass per text counts ALL occurrences (overlaps included) of
  * K patterns simultaneously, vs K separate regex/contains scans. At
  * 100 TB the automaton is built once on the driver (size = Σ pattern
  * lengths — metadata), broadcast, and each executor streams its rows
  * through it at O(chars + matches); K never multiplies the scan cost.
  *
  * Classic construction (Aho & Corasick 1975): goto trie over the
  * patterns, BFS failure links, output links folded into per-node
  * pattern lists. Matching follows goto, falls back through failure
  * links on a miss, and credits every pattern ending at the reached
  * node (via the folded outputs) — which is what makes the counts the
  * ALL-occurrences semantics, not leftmost-non-overlapping.
  */
final class AhoCorasick private (
    gotoMap: Array[Map[Char, Int]],
    fail: Array[Int],
    outputs: Array[Array[Int]],
    val patterns: Vector[String]) extends Serializable {

  /** Per-pattern occurrence counts (all occurrences, overlapping
    * included), index-aligned with [[patterns]]. */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoMap(s).contains(c)) s = fail(s)
      state = gotoMap(s).getOrElse(c, 0)
      val out = outputs(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }

  /** True iff any pattern occurs (early-exit scan). */
  def containsAny(text: String): Boolean = {
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoMap(s).contains(c)) s = fail(s)
      state = gotoMap(s).getOrElse(c, 0)
      if (outputs(state).nonEmpty) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "empty pattern set")
    val pats = patterns.toVector
    val gotoB = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val endAt = mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = gotoB(node).getOrElseUpdate(c, {
          gotoB += mutable.Map.empty[Char, Int]
          endAt += Nil
          gotoB.length - 1
        })
      }
      endAt(node) = pi :: endAt(node)
    }
    val n = gotoB.length
    val fail = new Array[Int](n)
    val outputs = Array.fill(n)(List.empty[Int])
    (0 until n).foreach(i => outputs(i) = endAt(i))
    // BFS: failure links + output folding (node inherits its fail's outputs)
    val queue = mutable.Queue.empty[Int]
    gotoB(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoB(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(s) = if (gotoB(f).contains(c) && gotoB(f)(c) != s) gotoB(f)(c) else 0
        outputs(s) = outputs(s) ++ outputs(fail(s))
      }
    }
    new AhoCorasick(gotoB.map(_.toMap).toArray, fail, outputs.map(_.toArray), pats)
  }
}
