package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Distributed heavy-hitter detection: per-partition Misra-Gries sketches
  * merged on the driver, feeding an exact recount of the candidates.
  *
  * Why not a plain groupBy(term).count()? At 100 TB the token vocabulary is
  * hundreds of millions of keys — the full-vocabulary exchange dwarfs the
  * query when all that's wanted is the handful of terms above a frequency
  * threshold. The sketch pass reads the corpus once and emits ≤ k counters
  * per partition (bounded by construction, NOT by data); only tokens
  * matching the ≤ k merged candidates ever reach the recount exchange.
  *
  * Guarantee (Misra-Gries, and Agarwal et al.'s mergeable-summaries bound
  * for the union step): every counter underestimates its term's true count
  * by at most N/(k+1), and a term absent from the merged sketch has true
  * count ≤ N/(k+1). So for a threshold fraction t with t > 1/(k+1), every
  * true heavy hitter (count > t·N) is present among the candidates — the
  * exact recount then makes the final answer EXACT and deterministic
  * regardless of partitioning (the candidate set may vary with the data
  * layout; the recounted, threshold-filtered output cannot).
  */
object HeavyHitters {

  /** One sketch-pass row: a candidate counter, or (when isTotal) a
    * partition's token total — both emitted from the same single scan. */
  final case class SkRow(term: String, cnt: Long, isTotal: Boolean)

  /** Misra-Gries decrement step: subtract 1 from every counter, dropping
    * the ones that reach zero. Each trigger retires k+1 token occurrences
    * (the arriving token plus one from each counter), hence the N/(k+1)
    * undercount bound. */
  private def decrementAll(m: mutable.HashMap[String, Long]): Unit = {
    val ks = m.keys.toArray
    var i = 0
    while (i < ks.length) {
      val v = m(ks(i)) - 1
      if (v == 0L) m.remove(ks(i)) else m.update(ks(i), v)
      i += 1
    }
  }

  /** Single corpus scan: per-partition MG sketch over the token stream
    * (documents stay rows — no explode) plus the exact token total.
    * Returns (totalTokens, merged candidate counters). The collect is
    * bounded by partitions × (k+1) rows — a sketch, never data. */
  def sketch(tokens: Dataset[Seq[String]], k: Int): (Long, Map[String, Long]) = {
    require(k > 0, "k must be positive")
    import tokens.sparkSession.implicits._
    val rows = tokens.mapPartitions { it =>
      val m = mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { seq =>
        seq.foreach { t =>
          n += 1
          if (m.contains(t)) m.update(t, m(t) + 1L)
          else if (m.size < k) m.update(t, 1L)
          else decrementAll(m)
        }
      }
      Iterator.single(SkRow(null, n, isTotal = true)) ++
        m.iterator.map { case (t, c) => SkRow(t, c, isTotal = false) }
    }.collect()

    val total = rows.iterator.filter(_.isTotal).map(_.cnt).sum
    // union-sum the partition sketches, then restore the k-counter bound by
    // subtracting the (k+1)-th largest value (the mergeable-summaries trim:
    // error stays ≤ Σ Ni/(k+1) = N/(k+1))
    val merged = mutable.HashMap.empty[String, Long]
    rows.iterator.filterNot(_.isTotal).foreach { r =>
      merged.update(r.term, merged.getOrElse(r.term, 0L) + r.cnt)
    }
    if (merged.size > k) {
      val sub = merged.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val ks = merged.keys.toArray
      ks.foreach { key =>
        val v = merged(key) - sub
        if (v <= 0L) merged.remove(key) else merged.update(key, v)
      }
    }
    (total, merged.toMap)
  }
}
