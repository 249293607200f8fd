package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (SURVEY §4, the 100 TB design
  * point: a few huge files/users skew any groupBy(key) or window).
  *
  * `saltedAggregate` is the two-phase pattern: explode each hot key into
  * `saltBuckets` pseudo-keys for the partial aggregation, then reduce the
  * partials in a second (tiny) aggregation on the true key. Works for any
  * algebraic aggregate (sum/count/min/max — pass the merge expression).
  * AQE's skew-join splitting handles the join side; this handles the
  * aggregation side, which AQE does not rebalance.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): hash of secondary columns, so
    * the same row always lands in the same bucket (repeatable runs). */
  def salt(saltBuckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltBuckets))

  /** Salted equi-join — the static skew treatment for a hot-keyed fact
    * against a dim that is too large to broadcast: the fact side gets a
    * deterministic salt in [0, saltBuckets), the dim side is replicated
    * saltBuckets times with an exploded salt column, and the join key
    * becomes (key, salt) — each hot key spreads over saltBuckets reducers
    * instead of melting one. Row-identical to the unsalted join: the
    * replication × salting is a partition of the original pair space.
    *
    * Decision order at scale: broadcast when the dim fits (q03); AQE skew
    * split when runtime stats expose the skew (q58's runtime assertion);
    * this when neither holds — e.g. a catastrophic low-cardinality key,
    * where per-partition stats look uniform but per-KEY volume does not. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, saltBuckets: Int,
                 saltFrom: Seq[Column]): DataFrame = {
    val salted = big.withColumn("__salt", salt(saltBuckets, saltFrom: _*))
    val repl = dim.withColumn("__salt",
      explode(typedLit((0 until saltBuckets).toArray)))
    salted.join(repl, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation:
    * {{{
    * Skew.saltedAggregate(df, Seq("user_id"), 16, Seq($"event_id"),
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merge   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    * Phase 1 shuffles on (key, salt) — 16x the parallelism on a hot key;
    * phase 2 shuffles `saltBuckets` partial rows per key. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      saltFrom: Seq[Column],
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    val phase1 = df
      .withColumn("__salt", salt(saltBuckets, saltFrom: _*))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }
}
