package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING at corpus scale — the other half of the
  * tokenizer surface: q74 APPLIES a merge table; this learns one. The
  * algorithm is the published byte-pair-encoding rule (Sennrich et al.
  * 2016, and every GPT-style vocab since): repeatedly find the most
  * frequent adjacent token pair in the corpus and merge its
  * occurrences GREEDILY LEFT-TO-RIGHT (in "aaaa", merge (a,a) yields
  * (aa)(aa), never overlapping).
  *
  * == The distributed formulation ==
  *
  * Corpus state lives as ONE DELIMITED STRING per document (each token
  * wrapped `|tok|`), so the merge application is a plain codegen'd
  * `replace(s, '|a||b|', '|ab|')` — per-row, shuffle-free, and its
  * left-to-right-continue-after-replacement semantics IS the BPE
  * greedy rule (both the JVM and DuckDB state it identically, which is
  * what lets q332 gate every iteration relationally). Pair counting is
  * the one shuffle per iteration: split → zip-adjacent → explode →
  * groupBy(pair). The winning pair is a ONE-ROW driver collect (count
  * DESC, then lexicographic (left, right) — the deterministic
  * tie-break both engines state the same way). State is
  * localCheckpoint'ed per iteration so iteration k never replays
  * iterations 1..k−1's replaces.
  *
  * Caller contract: token text must never contain the `|` delimiter —
  * sanitize first (q332 restricts to `[a-z ]`). At 100 TB one trains
  * on a sample; the formulation is the same plan over fewer rows. */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Wrap sanitized text as the delimited char-token string:
    * "ab c" → "|a||b|| ||c|"; empty text → empty string. */
  def delimited(sanitized: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(sanitized) === 0, lit(""))
      .otherwise(array_join(
        transform(split(sanitized, ""), c => concat(lit("|"), c, lit("|"))), ""))

  /** Learn `k` merges over `docs` (columns: doc_id, s — the delimited
    * state from [[delimited]]). Returns the learned merge table and the
    * final per-doc state (doc_id, s). */
  def train(spark: SparkSession, docs: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1, s"need at least one merge: $k")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var state = docs.select(col("doc_id"), col("s")).localCheckpoint()
    var rank = 1
    while (rank <= k) {
      val best = state
        .select(expr("filter(split(s, '[|]'), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 2)
        .select(explode(arrays_zip(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      require(best.nonEmpty, s"corpus exhausted before merge $rank (no pairs left)")
      val a = best(0).getString(0)
      val b = best(0).getString(1)
      val n = best(0).getLong(2)
      require(!a.contains("'") && !b.contains("'"),
        s"unsanitized token reached the trainer: '$a' '$b'")
      merges += Merge(rank, a, b, n)
      // the greedy merge: literal replace, continue-after-replacement —
      // '|a||b|' collapses to '|ab|' left-to-right, exactly BPE's rule
      state = state
        .withColumn("s", expr(s"replace(s, '|$a||$b|', '|$a$b|')"))
        .localCheckpoint()
      rank += 1
    }
    (merges.toSeq, state)
  }
}
