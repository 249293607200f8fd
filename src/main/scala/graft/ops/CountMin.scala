package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a long-typed key column: fixed-space frequency
  * point estimates with the one-sided guarantee estimate ≥ true count
  * (hash collisions only ever ADD mass to a counter — they never subtract).
  *
  * Next to the repo's other frequency machinery this fills a distinct slot:
  * Misra-Gries (`HeavyHitters`) answers "which terms are heavy" with a
  * candidate set; HLL (q149) answers "how many distinct"; count-min answers
  * point queries — "how often does THIS key occur" — as a pure, broadcastable
  * expression. That makes it the right shape for a map-side frequency
  * prefilter: probe(key) compiles to `least(element_at(...), ...)` over the
  * sketch rows held as literals, so the test runs inside whole-stage codegen
  * on the scanning side of an exchange, the same slot q178's bloom
  * `might_contain` occupies — but thresholded on FREQUENCY, not membership.
  *
  * Scale shape of `build`: one scan; each of the `depth` hash rows buckets
  * map-side into ≤ `width` partial counters (hash-partial aggregation), so
  * the exchange and the driver collect are bounded by depth × width — sketch
  * size, never data size. The standard CM bound applies to the merged rows:
  * for each key, est ≤ true + ε·N with probability 1 − (1/2)^depth where
  * ε = e/width (Cormode & Muthukrishnan); est ≥ true always.
  *
  * The reference has no sketch tier (it group-counts exactly,
  * /root/reference/process_audio.py:338-342); this is the 100 TB replacement
  * for "count everything then look at a few keys".
  */
object CountMin {

  /** A built sketch: `rows(i)(b)` counts keys hashing to bucket b under hash
    * row i; `total` is the number of observations (row 0 sums to it). */
  final case class Sketch(depth: Int, width: Int, rows: Array[Array[Long]], total: Long) {

    /** Point-estimate expression: min over hash rows of the addressed
      * counter. Pure built-in functions (xxhash64 / pmod / element_at /
      * least) over array LITERALS — no UDF, stays codegen'd, and broadcast
      * to every task for free as part of the plan. Must use the same
      * (seed-as-first-argument) hashing as `build`. */
    def estimate(key: Column): Column =
      (0 until depth).map { i =>
        element_at(
          typedlit(rows(i).toSeq),
          (pmod(xxhash64(lit(i), key), lit(width)).cast("int") + 1))
      }.reduce(least(_, _))
  }

  /** One-pass build. `key` must be long-compatible; nulls are the caller's
    * problem (filter first). Spark's `xxhash64(lit(i), key)` chains the
    * literal row index through the hash as a seed, giving `depth`
    * independent-enough hash rows from one built-in. */
  def build(df: DataFrame, key: Column, depth: Int, width: Int): Sketch = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val buckets = array((0 until depth).map { i =>
      pmod(xxhash64(lit(i), key), lit(width)).cast("int")
    }: _*)
    // posexplode emits (hash_row, bucket) per input row; the groupBy's
    // map-side partial agg caps every partition's contribution at
    // depth × width counters before the (tiny) exchange. The collect is
    // bounded by the same product — sketch cells, not data.
    val cells = df
      .select(posexplode(buckets).as(Seq("i", "b")))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val rows = Array.fill(depth)(Array.fill(width)(0L))
    cells.foreach(r => rows(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    Sketch(depth, width, rows, rows(0).sum)
  }
}
