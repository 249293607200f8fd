package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (the `Aggregator[IN, BUF, OUT]` extension point,
  * SURVEY §2.10): element-wise centroid of an embedding column.
  *
  * Exactness design: each float is quantized to an integer number of
  * millionths (`round(x * 1e6)`) BEFORE aggregation, so the merge arithmetic
  * is pure Long addition — associative, commutative, overflow-safe for
  * < ~9e12 rows at |x|<=1 — and the result is bit-identical regardless of
  * partitioning or merge order (and identical to the DuckDB oracle's integer
  * sums). The float→int quantization is the only rounding step and happens
  * deterministically per value in both engines.
  *
  * Scale shape: one buffer per group per partition (map-side combine), one
  * shuffled row per group — versus the posexplode alternative that shuffles
  * |dim| rows per input row.
  */
object CentroidAggregator {

  final case class Buf(var sums: Array[Long], var n: Long)

  /** dim-element centroid of quantized embeddings: output(i) = mean of
    * round(x_i * 1e6) over the group, as DOUBLE. */
  def centroidQ6(dim: Int): Aggregator[Array[Float], Buf, Array[Double]] =
    new Aggregator[Array[Float], Buf, Array[Double]] {
      override def zero: Buf = Buf(new Array[Long](dim), 0L)

      override def reduce(b: Buf, a: Array[Float]): Buf = {
        var i = 0
        val m = math.min(dim, a.length)
        while (i < m) {
          b.sums(i) += math.round(a(i).toDouble * 1e6)
          i += 1
        }
        b.n += 1
        b
      }

      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
        x.n += y.n
        x
      }

      override def finish(b: Buf): Array[Double] =
        if (b.n == 0) new Array[Double](dim)
        else b.sums.map(_.toDouble / b.n)

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }

  final case class SumsQ6(sums: Array[Long], n: Long)

  /** Integer-exact form of [[centroidQ6]]: the raw Lloyd M-step sufficient
    * statistics (per-dim q6 sums + count) with NO final division, so a
    * consumer can quantize the mean deterministically (e.g. the trained-
    * codebook path truncates sums(i)/n and re-floats — identical in Spark
    * and the DuckDB oracle by integer-op construction). */
  def sumsQ6(dim: Int): Aggregator[Array[Float], Buf, SumsQ6] =
    new Aggregator[Array[Float], Buf, SumsQ6] {
      override def zero: Buf = Buf(new Array[Long](dim), 0L)
      override def reduce(b: Buf, a: Array[Float]): Buf = {
        var i = 0
        val m = math.min(dim, a.length)
        while (i < m) {
          b.sums(i) += math.round(a(i).toDouble * 1e6)
          i += 1
        }
        b.n += 1
        b
      }
      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
        x.n += y.n
        x
      }
      override def finish(b: Buf): SumsQ6 = SumsQ6(b.sums, b.n)
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[SumsQ6] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SumsQ6]()
    }

  /** [[sumsQ6]] over DOUBLE vectors (q266's PQ residual training): the
    * quantization rounds the double directly — no float detour — so it
    * matches DuckDB's `round(res * 1e6)` on the identical double. The
    * half-up vs half-away divergence of `math.round` cannot fire: residual
    * values are dyadic rationals (differences of float-cast doubles) and
    * `x * 1e6` can only land exactly on .5 for non-dyadic x. */
  def sumsQ6D(dim: Int): Aggregator[Array[Double], Buf, SumsQ6] =
    new Aggregator[Array[Double], Buf, SumsQ6] {
      override def zero: Buf = Buf(new Array[Long](dim), 0L)
      override def reduce(b: Buf, a: Array[Double]): Buf = {
        var i = 0
        val m = math.min(dim, a.length)
        while (i < m) {
          b.sums(i) += math.round(a(i) * 1e6)
          i += 1
        }
        b.n += 1
        b
      }
      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
        x.n += y.n
        x
      }
      override def finish(b: Buf): SumsQ6 = SumsQ6(b.sums, b.n)
      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[SumsQ6] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SumsQ6]()
    }
}
