package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q368's per-side hot-cap guard, pinned beyond the gate corpus (the
  * guard-never-exercised trap): at sf0.01 no band bucket approaches the
  * cap, so the DuckDB hash gate would keep passing with the guard
  * deleted. This spec drives the factored bipartite rollup with a
  * synthetic band table whose hot bucket exceeds the cap on ONE side,
  * and asserts the boilerplate bucket is excluded from the pair space
  * while a normal bucket still reports contamination. */
class BipartiteBandSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("a bucket above the cap on the train side is excluded; normal buckets hit") {
    import spark.implicits._
    val cap = graft.queries.TextOps.Q357HotCap
    // bench docs: ids % 5 == 0. Bucket "hot": cap+5 train chunks + 1
    // bench chunk (train side above cap -> excluded). Bucket "ok":
    // 2 train chunks (docs 1, 2) + 2 bench chunks (docs 5, 10).
    val hotTrain = (1 to cap + 5).map(i => (i.toLong * 5 + 1, 0L, 0, "hot"))
    val hotBench = Seq((5L, 0L, 0, "hot"))
    val okTrain = Seq((1L, 3L, 1, "ok"), (2L, 7L, 1, "ok"))
    val okBench = Seq((5L, 1L, 1, "ok"), (10L, 2L, 1, "ok"))
    val bands = (hotTrain ++ hotBench ++ okTrain ++ okBench)
      .toDF("doc_id", "chunk_id", "band_idx", "band_key")
    val out = graft.queries.TextOps
      .bipartiteBandHits(bands, col("doc_id") % 5 === 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // ONLY docs 1 and 2 via "ok" (1 chunk each, banding with 2 bench
    // docs); with the guard deleted the hot bucket would flag cap+5 docs
    assert(out == Seq((1L, 1L, 2L), (2L, 1L, 2L)))
  }

  test("a bucket above the cap on the bench side is excluded symmetrically") {
    import spark.implicits._
    val cap = graft.queries.TextOps.Q357HotCap
    val hotBench = (1 to cap + 3).map(i => (i.toLong * 5, 0L, 0, "hot"))
    val hotTrain = Seq((7L, 0L, 0, "hot"))
    val bands = (hotBench ++ hotTrain)
      .toDF("doc_id", "chunk_id", "band_idx", "band_key")
    val out = graft.queries.TextOps
      .bipartiteBandHits(bands, col("doc_id") % 5 === 0).collect()
    assert(out.isEmpty, "bench-side boilerplate bucket must not flag anything")
  }
}
