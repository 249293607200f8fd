package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: bucketed co-located joins (shuffle elimination),
  * and approximate aggregates vs their exact counterparts. These document
  * the 100 TB playbook in executable form. */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = java.nio.file.Files.createTempDirectory("graft_wh")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse.toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    spark.stop()
    // remove the temp warehouse tree
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    Files.walk(warehouse).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("q24 candidate cache: overflow past the pair cap falls back to persist") {
    val d = "/root/testdata/sf0.001"
    val q24 = graft.SparkEntry.queries("q24_minhash_lsh_pairs")
    // baseline: local-relation replay path (cap well above the pair count)
    graft.queries.DedupSim.invalidateCandidates(spark, d)
    val localRows = q24(spark, d).collect()
    // force the overflow branch: cap of 0 pairs means any candidate set
    // overflows the bounded collect and the distributed plan is persisted
    sys.props("graft.test.localCandidateMaxPairs") = "0"
    try {
      graft.queries.DedupSim.invalidateCandidates(spark, d)
      val persistedDf = q24(spark, d)
      val persistedRows = persistedDf.collect()
      // identical results through either cache strategy
      assert(persistedRows.map(_.toSeq).toSeq == localRows.map(_.toSeq).toSeq)
      // and the fallback really is the persisted distributed plan, not a
      // re-collected local relation
      assert(persistedDf.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
    } finally {
      sys.props.remove("graft.test.localCandidateMaxPairs")
      graft.queries.DedupSim.invalidateCandidates(spark, d)
    }
  }

  test("q25/q78 signature memo: overflow past the row cap falls back to persist") {
    val d = "/root/testdata/sf0.001"
    val q25 = graft.SparkEntry.queries("q25_simhash")
    val q78 = graft.SparkEntry.queries("q78_simhash_neardup")
    graft.queries.DedupSim.invalidateSessionCaches(spark, d)
    val local25 = q25(spark, d).collect().map(_.toSeq).toSeq
    val local78 = q78(spark, d).collect().map(_.toSeq).toSeq
    sys.props("graft.test.localSigMaxRows") = "0" // any signature set overflows
    try {
      graft.queries.DedupSim.invalidateSessionCaches(spark, d)
      val df25 = q25(spark, d)
      assert(df25.collect().map(_.toSeq).toSeq == local25)
      assert(q78(spark, d).collect().map(_.toSeq).toSeq == local78)
      // the fallback really is the persisted distributed plan
      assert(df25.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    } finally {
      sys.props.remove("graft.test.localSigMaxRows")
      graft.queries.DedupSim.invalidateSessionCaches(spark, d)
    }
  }

  test("q79 components: distributed large-star/small-star equals driver union-find") {
    val d = "/root/testdata/sf0.001"
    val q79 = graft.SparkEntry.queries("q79_dedup_clusters")
    val local = q79(spark, d).collect().map(_.toSeq).toSeq
    sys.props("graft.test.localComponentMaxEdges") = "0" // force distributed path
    try {
      val dist = q79(spark, d).collect().map(_.toSeq).toSeq
      assert(dist == local, "both component paths must reach the same fixpoint")
    } finally sys.props.remove("graft.test.localComponentMaxEdges")
  }

  test("q79 components: a >15-diameter chain converges through the distributed path") {
    // 41-node chain 100-101-...-140 (diameter 40) — the round-4 min-label
    // propagation capped at 15 rounds and silently mislabeled exactly this
    // shape; large-star/small-star must converge and label every node with
    // the chain minimum. A second 3-clique checks multi-component labeling.
    import spark.implicits._
    val chain = (100L until 140L).map(i => (i, i + 1))
    val clique = Seq((7L, 8L), (8L, 9L), (7L, 9L))
    val edges = (chain ++ clique).toDF("a", "b")
    sys.props("graft.test.localComponentMaxEdges") = "0" // force distributed path
    try {
      val labels = graft.queries.DedupSim.componentLabels(spark, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((100L to 140L).forall(labels(_) == 100L),
        s"chain nodes must all label 100, got ${labels.view.filterKeys(_ >= 100L).toMap}")
      assert(Seq(7L, 8L, 9L).forall(labels(_) == 7L))
      assert(labels.size == 44)
    } finally sys.props.remove("graft.test.localComponentMaxEdges")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import spark.implicits._
    (0 until 10000).map(i => (i.toLong % 500, i.toLong)).toDF("key", "a")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_bucket_a")
    (0 until 5000).map(i => (i.toLong % 500, i.toDouble)).toDF("key", "b")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_bucket_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketing aligns both sides: no exchange anywhere in the plan
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 10000L / 500 * 5000) // 20 * 5000 matches per key pair
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approximate aggregates land within tolerance of exact ones") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact_d"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_d"),
      expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_med")).head()
    val (exactD, approxD) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05)
    val (exactM, approxM) = (row.getDouble(2), row.getDouble(3))
    assert(math.abs(approxM - exactM) / exactM < 0.02)
  }

  test("partitioned writes prune partitions at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").resolve("orders").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    // directory layout: one subdir per status
    val subdirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.contains("o_orderstatus=")).sorted
    assert(subdirs.map(_.split("=").last).toSeq == Seq("F", "O", "P"))
    val q = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    val plan = q.queryExecution.executedPlan.toString
    // the status predicate becomes a PartitionFilter (directory pruning),
    // NOT a data filter evaluated per row
    assert(plan.contains("PartitionFilters: [") && plan.contains("o_orderstatus"))
    assert(plan.contains("isnotnull(o_orderstatus"))
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count()
    assert(q.count() == expected && expected > 0)
  }
}
