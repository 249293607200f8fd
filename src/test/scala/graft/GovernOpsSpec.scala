package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the governance/statistics tier (q195–q198) beyond
  * the DuckDB hash gate: the k-anonymity ladder is monotone (coarsening can
  * only merge groups — k_min rises, group counts and risk mass fall), the
  * autocorrelation coefficients recompute exactly from BigInt sufficient
  * statistics, the concentration indices recompute per source, and the
  * calibration bins partition the corpus with the summary row's gap equal
  * to the recomputed ECE. */
class GovernOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val d = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q195: ladder equals driver recompute; coarsening is monotone") {
    val got = graft.queries.GovernOps.q195(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == Set("l0_nat_seg_year", "l1_nat_year", "l2_region_year"))
    // driver recompute from raw microdata
    val fact = graft.core.Tables.orders(spark, d)
      .join(graft.core.Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        year(col("o_orderdate")).cast("long"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val regionOf = graft.core.Tables.nation(spark, d)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def audit(qi: ((Long, String, Long, String)) => Product)
        : (Long, Long, Long, Long, Long, Long) = {
      // note .values.toSeq BEFORE .map: mapping a Map to (Long, Long) pairs
      // would rebuild a Map and silently dedupe groups by their k
      val groups = fact.groupBy(qi).values.toSeq.map { rows =>
        (rows.size.toLong, rows.map(_._4).distinct.size.toLong)
      }
      (groups.map(_._1).sum, groups.size.toLong, groups.map(_._1).min,
        groups.filter(_._1 < 5).map(_._1).sum,
        groups.count(_._2 < 2).toLong,
        groups.filter(_._2 < 2).map(_._1).sum)
    }
    assert(got("l0_nat_seg_year") == audit(t => (t._1, t._2, t._3)))
    assert(got("l1_nat_year") == audit(t => (t._1, t._3)))
    assert(got("l2_region_year") == audit(t => (regionOf(t._1), t._3)))
    // monotonicity: a coarser level merges groups — rows stay, k_min can
    // only rise, group count and sub-k risk mass can only fall
    val Seq(l0, l1, l2) =
      Seq("l0_nat_seg_year", "l1_nat_year", "l2_region_year").map(got)
    assert(l0._1 == l1._1 && l1._1 == l2._1, "rows_total must not change")
    assert(l0._3 <= l1._3 && l1._3 <= l2._3, "k_min must be non-decreasing")
    assert(l0._2 >= l1._2 && l1._2 >= l2._2, "n_groups must be non-increasing")
    assert(l0._4 >= l1._4 && l1._4 >= l2._4, "risk mass must be non-increasing")
  }

  test("q196: ACF recomputes exactly from BigInt sufficient statistics") {
    val got = graft.queries.GovernOps.q196(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (1L to 7L).toSet)
    val series = graft.core.Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy("day").agg(sum(col("cents")).cast("long").as("x"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    for (k <- 1 to 7) {
      val pairs = series.toSeq.flatMap { case (day, x) =>
        series.get(day.plusDays(k.toLong)).map(y => (BigInt(x), BigInt(y)))
      }
      val n = BigInt(pairs.size)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val dxx = n * sxx - sx * sx; val dyy = n * syy - sy * sy
      // exact floor-isqrt (BigInteger.sqrt), then half-away-from-zero division
      val den = BigInt(dxx.bigInteger.sqrt()) * BigInt(dyy.bigInteger.sqrt())
      val expect = num.sign * ((num.abs * BigInt(2000000000L) + den) / (den * 2))
      val (nPairs, gotR) = got(k.toLong)
      assert(nPairs == pairs.size.toLong, s"lag $k pair count")
      assert(BigInt(gotR) == expect, s"lag $k: got $gotR expect $expect")
      assert(expect.abs <= BigInt(1000000001L), s"lag $k r_e9 out of range")
    }
  }

  test("q199 chunked bitmaps: >64 segment types, exact vs quadratic") {
    // 150 segment types -> 3 long chunks; deterministic synthetic memberships
    import spark.implicits._
    val rows = for {
      u <- 0L until 400L
      t <- 0 until 150
      if (u * 31 + t * 17) % 7 == 0 || t.toLong == u % 150
    } yield (u, f"seg$t%03d")
    val ev = rows.toDF("user_id", "event_type")
    val got = graft.queries.GovernOps.segmentOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val byType = rows.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    assert(types.size == 150, s"fixture must exceed 64 types, got ${types.size}")
    for (a <- types; b <- types if a <= b) {
      val sa = byType(a); val sb = byType(b)
      val both = (sa intersect sb).size.toLong
      if (both == 0L) assert(!got.contains((a, b)), s"($a,$b) should be absent")
      else {
        val uni = (sa union sb).size.toLong
        assert(got((a, b)) == ((both, 1000000L * both / uni)), s"($a,$b)")
      }
    }
  }

  test("q199: bitmask rollup equals the quadratic distinct-pair matrix") {
    val got = graft.queries.GovernOps.q199(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // brute force: distinct (user, type) pairs, then the quadratic overlap
    val ut = graft.core.Tables.events(spark, d)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    assert(types.size > 1 && got.nonEmpty)
    for (a <- types; b <- types if a <= b) {
      val both = (byType(a) intersect byType(b)).size.toLong
      if (both == 0L) assert(!got.contains((a, b)), s"($a,$b) should be absent")
      else {
        val union = (byType(a) union byType(b)).size.toLong
        assert(got((a, b)) == ((both, (1000000L * both) / union)),
          s"overlap($a,$b)")
      }
    }
    // diagonal rows are the per-segment audiences with jaccard exactly 1e6
    types.foreach { t =>
      assert(got((t, t)) == ((byType(t).size.toLong, 1000000L)), s"diag($t)")
    }
  }

  test("q197: concentration indices recompute exactly per source") {
    val got = graft.queries.GovernOps.q197(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val cnt = graft.core.Tables.documents(spark, d)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sources = cnt.keys.map(_._1).toSet
    assert(got.keySet == sources && sources.size > 1)
    sources.foreach { s =>
      val os = cnt.collect { case ((`s`, _), c) => c }.toSeq
      val ns = os.sum; val so2 = os.map(o => o * o).sum; val ns2 = ns * ns
      val expect = (ns, os.size.toLong,
        math.floor(1e6 * (ns2 - so2).toDouble / ns2.toDouble).toLong,
        math.floor(1000.0 * ns2.toDouble / so2.toDouble).toLong,
        math.floor(1e6 * os.max.toDouble / ns.toDouble).toLong)
      assert(got(s) == expect, s"source $s concentration mismatch")
      // sanity: gini in [0, 1e6), effective languages in [1, n_langs]
      assert(got(s)._3 >= 0L && got(s)._3 < 1000000L)
      assert(got(s)._4 >= 1000L && got(s)._4 <= 1000L * os.size)
    }
  }

  test("q198: bins partition the corpus; the summary gap is the recomputed ECE") {
    val rows = graft.queries.GovernOps.q198(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val (summary, bins) = rows.partition(_._1 == -1L)
    assert(summary.length == 1 && bins.nonEmpty)
    // driver recompute of (score_ppm, label) per doc from Spark-tokenized stats
    val m = graft.core.Tables.documents(spark, d)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("n_chars"), size(col("toks")), size(array_distinct(col("toks"))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val scored = m.map { case (nc, nt, ndt) =>
      val lenNorm = math.min(nc, 2000L).toDouble / 2000.0
      val dv = ndt.toDouble / nt.toDouble
      val ppm = math.min(math.floor(1e6 * (0.3 * lenNorm + 0.7 * dv)).toLong, 999999L)
      (ppm, nc >= 200 && nc <= 5000 && nt >= 30)
    }
    val expectBins = scored.groupBy(_._1 / 100000L).map { case (b, xs) =>
      val n = xs.length.toLong; val pos = xs.count(_._2).toLong
      val s = xs.map(_._1).sum
      (b, n, pos, s / n, (1000000L * pos) / n, math.abs(1000000L * pos - s) / n)
    }.toSeq.sortBy(_._1)
    assert(bins.toSeq == expectBins, "per-bin rows mismatch")
    val nAll = scored.length.toLong
    assert(bins.map(_._2).sum == nAll, "bins must partition the corpus")
    val ece = scored.groupBy(_._1 / 100000L).map { case (_, xs) =>
      math.abs(1000000L * xs.count(_._2).toLong - xs.map(_._1).sum)
    }.sum / nAll
    assert(summary.head._6 == ece, "summary gap must equal the recomputed ECE")
    assert(summary.head._2 == nAll)
  }
}
