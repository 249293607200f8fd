package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the layout/statistics tier (q191–q194) beyond the
  * DuckDB hash gate: the Morton curve is the bit-exact interleave, zone-map
  * skipping is SOUND (a skipped file can never hold a matching row), the
  * prefix-max operator equals its window formulation at any partition count,
  * the distributed Gram matrix equals the naive driver computation, the
  * skyline equals quadratic dominance, and the drift scores recompute. */
class LayoutOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val d = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("zInterleave is the exact 16+16-bit Morton curve") {
    // reference interleave in plain Scala
    def morton(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1999L, 99L),
      (65535L, 65535L), (1L, 0L), (0L, 1L), (1234L, 567L))
    val df = spark.createDataFrame(cases).toDF("x", "y")
      .withColumn("z", graft.queries.LayoutOps.zInterleave(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == morton(x, y), s"z($x,$y)")
    }
    // spot values: x-bits land at even positions, y-bits at odd
    val m = cases.map { case (x, y) => (x, y) -> morton(x, y) }.toMap
    assert(m((3L, 0L)) == 5L && m((0L, 3L)) == 10L && m((3L, 3L)) == 15L)
  }

  test("globalPrefixMaxExclusive: equals the exclusive window max, asc and desc, any partition count") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Ordinals
    val df = spark.range(0, 3000).selectExpr("(id * 2654435761) % 100003 AS k", "id % 97 AS v")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select("k", "v", "run_max").collect()
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
    for (key <- Seq(col("k"), col("k").desc)) {
      val w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
      val viaWindow = rows(df.withColumn("run_max", max(col("v")).over(w)))
      assert(rows(Ordinals.globalPrefixMaxExclusive(df, key, "v", 3)) == viaWindow,
        s"scan-max must equal the exclusive window max ($key)")
      assert(rows(Ordinals.globalPrefixMaxExclusive(df, key, "v", 8)) == viaWindow,
        s"prefix max must be invariant to the partition count ($key)")
    }
  }

  test("q191: zone-map skipping is sound and the multi-dim claim holds at sf0.01") {
    val d01 = "/root/testdata/sf0.01"
    val out = graft.queries.LayoutOps.q191(spark, d01).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 6)
    val li = graft.core.Tables.lineitem(spark, d01)
    val matchX = li.filter(col("l_partkey").between(500, 700)).count()
    val matchY = li.filter(col("l_suppkey").between(30, 60)).count()
    val matchXY = li.filter(col("l_partkey").between(500, 700) &&
      col("l_suppkey").between(30, 60)).count()
    out.foreach { case ((layout, pred), (total, skipped, scanned)) =>
      assert(total == 64, s"$layout/$pred bins_total")
      assert(skipped >= 0 && skipped <= total)
      // soundness: every matching row lives in a scanned bin
      val need = pred match {
        case "x_range" => matchX; case "y_range" => matchY; case _ => matchXY
      }
      assert(scanned >= need, s"$layout/$pred scans $scanned < $need matching rows")
    }
    // the claim under test: a linear (x,y) sort proves NOTHING skippable for
    // a y-only predicate (every file spans all of y); the Z-layout does
    assert(out(("linear", "y_range"))._2 == 0L, "linear layout should skip 0 files on y")
    assert(out(("zorder", "y_range"))._2 > 0L, "zorder layout must skip files on y")
    // and the x-axis pruning the linear sort is good at is not destroyed
    assert(out(("zorder", "x_range"))._2 >= out(("linear", "x_range"))._2 - 8)
  }

  test("HilbertD is a true Hilbert curve: bijective, unit-step adjacent, codegen equals reference") {
    // plain-Scala reference of the quadrant-fold loop
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      var x = x0; var y = y0; var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    // bijectivity + the defining adjacency property on the full 32x32 grid:
    // consecutive d-values must be Manhattan-distance-1 neighbours
    val bits = 5; val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val byD = cells.map { case (x, y) => ref(bits, x, y) -> (x, y) }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until (n.toLong * n)).toSeq, "d must be a bijection")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between ($x1,$y1) and ($x2,$y2)")
    }
    // the codegen expression computes the same curve (8-bit, random cells)
    val rnd = cells.filter { case (x, y) => (x * 31 + y * 17) % 7 == 0 }
      .map { case (x, y) => (x * 8 + 3, y * 8 + 5) } // spread into the 8-bit grid
    val df = spark.createDataFrame(rnd).toDF("x", "y")
      .withColumn("h", graft.functions.GraftFunctions.hilbertD(col("x"), col("y"), 8))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ref(8, r.getLong(0), r.getLong(1)),
        s"hilbert(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("q200: skipping audit is sound and Hilbert keeps both-axis skipping with tighter boxes") {
    val d01 = "/root/testdata/sf0.01"
    val out = graft.queries.LayoutOps.q200(spark, d01).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 6)
    val li = graft.core.Tables.lineitem(spark, d01)
    val matchX = li.filter(col("l_partkey").between(500, 700)).count()
    val matchY = li.filter(col("l_suppkey").between(30, 60)).count()
    val matchXY = li.filter(col("l_partkey").between(500, 700) &&
      col("l_suppkey").between(30, 60)).count()
    out.foreach { case ((layout, pred), (total, skipped, scanned)) =>
      assert(total == 64, s"$layout/$pred bins_total")
      val need = pred match {
        case "x_range" => matchX; case "y_range" => matchY; case _ => matchXY
      }
      assert(scanned >= need, s"$layout/$pred scans $scanned < $need matching rows")
    }
    // the locality claim: like the Z-curve (q191), Hilbert preserves
    // skipping on BOTH axes — and never loses to it on the rectangle
    assert(out(("hilbert8", "x_range"))._2 > 0L, "hilbert must skip on x")
    assert(out(("hilbert8", "y_range"))._2 > 0L, "hilbert must skip on y")
    assert(out(("hilbert8", "xy_rect"))._2 >= out(("zorder8", "xy_rect"))._2,
      "hilbert should not lose to z-order on the rectangle predicate")
  }

  test("q192: distributed Gram equals the naive driver computation, exactly") {
    val got = graft.queries.LayoutOps.q192(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = graft.core.Tables.embeddings(spark, d)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    assert(vecs.nonEmpty && got.size == 64 * 65 / 2)
    for (i <- 1 to 64; j <- i to 64) {
      val expect = vecs.map { v =>
        math.floor(v(i - 1).toDouble * v(j - 1).toDouble * 1e12).toLong
      }.sum
      assert(got((i.toLong, j.toLong)) == expect, s"gram($i,$j)")
    }
  }

  test("q192: plan carries the partial-accumulator shape, not an explode join") {
    val plan = graft.queries.LayoutOps.q192(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SerializeFromObject"), plan.take(500))
    assert(!plan.toLowerCase.contains("generate"), "no explode in the Gram plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q193: prefix-max skyline equals quadratic dominance; members are mutually non-dominated") {
    val got = graft.queries.LayoutOps.q193(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // recompute metrics independently and run the textbook O(n^2) skyline
    val m = graft.core.Tables.documents(spark, d)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("doc_id"), col("n_chars"),
        floor(lit(1e6) * size(array_distinct(col("toks"))) / size(col("toks")))
          .cast("long").as("div_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = m.filter { a =>
      !m.exists(b => b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    }.sortBy(_._1)
    assert(got.toSeq == brute.toSeq, "skyline mismatch vs quadratic dominance")
    assert(got.nonEmpty)
    for (a <- got; b <- got if a != b)
      assert(!(b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3)),
        s"$a dominated by $b inside the frontier")
  }

  test("q194: drift scores recompute exactly; grid completion is exercised") {
    val got = graft.queries.LayoutOps.q194(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val obs = graft.core.Tables.documents(spark, d)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = obs.keys.map(_._2).toSet
    val sources = obs.keys.map(_._1).toSet
    val nl = langs.map(l => l -> obs.collect { case ((_, `l`), c) => c }.sum).toMap
    val ns = sources.map(s => s -> obs.collect { case ((`s`, _), c) => c }.sum).toMap
    val n = nl.values.sum
    def q8(x: Double): BigDecimal = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    // at least one (source, lang) cell must be absent or the completion
    // left-join is vacuous at this fixture size
    assert(obs.size < sources.size * langs.size, "fixture exercises no absent cell")
    sources.foreach { s =>
      val terms = langs.toSeq.map { l =>
        val p = obs.getOrElse((s, l), 0L).toDouble / ns(s).toDouble
        val mm = nl(l).toDouble / n.toDouble
        (q8(math.abs(p - mm)), q8(math.sqrt(p * mm)))
      }
      val tv = terms.map(_._1).sum.toDouble * 0.5
      val bc = terms.map(_._2).sum.toDouble
      val (nd, gtv, gbc) = got(s)
      assert(nd == ns(s) && gtv == tv && gbc == bc, s"source $s drift mismatch")
      assert(gtv >= 0.0 && gtv <= 1.0 && gbc > 0.0 && gbc <= 1.0 + 1e-7)
    }
  }
}
