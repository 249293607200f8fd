package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Round-7 continuation: physical-layout planning and corpus-statistics
  * operators for the 100 TB tier — Z-ORDER multi-dimensional clustering with
  * a zone-map skipping audit (the Delta/Iceberg `OPTIMIZE ZORDER BY` slot),
  * a distributed GRAM MATRIX (covariance/PCA prep over the embedding
  * corpus), a PARETO-FRONTIER data-selection skyline, and a
  * distribution-DRIFT audit (total variation + Bhattacharyya per source).
  *
  * The reference's closest analog: its one physical-layout decision is the
  * per-recording output directory fan-out (/root/reference/process_audio.py:
  * 173-186) and it has no statistics surface at all — these queries add the
  * layout/selection/drift machinery a corpus that size actually needs.
  */
object LayoutOps {

  // ---------------------------------------------------------------- q191
  /** 16-bit × 16-bit Morton (Z-order) interleave: bit i of x lands at 2i,
    * bit i of y at 2i+1. Pure integer shifts/masks — exact and identical in
    * any engine, which is what lets the oracle state the same curve. At
    * 100 TB the dims are first quantile-binned to 16-bit codes (documented
    * swap); the fixture keys already fit. */
  private[graft] def zInterleave(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private[graft] def zSqlExprOn(xn: String, yn: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($xn >> $i) & 1) * ${1L << (2 * i)}) + ((($yn >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  private val zSqlExpr: String = zSqlExprOn("x", "y")

  /** Z-order clustering vs linear sort, judged by what a scan can SKIP:
    * bin lineitem into 64 equal files two ways — linear `(x, y)` sort and
    * Morton-curve order — build each file's zone map (min/max per dim,
    * exactly what parquet footers carry), and audit three predicates
    * (x-range, y-range, both) against the zone maps. The output states, per
    * layout × predicate, how many of the 64 files a reader proves skippable
    * and how many rows survive into the scan: the linear layout skips
    * nothing for the y-only predicate (every file spans all of y) while the
    * Z-layout skips for BOTH dims — the measured, hash-checked version of
    * the multi-dimensional-clustering claim behind `OPTIMIZE ZORDER BY`.
    *
    * Scale shape: file assignment is `Ordinals.globalOrdinal` (range
    * exchange + count job — no single-task global sort even though the
    * ORACLE states a `row_number()` window); zone maps are one 64-group
    * aggregation; the audit is 64-row metadata. Two ordered passes total,
    * exactly what an OPTIMIZE job costs. */
  def q191(s: SparkSession, d: String): DataFrame = {
    // checkpoint: base feeds count + TWO globalOrdinal passes, each of
    // which evaluates its input twice through RDD lineage (zipWithIndex's
    // size job + the indexed pass) — without the barrier the scan + the
    // z-interleave ran ~5× (guide §1.2/§5; the q200 fix, same shape)
    val base = Tables.lineitem(s, d).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .withColumn("z", zInterleave(col("x"), col("y")))
      .localCheckpoint()
    val n = base.count()
    def binned(layout: String, key: Column): DataFrame =
      graft.ops.Ordinals.globalOrdinal(base, key, 32)
        .withColumn("bin", expr(s"((ordinal - 1) * 64) div $n"))
        .withColumn("layout", lit(layout))
    val zones = binned("linear", struct(col("x"), col("y"), col("ok"), col("ln")))
      .unionByName(binned("zorder", struct(col("z"), col("ok"), col("ln"))))
      .groupBy(col("layout"), col("bin"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        count(lit(1)).as("nrows"))
    zones
      .withColumn("skip_x", col("max_x") < 500 || col("min_x") > 700)
      .withColumn("skip_y", col("max_y") < 30 || col("min_y") > 60)
      .select(col("layout"), col("nrows"), explode(array(
        struct(lit("x_range").as("pred"), col("skip_x").as("skip")),
        struct(lit("y_range").as("pred"), col("skip_y").as("skip")),
        struct(lit("xy_rect").as("pred"), (col("skip_x") || col("skip_y")).as("skip")))).as("a"))
      .groupBy(col("layout"), col("a.pred").as("pred"))
      .agg(count(lit(1)).as("bins_total"),
        sum(when(col("a.skip"), 1L).otherwise(0L)).as("bins_skipped"),
        sum(when(col("a.skip"), 0L).otherwise(col("nrows"))).as("rows_scanned"))
      .orderBy(col("layout"), col("pred"))
  }
  val q191Sql: String =
    s"""WITH base AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln,
       |         l_partkey AS x, l_suppkey AS y
       |  FROM lineitem),
       |zed AS (SELECT *, $zSqlExpr AS z FROM base),
       |n AS (SELECT COUNT(*) AS n FROM base),
       |lin AS (SELECT x, y,
       |  ((row_number() OVER (ORDER BY x, y, ok, ln) - 1) * 64) // (SELECT n FROM n) AS bin
       |  FROM zed),
       |zor AS (SELECT x, y,
       |  ((row_number() OVER (ORDER BY z, ok, ln) - 1) * 64) // (SELECT n FROM n) AS bin
       |  FROM zed),
       |zones AS (
       |  SELECT 'linear' AS layout, bin, min(x) AS min_x, max(x) AS max_x,
       |         min(y) AS min_y, max(y) AS max_y, COUNT(*) AS nrows
       |  FROM lin GROUP BY 2
       |  UNION ALL
       |  SELECT 'zorder', bin, min(x), max(x), min(y), max(y), COUNT(*)
       |  FROM zor GROUP BY 2),
       |flags AS (
       |  SELECT layout, nrows,
       |    (max_x < 500 OR min_x > 700) AS skip_x,
       |    (max_y < 30 OR min_y > 60) AS skip_y
       |  FROM zones),
       |un AS (
       |  SELECT layout, 'x_range' AS pred, skip_x AS skip, nrows FROM flags
       |  UNION ALL SELECT layout, 'y_range', skip_y, nrows FROM flags
       |  UNION ALL SELECT layout, 'xy_rect', (skip_x OR skip_y), nrows FROM flags)
       |SELECT layout, pred, COUNT(*) AS bins_total,
       |  CAST(SUM(CASE WHEN skip THEN 1 ELSE 0 END) AS BIGINT) AS bins_skipped,
       |  CAST(SUM(CASE WHEN skip THEN 0 ELSE nrows END) AS BIGINT) AS rows_scanned
       |FROM un GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Distributed GRAM MATRIX X'X over the embedding corpus (upper triangle,
    * 1-based dims) — the one-pass covariance/PCA-prep aggregation. Each
    * partition folds its rows into a LOCAL dim×(dim+1)/2 accumulator and
    * emits exactly 2080 partial rows, so the shuffle carries
    * #partitions × 2080 longs regardless of corpus size — the MLlib
    * treeAggregate shape, stated as a DataFrame job. The naive explode-join
    * formulation would push N × 4096 rows through the exchange; PlanCheck
    * pins that no explode/posexplode appears in this plan.
    *
    * Exactness across engines: each term is float→double (exact) ×
    * (exact: 24+24 significant bits < 53), quantized to a scaled long via
    * `floor(t * 1e12)` BEFORE any summation — integer addition is
    * order-independent, so partition count and fold order can't move the
    * hash. At 100 TB the scaled-long accumulator is swapped for DECIMAL
    * partials (documented; overflow headroom here is ~1e4 corpora). */
  def q192(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = 64
    val nPairs = dim * (dim + 1) / 2
    val partials = Tables.embeddings(s, d).select(col("embedding"))
      .as[Array[Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](nPairs)
        var any = false
        it.foreach { v =>
          require(v.length == dim, s"embedding dim ${v.length} != $dim")
          any = true
          var i = 0; var k = 0
          while (i < dim) {
            val vi = v(i).toDouble
            var j = i
            while (j < dim) {
              acc(k) += math.floor(vi * v(j).toDouble * 1e12).toLong
              k += 1; j += 1
            }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else {
          val out = new Array[(Long, Long, Long)](nPairs)
          var i = 0; var k = 0
          while (i < dim) {
            var j = i
            while (j < dim) { out(k) = ((i + 1).toLong, (j + 1).toLong, acc(k)); k += 1; j += 1 }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "partial")
    partials.groupBy(col("i"), col("j"))
      .agg(sum(col("partial")).cast("long").as("gram_q"))
      .orderBy(col("i"), col("j"))
  }
  val q192Sql: String =
    """SELECT ri.range AS i, rj.range AS j,
      |  CAST(SUM(CAST(FLOOR(CAST(embedding[ri.range] AS DOUBLE)
      |    * CAST(embedding[rj.range] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS gram_q
      |FROM embeddings, range(1, 65) ri, range(1, 65) rj
      |WHERE rj.range >= ri.range
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q193
  /** PARETO-FRONTIER data selection: the skyline of documents under
    * (n_chars MAX, lexical-diversity MAX) — the docs no other doc beats on
    * both axes, i.e. the non-dominated set a curation pass keeps when it
    * refuses to collapse two quality axes into one weighted score.
    * Diversity is ppm-quantized `floor(1e6·distinct/total tokens)` so both
    * axes are exact integers.
    *
    * Distributed 2-D skyline WITHOUT the quadratic dominance join and
    * WITHOUT a global window sort: group to one row per n_chars (max
    * diversity), run `Ordinals.globalPrefixMaxExclusive` over n_chars DESC
    * — "best diversity among STRICTLY longer docs" — then a doc is on the
    * frontier iff it holds its length-group's max diversity AND strictly
    * beats that running max. One group-by + one range exchange over the
    * GROUPED (distinct-lengths-sized) table + one equi-join back.
    *
    * The oracle is the textbook quadratic NOT EXISTS dominance query — an
    * independent formulation, so the hash gate proves the prefix-max
    * decomposition IS the skyline (ties kept: equal on both axes ⇒ neither
    * strictly dominates). */
  def q193(s: SparkSession, d: String): DataFrame = {
    // checkpoint: the tokenize-heavy metric table feeds BOTH the
    // per-n_chars max chain and the final join probe — without the
    // barrier the split + array_distinct pass ran twice (guide §1.2)
    val m = Tables.documents(s, d)
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("doc_id"), col("n_chars"),
        floor(lit(1e6) * size(array_distinct(col("toks"))) / size(col("toks")))
          .cast("long").as("div_ppm"))
      .localCheckpoint()
    val g = m.groupBy(col("n_chars")).agg(max(col("div_ppm")).as("gmax"))
    val pm = graft.ops.Ordinals.globalPrefixMaxExclusive(
      g, col("n_chars").desc, "gmax", 8)
    m.join(pm, Seq("n_chars"))
      .filter(col("div_ppm") === col("gmax") &&
        (col("run_max").isNull || col("div_ppm") > col("run_max")))
      .select(col("doc_id"), col("n_chars"), col("div_ppm"))
      .orderBy(col("doc_id"))
  }
  val q193Sql: String =
    """WITH m AS (
      |  SELECT doc_id, n_chars,
      |    CAST(FLOOR(1e6 * len(list_distinct(t)) / len(t)) AS BIGINT) AS div_ppm
      |  FROM (SELECT doc_id, n_chars,
      |          string_split_regex(trim(lower(text)), '\s+') AS t
      |        FROM documents))
      |SELECT doc_id, n_chars, div_ppm FROM m a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM m b
      |  WHERE b.n_chars >= a.n_chars AND b.div_ppm >= a.div_ppm
      |    AND (b.n_chars > a.n_chars OR b.div_ppm > a.div_ppm))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q194
  /** Distribution DRIFT audit: each source's language mix vs the corpus
    * marginal, scored by TOTAL VARIATION distance (½ Σ|p−m|, the "what
    * fraction of this source's docs are mis-distributed" number) and the
    * BHATTACHARYYA coefficient (Σ √(p·m); Hellinger² = 1 − bc) — the
    * per-source drift gates a mixture pipeline alarms on, next to q185's
    * corpus-level chi-squared. The grid is completed like q185: a language
    * absent from a source still contributes |0 − m| to TV and 0 to BC.
    *
    * Exactness: ratios are single IEEE divisions, √ is correctly rounded by
    * contract (the ONE non-rational op — unlike ln/exp it is bit-identical
    * across engines), and each term quantizes to DECIMAL(18,8) before the
    * order-independent sum; ×0.5 applies after the sum (exact halving).
    * Scale: one corpus aggregation; everything after is margin-sized and
    * broadcast. */
  def q194(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
    val ns  = obs.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
    val nl  = obs.groupBy(col("lang")).agg(sum(col("o")).as("n_l"))
    val tot = obs.agg(sum(col("o")).as("n"))
    ns.crossJoin(broadcast(nl)).crossJoin(broadcast(tot))
      .join(broadcast(obs), Seq("source", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("p", col("o").cast("double") / col("n_s").cast("double"))
      .withColumn("m", col("n_l").cast("double") / col("n").cast("double"))
      .withColumn("tv_term", abs(col("p") - col("m")).cast(DecimalType(18, 8)))
      .withColumn("bc_term", sqrt(col("p") * col("m")).cast(DecimalType(18, 8)))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        (sum(col("tv_term")).cast("double") * lit(0.5)).as("tv"),
        sum(col("bc_term")).cast("double").as("bc"))
      .orderBy(col("source"))
  }
  val q194Sql: String =
    """WITH obs AS (
      |  SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2),
      |ns AS (SELECT source, SUM(o) AS n_s FROM obs GROUP BY 1),
      |nl AS (SELECT lang, SUM(o) AS n_l FROM obs GROUP BY 1),
      |tot AS (SELECT SUM(o) AS n FROM obs),
      |grid AS (
      |  SELECT ns.source, nl.lang, ns.n_s,
      |    CAST(coalesce(obs.o, 0) AS DOUBLE) / CAST(ns.n_s AS DOUBLE) AS p,
      |    CAST(nl.n_l AS DOUBLE) / CAST(tot.n AS DOUBLE) AS m
      |  FROM ns CROSS JOIN nl CROSS JOIN tot
      |  LEFT JOIN obs ON obs.source = ns.source AND obs.lang = nl.lang)
      |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST(abs(p - m) AS DECIMAL(18,8))) AS DOUBLE) * 0.5 AS tv,
      |  CAST(SUM(CAST(sqrt(p * m) AS DECIMAL(18,8))) AS DOUBLE) AS bc
      |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q200
  /** The Hilbert step as an unrolled CTE chain for the oracle: each step
    * folds one quadrant bit into `hd` and reflects/transposes (hx, hy) into
    * the next sub-square's frame — the same loop body `HilbertD` generates
    * as Java, stated as SQL. Pure integer ops, so both engines walk the
    * identical curve. */
  private def hilbertSqlSteps(bits: Int): String =
    (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""h${i + 1} AS (
         |  SELECT ok, ln, x, y, qx, qy,
         |    hd + ${s * s} * xor(3 * rx, ry) AS hd,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END) ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END) ELSE hy END AS hy
         |  FROM (SELECT *,
         |      CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM h$i))""".stripMargin
    }.mkString(",\n")

  /** Hilbert-curve clustering vs the Morton curve, judged by the SAME
    * zone-map skipping audit as q191 — the third point on the layout
    * spectrum (linear → Z-order → Hilbert). Both curves run on the same
    * range-quantized 8-bit grid (one metadata-sized max() pass fixes the
    * quantization — the documented stand-in for the quantile binning a
    * 100 TB OPTIMIZE job would use), rows are binned into 64 equal files
    * per layout by `Ordinals.globalOrdinal` over the curve index, zone maps
    * are built on the RAW dims, and the q191 predicates are audited against
    * them. Hilbert's selling point over Z-order is locality — no long
    * diagonal jumps, so per-file bounding boxes stay tighter and BOTH axes
    * keep skipping (the spec asserts the locality claim; this board row
    * hash-gates the audit numbers).
    *
    * The curve index itself is `HilbertD` — a codegen'd O(bits) loop in one
    * expression node (a Column-level formulation would need an
    * exponentially duplicated CASE tree); the oracle states the identical
    * curve as an unrolled 8-step CTE chain. */
  def q200(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.lineitem(s, d).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_partkey").as("x"), col("l_suppkey").as("y"))
    // one metadata agg fixes the quantization grid (driver-side 1-row max)
    val m = raw.agg(max(col("x")).as("mx"), max(col("y")).as("my")).head()
    val (mx, my) = (m.getLong(0), m.getLong(1))
    // checkpoint: the curve table feeds count + TWO globalOrdinal passes,
    // each of which evaluates its input twice through RDD lineage
    // (zipWithIndex's size job + the indexed pass) — without the barrier
    // the scan + both curve computations ran ~5× (guide §1.2/§5)
    val q = raw
      .withColumn("qx", expr(s"(x * 256) div ${mx + 1}"))
      .withColumn("qy", expr(s"(y * 256) div ${my + 1}"))
      .withColumn("h", graft.functions.GraftFunctions.hilbertD(col("qx"), col("qy"), 8))
      .withColumn("z", zInterleave(col("qx"), col("qy")))
      .localCheckpoint()
    val n = q.count()
    def binned(layout: String, key: Column): DataFrame =
      graft.ops.Ordinals.globalOrdinal(q, key, 32)
        .withColumn("bin", expr(s"((ordinal - 1) * 64) div $n"))
        .withColumn("layout", lit(layout))
    val zones = binned("hilbert8", struct(col("h"), col("ok"), col("ln")))
      .unionByName(binned("zorder8", struct(col("z"), col("ok"), col("ln"))))
      .groupBy(col("layout"), col("bin"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        count(lit(1)).as("nrows"))
    zones
      .withColumn("skip_x", col("max_x") < 500 || col("min_x") > 700)
      .withColumn("skip_y", col("max_y") < 30 || col("min_y") > 60)
      .select(col("layout"), col("nrows"), explode(array(
        struct(lit("x_range").as("pred"), col("skip_x").as("skip")),
        struct(lit("y_range").as("pred"), col("skip_y").as("skip")),
        struct(lit("xy_rect").as("pred"), (col("skip_x") || col("skip_y")).as("skip")))).as("a"))
      .groupBy(col("layout"), col("a.pred").as("pred"))
      .agg(count(lit(1)).as("bins_total"),
        sum(when(col("a.skip"), 1L).otherwise(0L)).as("bins_skipped"),
        sum(when(col("a.skip"), 0L).otherwise(col("nrows"))).as("rows_scanned"))
      .orderBy(col("layout"), col("pred"))
  }
  val q200Sql: String =
    s"""WITH mxy AS (
       |  SELECT MAX(l_partkey) AS mx, MAX(l_suppkey) AS my FROM lineitem),
       |h0 AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln,
       |         l_partkey AS x, l_suppkey AS y,
       |         (l_partkey * 256) // (mx + 1) AS qx,
       |         (l_suppkey * 256) // (my + 1) AS qy,
       |         (l_partkey * 256) // (mx + 1) AS hx,
       |         (l_suppkey * 256) // (my + 1) AS hy,
       |         CAST(0 AS BIGINT) AS hd
       |  FROM lineitem, mxy),
       |${hilbertSqlSteps(8)},
       |zed AS (SELECT ok, ln, x, y, hd, ${zSqlExprOn("qx", "qy", 8)} AS z FROM h8),
       |n AS (SELECT COUNT(*) AS n FROM lineitem),
       |hil AS (SELECT x, y,
       |  ((row_number() OVER (ORDER BY hd, ok, ln) - 1) * 64) // (SELECT n FROM n) AS bin
       |  FROM zed),
       |zor AS (SELECT x, y,
       |  ((row_number() OVER (ORDER BY z, ok, ln) - 1) * 64) // (SELECT n FROM n) AS bin
       |  FROM zed),
       |zones AS (
       |  SELECT 'hilbert8' AS layout, bin, min(x) AS min_x, max(x) AS max_x,
       |         min(y) AS min_y, max(y) AS max_y, COUNT(*) AS nrows
       |  FROM hil GROUP BY 2
       |  UNION ALL
       |  SELECT 'zorder8', bin, min(x), max(x), min(y), max(y), COUNT(*)
       |  FROM zor GROUP BY 2),
       |flags AS (
       |  SELECT layout, nrows,
       |    (max_x < 500 OR min_x > 700) AS skip_x,
       |    (max_y < 30 OR min_y > 60) AS skip_y
       |  FROM zones),
       |un AS (
       |  SELECT layout, 'x_range' AS pred, skip_x AS skip, nrows FROM flags
       |  UNION ALL SELECT layout, 'y_range', skip_y, nrows FROM flags
       |  UNION ALL SELECT layout, 'xy_rect', (skip_x OR skip_y), nrows FROM flags)
       |SELECT layout, pred, COUNT(*) AS bins_total,
       |  CAST(SUM(CASE WHEN skip THEN 1 ELSE 0 END) AS BIGINT) AS bins_skipped,
       |  CAST(SUM(CASE WHEN skip THEN 0 ELSE nrows END) AS BIGINT) AS rows_scanned
       |FROM un GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q191_zorder_skipping"  -> ((q191 _, Some(q191Sql))),
    "q200_hilbert_layout"   -> ((q200 _, Some(q200Sql))),
    "q192_gram_matrix"      -> ((q192 _, Some(q192Sql))),
    "q193_pareto_frontier"  -> ((q193 _, Some(q193Sql))),
    "q194_drift_tv_bc"      -> ((q194 _, Some(q194Sql))))
}
