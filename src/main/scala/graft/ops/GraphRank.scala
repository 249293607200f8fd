package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped link-graph rank (PageRank) in FIXED-POINT integer arithmetic —
  * the curation signal web-scale corpus filtering actually uses: a
  * document linked to by many well-linked documents is worth keeping,
  * an orphan spam island is not (the Common-Crawl-style quality prior).
  *
  * Everything is integer parts-per-million: ranks start at `initPpm`,
  * each node sends `rank div outdeg` along every out-edge (floor
  * division — deterministic mass loss, identically restatable in any
  * engine), and the update is `basePpm + (inflow · dampPpm) div 10^6`.
  * No floats anywhere, so a DuckDB recursive CTE restates the whole
  * iteration exactly (q331) — the convergence LAW is gated, not a
  * float approximation of it.
  *
  * Distribution: the classic iterative-join formulation — per
  * iteration one join of edges×ranks on `src` and one aggregation on
  * `dst` (two shuffles); the edge relation (with out-degrees attached)
  * is computed ONCE and cached across iterations, and each iteration's
  * ranks are localCheckpoint'ed so the plan stays iteration-sized
  * instead of growing 8 joins deep. Dangling nodes (no out-edges)
  * simply leak their mass — the documented convention; nodes with no
  * IN-edges settle at `basePpm`. */
object GraphRank {

  /** `nodes`: one column `node`. `edges`: columns `src`, `dst` (both
    * must exist in `nodes`; parallel edges count double). Returns
    * (node, r) after `iterations` synchronous updates. */
  def pageRankFixedPoint(nodes: DataFrame, edges: DataFrame,
                         iterations: Int = 8, initPpm: Long = 1000000L,
                         basePpm: Long = 150000L,
                         dampPpm: Long = 850000L): DataFrame = {
    require(iterations >= 1, s"need at least one iteration: $iterations")
    require(dampPpm >= 0 && dampPpm <= 1000000L, s"dampPpm out of ppm range")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__od"))
    val e = edges.join(deg, "src").select(col("src"), col("dst"), col("__od"))
      .cache() // reused every iteration — pay the two scans once
    var ranks = nodes.select(col("node"), lit(initPpm).as("r"))
    var k = 0
    while (k < iterations) {
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div __od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("__infl"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(basePpm) +
            expr(s"(coalesce(__infl, 0L) * ${dampPpm}L) div 1000000")).as("r"))
        // keep the plan iteration-sized: without this the lineage stacks
        // 2 joins per iteration and analysis time grows superlinearly
        .localCheckpoint()
      k += 1
    }
    e.unpersist(blocking = false)
    ranks
  }
}
