package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication harness for `ivfAssignAuto`'s literal-vs-kernel size gate
  * (round 16, verdict r15 weak #1 / item 8): at a given tier it seeds the
  * √N codebook and measures, for EACH form,
  *
  *  - plan_s: plan construction + optimization + physical planning (the
  *    literal form's cost that grows with the cell count — the
  *    driver-side scale-killer the kernel form removes);
  *  - exec_s: one full E-step pass over the corpus (sum of assigned cell
  *    ids, so every row's argmin is computed but nothing is written);
  *
  * and cross-checks the two forms' per-corpus cell-id SUM for equality
  * (the bit-parity gate lives in IvfKernelSpec; the sum here guards the
  * measurement itself against measuring two different answers).
  *
  * Usage: runMain graft.tools.IvfEstepBench <sfDir> [reps] [cells] [planOnlyLiteral]
  * (cells defaults to √N — override to sweep the crossover at fixed N;
  * planOnlyLiteral=1 measures only the literal form's PLAN time — its
  * interpreted exec at the 1000× tier would run for hours, and the plan
  * growth is the datum the threshold needs there).
  * Prints one JSON line (SCALECHECK_r16 §1 consumes it). */
object IvfEstepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cellsOverride = args.drop(2).headOption.map(_.toLong)
    val planOnlyLiteral = args.drop(3).headOption.contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val cells = cellsOverride.getOrElse(
      math.max(16L, math.round(math.sqrt(n.toDouble))))
    val code = graft.queries.DedupSim.seedCodebookN(spark, sfDir, cells)

    // the gate override lives next to the gate itself (round-16 review)
    def withGate[T](maxCells: Int)(body: => T): T =
      graft.queries.DedupSim.withIvfGate(maxCells)(body)

    /** (plan_s, exec_s, checksum) best-of-reps for one form. */
    def measure(maxCells: Int, planOnly: Boolean): (Double, Double, Long) = {
      var bestPlan = Double.MaxValue
      var bestExec = Double.MaxValue
      var sum = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = withGate(maxCells) {
          graft.queries.DedupSim.ivfAssignAuto(emb, code) }
          .agg(org.apache.spark.sql.functions.sum(col("cell").cast("long")))
        df.queryExecution.executedPlan // force analysis→physical planning
        val t1 = System.nanoTime()
        if (!planOnly) {
          sum = df.collect()(0).getLong(0)
          val t2 = System.nanoTime()
          bestExec = math.min(bestExec, (t2 - t1) / 1e9)
        }
        bestPlan = math.min(bestPlan, (t1 - t0) / 1e9)
      }
      (bestPlan, if (planOnly) -1.0 else bestExec, sum)
    }

    val (litPlan, litExec, litSum) = measure(Int.MaxValue, planOnlyLiteral)
    val (kerPlan, kerExec, kerSum) = measure(0, planOnly = false)
    require(planOnlyLiteral || litSum == kerSum,
      s"form divergence: literal cell-sum $litSum vs kernel $kerSum")

    println(f"""{"metric":"ivf_estep_forms","sf_dir":"$sfDir","n":$n,"cells":$cells,"reps":$reps,"literal":{"plan_s":$litPlan%.3f,"exec_s":$litExec%.3f},"kernel":{"plan_s":$kerPlan%.3f,"exec_s":$kerExec%.3f},"cell_sum":$kerSum}""")
    spark.stop()
  }
}
