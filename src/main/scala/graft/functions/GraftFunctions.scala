package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions.sqrt

/** Column-API and SQL surface for the engine's native expressions. */
object GraftFunctions {

  /** Dot product of two ARRAY<FLOAT> columns in double precision (codegen). */
  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused kernel: STRUCT<dot, na, nb> of two ARRAY<FLOAT> columns in one
    * traversal (codegen) — bit-identical fields to three dotF32 calls. */
  def dotNormsF32(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotNormsF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity as ONE fused codegen expression (round 7; previously
    * three dotF32 passes) — same IEEE op sequence as the HOF formulation
    * the DuckDB oracles mirror, one array traversal by construction. */
  def cosineF32(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Hilbert-curve index of a quantized (x, y) cell on the 2^bits grid
    * (codegen loop — the space-filling curve behind q200's layout audit). */
  def hilbertD(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertD(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Register SQL names on an existing session (tests / driver sessions that
    * were built without `spark.sql.extensions`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotProductF32(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_norms_f32", exprs => DotNormsF32(exprs(0), exprs(1)), "scala_udf")
  }
}

/** SparkSessionExtensions hook: `.config("spark.sql.extensions",
  * "graft.functions.GraftExtensions")` injects the native functions at
  * session build time (the cluster-deployment path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_f32"),
      DotProductF32.info,
      exprs => DotProductF32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_norms_f32"),
      DotNormsF32.info,
      exprs => DotNormsF32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_f32"),
      CosineF32.info,
      exprs => CosineF32(exprs(0), exprs(1))))
    // `table_changes('<cat>.<db>.<t>', fromExclusive[, to])` — Delta's
    // batch CDF table-valued function: the row-level changes each version
    // in (from, to] introduced, as table rows + `_change_type` /
    // `_commit_version` ([[graft.io.TxnLog.changes]] — per-action
    // derivation off the manifest, never a full-history diff; appends
    // serve their own files, vector deletes materialize once). Args must
    // be literals (the table name resolves through the session's catalog
    // manager at analysis time, exactly when the snapshot is pinned).
    e.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.io.TxnLog", "table_changes"),
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        require(exprs.length == 2 || exprs.length == 3,
          "table_changes(table_name, from_version_exclusive[, to_version])")
        def litOf(i: Int): Any = exprs(i) match {
          case Literal(v, _) => v
          case other => throw new IllegalArgumentException(
            s"table_changes arguments must be literals, got $other")
        }
        val name = String.valueOf(litOf(0))
        val parts = name.split('.')
        require(parts.length == 3,
          s"table_changes needs a fully-qualified <catalog>.<db>.<table> " +
            s"name, got $name")
        val spark = SparkSession.active
        val dir = graft.plans.GraftSqlParser.dirOf(spark, parts.toSeq)
        val from = String.valueOf(litOf(1)).toLong
        val to = if (exprs.length == 3) String.valueOf(litOf(2)).toLong
          else graft.io.TxnLog.currentVersion(dir)
        graft.io.TxnLog.changes(spark, dir, from, to).queryExecution.analyzed
      }))
    e.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    e.injectOptimizerRule(_ => graft.plans.RewriteCosine)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    e.injectOptimizerRule(_ => graft.plans.MvRewrite)
    e.injectOptimizerRule(_ => graft.plans.SqlDml)
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    // analysis-time: vectored catalog snapshots serve as merge-on-read
    // plans instead of refusing (must run BEFORE optimizer pushdown —
    // see MorScan's header)
    e.injectResolutionRule(_ => graft.plans.MorScan)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
