package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Native Catalyst expression specs: bit-parity with the HOF formulation,
  * SQL registration, codegen path, null/edge handling. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def embDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() / 8).toFloat))
    }.toDF("id", "v")
  }

  test("dot_f32 is bit-identical to the HOF fold the oracles mirror") {
    val df = embDf
    val a = df.alias("a")
    val b = df.alias("b")
    val joined = a.join(b, expr("b.id = (a.id + 7) % 200"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val cmp = joined.select(
      GraftFunctions.dotF32(col("x"), col("y")).as("native"),
      expr("aggregate(zip_with(x, y, (p, q) -> cast(p as double) * cast(q as double)), 0D, (s, t) -> s + t)").as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    // and against a driver-side reference computation
    import spark.implicits._
    val rows = joined.as[(Array[Float], Array[Float])].head(5)
    val got = cmp.select("native").as[Double].head(5)
    rows.zip(got).foreach { case ((x, y), d) =>
      val ref = x.zip(y).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      assert(d == ref)
    }
  }

  test("dot_f32 participates in whole-stage codegen") {
    // a range-based source so the plan is a codegen stage, not LocalTableScan
    val df = spark.range(1, 201) // start at 1: sin(0*i)=0 would zero the norm
      .select(expr("transform(sequence(1, 64), i -> cast(sin(id * i) as float))").as("v"))
      .select(GraftFunctions.dotF32(col("v"), col("v")).as("n2"))
    val plan = df.queryExecution.executedPlan.toString
    // whole-stage codegen renders as a "*(n)" stage prefix in the plan string
    assert("""\*\(\d+\) Project \[dot_f32""".r.findFirstIn(plan).isDefined)
    // fallback eval also works (interpreted path)
    assert(df.agg(min("n2")).head().getDouble(0) > 0.0)
  }

  test("dot_f32 SQL registration + null and length-mismatch semantics") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(1f, 2f), Array(3f, 4f, 5f))) // ragged -> NULL, matching the HOF
      .toDF("x", "y").createOrReplaceTempView("pairs")
    val r = spark.sql(
      "SELECT dot_f32(x, y) AS d FROM pairs ORDER BY size(x) DESC").collect()
    assert(r(0).getDouble(0) == 32.0) // 4+10+18
    assert(r(1).isNullAt(0))          // zip_with pads -> HOF returns NULL; so do we
    // ragged + null-element inputs agree with the HOF fold exactly
    val parity = spark.sql(
      """SELECT dot_f32(x, y) AS native,
        |  aggregate(zip_with(x, y, (p, q) -> cast(p as double) * cast(q as double)),
        |            0D, (s, t) -> s + t) AS hof
        |FROM pairs""".stripMargin).collect()
    parity.foreach { row =>
      assert(row.isNullAt(0) == row.isNullAt(1))
      if (!row.isNullAt(0)) assert(row.getDouble(0) == row.getDouble(1))
    }
    // null input -> null out
    val n = spark.sql("SELECT dot_f32(NULL, array(cast(1.0 as float)))").head()
    assert(n.isNullAt(0))
    // type mismatch is an analysis error, not a runtime crash
    intercept[Exception](spark.sql("SELECT dot_f32(array(1), array(2))").collect())
  }

  test("cosineF32 of a vector with itself is 1.0") {
    val df = embDf.select(GraftFunctions.cosineF32(col("v"), col("v")).as("c"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("RewriteDotProduct rule: HOF dot-product pattern rewrites to the native kernel") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = embDf.selectExpr("id",
      "aggregate(zip_with(v, v, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, p) -> s + p) AS n2")
    val analyzed = df.queryExecution.analyzed
    val rewritten = graft.plans.RewriteDotProduct(analyzed)
    // the rule fired
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProductF32])))
    assert(!analyzed.fastEquals(rewritten))
    // and the rewritten plan computes bit-identical results
    val a = df.orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = ColumnBridge.ofRows(spark, rewritten).orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("RewriteCosine rule: composed dot/sqrt-norm cosine fuses to ONE kernel, bit-identical") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    GraftFunctions.register(spark)
    val df = embDf.alias("a").join(embDf.alias("b"), expr("b.id = (a.id + 3) % 200"))
      .select(col("a.id").as("id"), col("a.v").as("x"), col("b.v").as("y"))
      .selectExpr("id",
        "dot_f32(x, y) / (sqrt(dot_f32(x, x)) * sqrt(dot_f32(y, y))) AS cos")
    val analyzed = df.queryExecution.analyzed
    val rewritten = graft.plans.RewriteCosine(analyzed)
    assert(rewritten.expressions.exists(_.exists(_.isInstanceOf[graft.functions.CosineF32])),
      "fused kernel missing after rewrite")
    // the three source kernels are gone — ONE traversal remains
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProductF32])))
    val a = df.orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = ColumnBridge.ofRows(spark, rewritten).orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("RewriteCosine rule: mixed norms (sqrt of a DIFFERENT vector) must not fuse") {
    GraftFunctions.register(spark)
    // sqrt(dot(x,x)) * sqrt(dot(x,x)) — the second norm is not y's: not a cosine
    val df = embDf.alias("a").join(embDf.alias("b"), expr("b.id = (a.id + 3) % 200"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
      .selectExpr("dot_f32(x, y) / (sqrt(dot_f32(x, x)) * sqrt(dot_f32(x, x))) AS notcos")
    val rewritten = graft.plans.RewriteCosine(df.queryExecution.analyzed)
    assert(!rewritten.expressions.exists(_.exists(_.isInstanceOf[graft.functions.CosineF32])))
  }

  test("RewriteDotProduct rule: does NOT fire for non-float arrays or different folds") {
    // double arrays: semantics differ (no float read), rule must not touch it
    val doubles = spark.range(1, 50)
      .selectExpr("transform(sequence(1, 8), i -> cast(id * i as double)) AS v")
      .selectExpr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (s, p) -> s + p) AS n2")
    val r1 = graft.plans.RewriteDotProduct(doubles.queryExecution.analyzed)
    assert(!r1.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProductF32])))
    // float arrays but a max-fold, not a sum: must not fire either
    val maxFold = embDf.selectExpr(
      "aggregate(zip_with(v, v, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, p) -> greatest(s, p)) AS m")
    val r2 = graft.plans.RewriteDotProduct(maxFold.queryExecution.analyzed)
    assert(!r2.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProductF32])))
  }
}
