package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function front door ([[graft.queries.SqlFnOps]]): the
  * registered SQL-defined functions must reproduce the Scala pipelines'
  * keys EXACTLY — that identity is what makes SQL dedup/ANN the same
  * operator, not a lookalike. */
class SqlFnOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("sqlfn-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.queries.SqlFnOps.registrationSql.foreach(s.sql(_).collect())
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("minhash_bands matches the q24 Scala signature pipeline key-for-key") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "THE  Quick  Brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark and parquet files"),
      (4L, "too short"), // < 3 tokens after split: empty bands
      (5L, (1 to 40).map(i => s"tok$i").mkString(" ")) // cap at 30 tokens
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs_fn")
    val viaSql = spark.sql(
      """SELECT doc_id, band_idx, band_key
        |FROM (SELECT doc_id, minhash_bands(text) AS bs FROM docs_fn)
        |LATERAL VIEW posexplode(bs) AS band_idx, band_key""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // the Scala pipeline's signature, restated inline (q24's formulation)
    import org.apache.spark.sql.functions._
    val p = 1000000007L
    val hashed = docs
      .select(col("doc_id"),
        slice(split(trim(lower(col("text"))), "\\s+"), 1, 30).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> " +
          "concat(element_at(t, i+1), ' ', element_at(t, i+2), ' ', element_at(t, i+3)))"))
        .as("shingle"))
      .select(col("doc_id"), md5(col("shingle")).as("hx"))
      .select(col("doc_id"),
        (expr("cast(conv(substring(hx, 1, 15), 16, 10) as bigint)") % p).as("g1"),
        (expr("cast(conv(substring(hx, 17, 15), 16, 10) as bigint)") % p).as("g2"))
    val sigAggs = (0 until 8).map(k =>
      min((col("g1") + lit(k.toLong) * col("g2")) % p).as(s"h$k"))
    val sig = hashed.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    val viaScala = sig.collect().flatMap { r =>
      (0 until 4).map(b =>
        (r.getLong(0), b, s"${r.getLong(1 + 2 * b)}_${r.getLong(2 + 2 * b)}"))
    }.toSet
    assert(viaSql == viaScala, "SQL minhash_bands diverges from the Scala keys")
    assert(!viaSql.exists(_._1 == 4L), "short docs must produce no bands")
    // identical content modulo case/whitespace → identical keys (1 vs 2)
    assert(viaSql.filter(_._1 == 1L).map(t => (t._2, t._3)) ==
      viaSql.filter(_._1 == 2L).map(t => (t._2, t._3)))
  }

  test("lsh_bucket matches the q29 hyperplane signature (native dot_f32)") {
    import spark.implicits._
    var s0 = 42L
    def nextF(): Float = {
      s0 = s0 * 6364136223846793005L + 1442695040888963407L
      ((s0 >>> 33).toInt % 1000) / 500.0f - 1.0f
    }
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(64)(nextF()))).toDF("id", "e")
    vecs.createOrReplaceTempView("vecs_fn")
    val viaSql = spark.sql("SELECT id, lsh_bucket(e) AS b FROM vecs_fn")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the Scala-side signature: sign bits of dot products with the planes
    val signs = graft.queries.DedupSim.planeSigns
    val expected = vecs.collect().map { r =>
      val e = r.getSeq[Float](1)
      val b = signs.indices.map { j =>
        val dot = (0 until 64).map(i => e(i).toDouble * signs(j)(i)).sum
        if (dot > 0) 1 << j else 0
      }.sum
      r.getLong(0) -> b
    }.toMap
    assert(viaSql == expected, "SQL lsh_bucket diverges from the plane signature")
    assert(viaSql.values.toSet.size > 1, "degenerate bucketing")
  }
}
