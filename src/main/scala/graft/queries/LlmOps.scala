package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-corpus curation operators beyond dedup/similarity: benchmark
  * decontamination, weighted stratified sampling (data mixing), and TF-IDF
  * term scoring. These are the remaining workhorse passes of an LLM data
  * pipeline that had no board entry — each is stated as the plan you would
  * run at 100 TB (broadcast the small side, per-row projections for
  * sampling, rank-filter windows that Spark 4 rewrites to group-limits).
  *
  * Generalizes the reference's corpus hygiene steps (dedup via UNIQUE keys,
  * quality gates — /root/reference/process_audio.py:62,155) to the
  * text-corpus operations its pipeline would need next.
  */
object LlmOps {

  // ---------------------------------------------------------------- q88
  /** Benchmark decontamination — flag training documents that share any
    * k=8-token window with the evaluation set (the n-gram-overlap
    * decontamination pass every LLM corpus runs before training; same
    * window fingerprints as q80's substring dedup). The eval set here is
    * the deterministic doc_id % 19 == 0 slice standing in for a benchmark
    * suite.
    *
    * Scale shape: a benchmark suite is MBs against a 100 TB corpus, so the
    * distinct eval fingerprints BROADCAST — the corpus is scanned once,
    * never shuffled; the only exchanges are the tiny eval-side distinct
    * and the per-doc rollup of (rare) hits. PlanCheck asserts the
    * broadcast. */
  def q88(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
    val w = toks
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"),
              explode(expr("sequence(1, size(t) - 7)")).as("pos"),
              col("t"))
      .select(col("doc_id"),
              md5(expr("array_join(slice(t, pos, 8), ' ')")).as("fp"))
    val evalFps = w.filter(col("doc_id") % 19 === 0).select(col("fp")).distinct()
    val hits = w.filter(col("doc_id") % 19 =!= 0)
      .join(broadcast(evalFps), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_windows"),
           countDistinct(col("fp")).as("hit_fps"))
    toks.filter(col("doc_id") % 19 =!= 0)
      .select(col("doc_id"),
              greatest(lit(0), size(col("t")) - 7).cast("long").as("n_windows"))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
              coalesce(col("hit_windows"), lit(0L)).as("hit_windows"),
              coalesce(col("hit_fps"), lit(0L)).as("hit_fps"))
      .withColumn("contaminated", col("hit_windows") > 0)
      .orderBy(col("doc_id"))
  }
  val q88Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      |w AS (
      |  SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS fp
      |  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
      |  WHERE len(t) >= 8),
      |ev AS (SELECT DISTINCT fp FROM w WHERE doc_id % 19 = 0),
      |hits AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_windows,
      |         CAST(COUNT(DISTINCT fp) AS BIGINT) AS hit_fps
      |  FROM w WHERE doc_id % 19 <> 0 AND fp IN (SELECT fp FROM ev)
      |  GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(greatest(0, len(t.t) - 7) AS BIGINT) AS n_windows,
      |  coalesce(h.hit_windows, 0) AS hit_windows,
      |  coalesce(h.hit_fps, 0) AS hit_fps,
      |  coalesce(h.hit_windows, 0) > 0 AS contaminated
      |FROM toks t LEFT JOIN hits h USING (doc_id)
      |WHERE t.doc_id % 19 <> 0 ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Weighted stratified sampling (data mixing): take an exact per-language
    * quota of documents, selected by a content-stable md5 order — the
    * deterministic "take N docs per domain at these mix weights" manifest
    * step of corpus assembly. No RNG: the sample is reproducible across
    * engines, runs, and cluster layouts (q60's hash-split principle applied
    * per stratum with exact counts).
    *
    * Scale shape: rank-filter per stratum. Spark 4's optimizer rewrites
    * `row_number() <= k` into a WindowGroupLimit — every partition keeps
    * only its k smallest rows BEFORE the stratum shuffle, so the exchange
    * carries O(partitions * k), not the corpus (PlanCheck asserts the
    * group-limit is present). For huge strata the same contract is the
    * native bounded-heap TopKPerGroup (q66). */
  private val LangQuota: Map[String, Int] =
    Map("en" -> 60, "zh" -> 30, "es" -> 30, "de" -> 25, "fr" -> 20)

  def q89(s: SparkSession, d: String): DataFrame = {
    val quota = LangQuota.foldLeft(lit(0)) { case (acc, (l, q)) =>
      when(col("lang") === l, q).otherwise(acc)
    }
    val h = md5(concat(col("doc_id").cast("string"), lit("|strat")))
    val byHash = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), h.as("h"))
      .withColumn("rk", row_number().over(byHash))
      .filter(col("rk") <= quota)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"), col("h"))
      .orderBy(col("lang"), col("rk"))
  }
  val q89Sql: String = {
    val quotaCase = LangQuota
      .map { case (l, q) => s"WHEN lang = '$l' THEN $q" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH r AS (
       |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR) || '|strat') AS h,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '|strat'), doc_id) AS rk
       |  FROM documents)
       |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, h
       |FROM r WHERE rk <= ($quotaCase) ORDER BY lang, rk""".stripMargin
  }

  // ---------------------------------------------------------------- q90
  /** TF-IDF top terms per document — the classic "what is this document
    * about" scoring over q70's vocabulary statistics: score(t, d) =
    * tf(t, d) * N / df(t) (the raw idf ratio; no transcendental so the
    * ranking is bit-exact across engines — *, / are IEEE correctly-rounded
    * where log is libm-dependent), top 3 terms per doc.
    *
    * Scale shape: two aggregations (doc-term tf, then term df — df derives
    * FROM the tf table, the corpus is tokenized once); the df table is
    * vocabulary-sized so it BROADCASTS back onto tf; the per-doc rank
    * filter becomes a WindowGroupLimit. N arrives as a broadcast 1-row
    * cross join, not a collected constant, so the plan is a single job. */
  def q90(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"),
              explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n").cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
              col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }
  val q90Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |sc AS (
      |  SELECT t.doc_id, t.term, t.tf, df.df,
      |    CAST(t.tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      |  FROM tf t JOIN df USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |  FROM sc)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q88_decontaminate"      -> ((q88 _, Some(q88Sql))),
    "q89_stratified_sample"  -> ((q89 _, Some(q89Sql))),
    "q90_tfidf_topterms"     -> ((q90 _, Some(q90Sql)))
  )
}
