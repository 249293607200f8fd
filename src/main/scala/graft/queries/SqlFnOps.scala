package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q305 — the SQL FRONT DOOR to the LLM-data operators (round-10 verdict
  * item 5): the dedup/similarity kernels, reachable from `spark.sql` TEXT.
  *
  * Mechanism: Spark 4's SQL-DEFINED FUNCTIONS (`CREATE TEMPORARY FUNCTION
  * ... RETURNS ... RETURN <expr>`) — declarative bodies the analyzer
  * INLINES into the calling plan, so everything below stays Catalyst-
  * optimizable (no UDF opacity), plus the engine's native codegen'd
  * expressions (`dot_f32`, `cosine_f32`) already registered by
  * [[graft.functions.GraftExtensions]]. Registered here:
  *
  *   - `minhash_bands(t)` → the q24 MinHash+LSH band keys (4 bands × r=2
  *     over 8 md5-derived hash functions, 3-token shingles, tokens capped
  *     at 30) as an ARRAY<STRING> — byte-identical keys to the Scala
  *     pipeline, so SQL dedup equals q24's candidate semantics;
  *   - `lsh_bucket(e)` → q29's 8-hyperplane signature of an ARRAY<FLOAT>
  *     embedding, the sign bits computed by the NATIVE `dot_f32` kernel
  *     against the same literal planes.
  *
  * Both faces of the board entry are then PURE SQL STATEMENTS:
  *   - `dedup`: the MinHash band self-join (DISTINCT candidate pairs —
  *     q24's exact output, Σ bucket² pair space by construction);
  *   - `ann`:   q29's bucketed cosine top-3 for queries vec_id < 5
  *     (bucket equi-join + native cosine + windowed rank).
  *
  * Scale shape: identical to q24/q29 — the inlined function bodies
  * produce the same shuffles (band-key join, bucket join); nothing
  * driver-sized. The oracle restates both faces relationally. */
object SqlFnOps {

  private val P = 1000000007L

  /** The registration statements — SQL text, built once (the plane
    * literals and the shingle expression are interpolated, not computed
    * at call time). Exposed for the spec. */
  private[graft] def registrationSql: Seq[String] = {
    // PERFORMANCE SHAPE (measured the hard way: the naive inlining cost
    // 157 s at sf0.1): SQL-UDF bodies inline into interpreted HOF
    // lambdas, where every reference to a subexpression RE-EVALUATES it —
    // an `element_at(split(...), i)` per shingle token re-ran the regex
    // split ~670× per document. Each shared subexpression is therefore
    // BOUND ONCE as a lambda variable via the single-element
    // `element_at(transform(array(<expr>), x -> <body>), 1)` idiom:
    // tokens split once, each shingle md5s once, the 8 hash mins fold
    // over one precomputed (g1, g2) struct array. Same keys, ~300× less
    // work (0.5 s at sf0.1).
    def bind(expr: String, v: String, body: String): String =
      s"element_at(transform(array($expr), $v -> $body), 1)"
    val tkExpr = """slice(split(trim(lower(t)), '\\s+'), 1, 30)"""
    // per shingle: md5 once (bound as hx), then the two 60-bit halves
    val hsExpr = "transform(sequence(0, size(tk) - 3), i -> " +
      bind("md5(concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2), " +
        "' ', element_at(tk, i + 3)))", "hx",
        s"named_struct('g1', cast(conv(substring(hx, 1, 15), 16, 10) as bigint) % $P, " +
          s"'g2', cast(conv(substring(hx, 17, 15), 16, 10) as bigint) % $P)") + ")"
    def hmin(kExpr: String): String =
      s"cast(array_min(transform(hs, h -> " +
        s"(h.g1 + ($kExpr) * h.g2) % $P)) as string)"
    val bandsBody = bind(tkExpr, "tk",
      "CASE WHEN size(tk) >= 3 THEN " +
        bind(hsExpr, "hs",
          s"transform(sequence(0, 3), b -> concat(${hmin("cast(2 * b as bigint)")}, " +
            s"'_', ${hmin("cast(2 * b + 1 as bigint)")}))") +
        " ELSE array() END")
    val signs = DedupSim.planeSigns
    val bucketBody = signs.indices.map { j =>
      val arr = signs(j).map(v => s"cast($v as float)").mkString("array(", ", ", ")")
      s"(CASE WHEN dot_f32(e, $arr) > 0D THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    Seq(
      "CREATE OR REPLACE TEMPORARY FUNCTION minhash_bands(t STRING) " +
        s"RETURNS ARRAY<STRING> RETURN $bandsBody",
      "CREATE OR REPLACE TEMPORARY FUNCTION lsh_bucket(e ARRAY<FLOAT>) " +
        s"RETURNS INT RETURN $bucketBody")
  }

  def q305(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession() // inherits the extensions (dot_f32/cosine_f32)
    registrationSql.foreach(s.sql(_).collect())
    // The band table sits on BOTH sides of the self-join, and SQL-UDF
    // bodies inline as interpreted lambdas — without a materialization
    // barrier the minhash_bands pass (the statement's dominant cost) runs
    // twice (guide §1.2: don't recompute what you already have). The
    // barrier is a corpus-doc-count × 4 row table; the front door stays
    // pure SQL statements.
    s.sql(
      s"""SELECT doc_id, band_idx, band_key
         |FROM (SELECT doc_id, minhash_bands(text) AS bs
         |      FROM parquet.`$d/documents.parquet`)
         |LATERAL VIEW posexplode(bs) AS band_idx, band_key""".stripMargin)
      .localCheckpoint().createOrReplaceTempView("q305_bands")
    s.sql(
      s"""WITH bands AS (SELECT doc_id, band_idx, band_key FROM q305_bands),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id),
         |be AS (
         |  SELECT vec_id, embedding, lsh_bucket(embedding) AS bucket
         |  FROM parquet.`$d/embeddings.parquet`),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket
         |      FROM be WHERE vec_id < 5),
         |pp AS (
         |  SELECT /*+ BROADCAST(q) */ q.q_id, be.vec_id,
         |         cosine_f32(q.qe, be.embedding) AS cosine
         |  FROM be JOIN q ON be.bucket = q.bucket AND be.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, vec_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY q_id
         |                            ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM pp)
         |SELECT 'dedup' AS face, doc_a AS a, doc_b AS b,
         |       CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS x
         |FROM pairs
         |UNION ALL
         |SELECT 'ann', q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
         |ORDER BY face, a, b""".stripMargin)
  }

  /** Relational restatement — the q24 and q29 oracle pipelines, fused. */
  val q305Sql: String = {
    val signs = DedupSim.planeSigns
    val Dim = 64
    def projSql(e: String, j: Int): String = {
      val arr = signs(j).mkString("[", ",", "]")
      s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> CAST($e[i] AS DOUBLE) * ($arr)[i]), (a,b) -> a+b)"
    }
    val bucketSql = (0 until signs.length)
      .map(j => s"(CASE WHEN ${projSql("embedding", j)} > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, (string_split_regex(trim(lower(text)), '\\s+'))[1:30] AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM toks WHERE len(t) >= 3),
       |hx AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $P AS g1,
       |    ('0x' || substr(md5(shingle), 17, 15))::BIGINT % $P AS g2
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    min((g1 + 0*g2) % $P) AS h0, min((g1 + 1*g2) % $P) AS h1,
       |    min((g1 + 2*g2) % $P) AS h2, min((g1 + 3*g2) % $P) AS h3,
       |    min((g1 + 4*g2) % $P) AS h4, min((g1 + 5*g2) % $P) AS h5,
       |    min((g1 + 6*g2) % $P) AS h6, min((g1 + 7*g2) % $P) AS h7
       |  FROM hx GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band_idx, h0::VARCHAR || '_' || h1::VARCHAR AS band_key FROM sig UNION ALL
       |  SELECT doc_id, 1, h2::VARCHAR || '_' || h3::VARCHAR FROM sig UNION ALL
       |  SELECT doc_id, 2, h4::VARCHAR || '_' || h5::VARCHAR FROM sig UNION ALL
       |  SELECT doc_id, 3, h6::VARCHAR || '_' || h7::VARCHAR FROM sig),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |be AS (
       |  SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM be WHERE vec_id < 5),
       |pp AS (
       |  SELECT q.q_id, be.vec_id,
       |    list_reduce(list_transform(range(1, ${Dim + 1}),
       |      i -> CAST(q.qe[i] AS DOUBLE) * CAST(be.embedding[i] AS DOUBLE)), (a,b) -> a+b) AS dot,
       |    list_reduce(list_transform(q.qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b) AS nq,
       |    list_reduce(list_transform(be.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b) AS nc
       |  FROM be JOIN q ON be.bucket = q.bucket AND be.vec_id <> q.q_id),
       |r AS (
       |  SELECT q_id, vec_id, dot/(sqrt(nq)*sqrt(nc)) AS cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dot/(sqrt(nq)*sqrt(nc)) DESC, vec_id) AS rnk
       |  FROM pp)
       |SELECT 'dedup' AS face, doc_a AS a, doc_b AS b,
       |       CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS x
       |FROM pairs
       |UNION ALL
       |SELECT 'ann', q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
       |ORDER BY face, a, b""".stripMargin
  }

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q305_sql_llm_functions" -> ((q305 _, Some(q305Sql))))
}
