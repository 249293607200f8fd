package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Fourth relational batch: pivot, lateral explode with ordinality, and JSON
  * extraction over the events `props` column. */
object Relational4 {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  // ---------------------------------------------------------------- q46
  /** Pivot (explicit value list keeps the output schema static — the
    * distributed-safe form; an inferred pivot would need an extra pass). */
  def q46(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"),
              col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))
  val q46Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Lateral array explode with ordinality (posexplode): first 8 components
    * of each of the first 50 embeddings as (vec_id, pos, val) rows. */
  def q47(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .toDF("vec_id", "pos", "val")
      .withColumn("pos", col("pos").cast("long"))
      .orderBy(col("vec_id"), col("pos"))
  val q47Sql: String =
    """SELECT vec_id, u.pos, embedding[u.pos + 1] AS val
      |FROM embeddings CROSS JOIN unnest(range(0, 8)) AS u(pos)
      |WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin

  // ---------------------------------------------------------------- q48
  /** JSON extraction from the events props column + aggregation (integer
    * sums — exact in both engines). */
  def q48(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  val q48Sql: String =
    """WITH e AS (
      |  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q46_pivot"        -> ((q46 _, Some(q46Sql))),
    "q47_explode_pos"  -> ((q47 _, Some(q47Sql))),
    "q48_json_extract" -> ((q48 _, Some(q48Sql))))
}
