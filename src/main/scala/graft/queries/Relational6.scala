package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Sixth relational batch: array-function breadth and RANGE window frames —
  * the last §2.10/§2.5 surface gaps. */
object Relational6 {

  // ---------------------------------------------------------------- q56
  /** Array function surface over embeddings: sort, extremes, top-k slice,
    * element position. (Values only — element order within sorts is total
    * because floats in a vector are distinct in this data; ties would still
    * agree since both engines use ascending value order.) */
  def q56(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        array_max(col("embedding")).as("vmax"),
        array_min(col("embedding")).as("vmin"),
        slice(sort_array(col("embedding"), asc = false), 1, 3).as("top3"),
        element_at(sort_array(col("embedding")), 1).as("smallest"),
        array_position(col("embedding"), array_max(col("embedding"))).as("argmax_1based"))
      .select(col("vec_id"), col("vmax"), col("vmin"),
        element_at(col("top3"), 1).as("top1"),
        element_at(col("top3"), 2).as("top2"),
        element_at(col("top3"), 3).as("top3v"),
        col("smallest"), col("argmax_1based"))
      .orderBy(col("vec_id"))
  val q56Sql: String =
    """SELECT vec_id,
      |  list_max(embedding) AS vmax,
      |  list_min(embedding) AS vmin,
      |  list_reverse_sort(embedding)[1] AS top1,
      |  list_reverse_sort(embedding)[2] AS top2,
      |  list_reverse_sort(embedding)[3] AS top3v,
      |  list_sort(embedding)[1] AS smallest,
      |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_1based
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q57
  /** RANGE window frame (value-based, vs the ROWS frames of q37): events per
    * user within the trailing hour of each event — the frame extent depends
    * on timestamp VALUES, so peers at distance <= 1h are included however
    * many rows they span. */
  def q57(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double").as("sum_last_hour"))
      .orderBy(col("event_id"))
  }
  val q57Sql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  COUNT(*) OVER w AS n_last_hour,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Two-phase salted aggregation (Skew.saltedAggregate) over events keyed
    * by user_id: phase 1 shuffles on (user_id, salt) so a hot key spreads
    * over 16 reducers, phase 2 reduces the 16 partial rows per key. The
    * oracle is the PLAIN group-by — the salted plan must be numerically
    * indistinguishable from it, which the decimal partial sums guarantee
    * (exact integer-scaled arithmetic is associative across the two phases,
    * unlike raw double sums). */
  def q58(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedAggregate(
      Tables.events(s, d), keys = Seq("user_id"), saltBuckets = 16,
      saltFrom = Seq(col("event_id")),
      partial = Seq(count(lit(1)).as("pn"),
                    sum(col("value").cast(DecimalType(18, 6))).as("ps")),
      merge = Seq(sum(col("pn")).as("n"),
                  sum(col("ps")).cast("double").as("sum_value")))
      .orderBy(col("user_id"))
  val q58Sql: String =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val defs: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q56_array_funcs"  -> ((q56 _, Some(q56Sql))),
    "q57_range_frame"  -> ((q57 _, Some(q57Sql))),
    "q58_salted_agg"   -> ((q58 _, Some(q58Sql))))
}
