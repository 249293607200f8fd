package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table sinks with the reference's persistence semantics (O23/O24,
  * pa.py:49-76, 354-391) as reusable operators over parquet locations.
  * On a real cluster the same calls target catalog tables (saveAsTable) —
  * the dedup/append semantics are identical.
  */
object Sinks {

  /** O23 `create_db(refresh=True)`: drop-and-recreate ≡ overwrite-mode write. */
  def writeRefresh(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** O24 `INSERT OR IGNORE`: append only rows whose `key` is absent from the
    * existing table, with in-batch first-writer-wins dedup under
    * `orderCols`. Two set-operations, both shuffle-on-key:
    *   1. in-batch dedup  = row_number over (key, orderCols) == 1
    *   2. cross-batch ignore = left-anti join against existing keys
    * Returns the number of rows actually appended. */
  def appendIgnore(spark: SparkSession, df: DataFrame, path: String,
                   key: String, orderCols: Seq[String]): Long = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    val deduped = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val exists = scala.util.Try(spark.read.parquet(path)).toOption
    val incoming = exists match {
      case Some(existing) =>
        deduped.join(existing.select(col(key)), Seq(key), "left_anti")
      case None => deduped
    }
    // persist so count and write see the SAME rows (and the dedup/anti-join
    // runs once, not twice)
    incoming.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = incoming.count()
      if (n > 0) incoming.write.mode("append").parquet(path)
      n
    } finally incoming.unpersist()
  }
}
