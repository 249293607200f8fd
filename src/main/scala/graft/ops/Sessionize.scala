package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Span-based greedy interval merge as a distributed operator (the
  * generalization of the reference's segmentation pass 2, O8/pa.py:124-147):
  * `groupByKey(key)` → in-group time sort → sequential greedy fold. This is
  * the one operator whose semantics cannot be a SQL window (each merge
  * decision depends on the fold state, not a fixed frame), hence
  * `flatMapGroups` — parallel across keys, sequential within a key
  * (SURVEY §7.4 HARD #1). Skew note for 100 TB: per-key work is linear in
  * that key's row count; pathologically hot keys should be range-split
  * upstream (e.g. by day) before merging, which composes with this operator.
  */
object Sessionize {

  final case class Event(key: Long, tsUs: Long, value: Double)
  final case class Session(key: Long, startUs: Long, endUs: Long,
                           nEvents: Int, sumValue: Double)

  /** Merge each key's ts-ordered points into sessions whose total SPAN stays
    * within `maxSpanUs` (gaps count toward the span, exactly like
    * pa.py:140's `next_end - temp_segment_start`); drop sessions shorter
    * than `minSpanUs` (pa.py:128-131). */
  def spanMerge(events: Dataset[Event], minSpanUs: Long, maxSpanUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (key, it) =>
      val sorted = it.toIndexedSeq.sortBy(e => (e.tsUs, e.value))
      if (sorted.isEmpty) Iterator.empty
      else {
        val out = Seq.newBuilder[Session]
        var start = sorted.head.tsUs
        var end = sorted.head.tsUs
        var n = 1
        var sum = sorted.head.value
        def save(): Unit = if (end - start >= minSpanUs) out += Session(key, start, end, n, sum)
        sorted.tail.foreach { e =>
          if (e.tsUs - start <= maxSpanUs) {
            end = e.tsUs; n += 1; sum += e.value
          } else {
            save(); start = e.tsUs; end = e.tsUs; n = 1; sum = e.value
          }
        }
        save()
        out.result().iterator
      }
    }
  }

  /** The events-table query shape used by SparkEntry (rows-only check — the
    * stateful fold is not expressible as ANSI SQL): 15 MINUTES max span,
    * 3 minutes min — the reference's 15 s / 3 s segment bounds scaled x60 to
    * the events table's time density. */
  def spanMergeEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.core.Tables.events(s, dir)
      .selectExpr("user_id as key", "ts_us as tsUs", "value")
      .as[Event]
    spanMerge(ev, minSpanUs = 3L * 60 * 1000000, maxSpanUs = 15L * 60 * 1000000)
      .toDF()
      .orderBy("key", "startUs")
  }
}
