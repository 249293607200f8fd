package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Span-based greedy interval merge as a distributed operator (the
  * generalization of the reference's segmentation pass 2, O8/pa.py:124-147):
  * hash-repartition on the key, secondary sort within partitions on
  * (key, ts), then one streaming fold over each partition's sorted run.
  * The fold holds ONE open session per in-flight key — O(1) heap however hot
  * a key is — because a partition's rows arrive key-contiguous and
  * time-ordered, so a key's events can be consumed strictly left to right.
  * This is the scale-safe replacement for the groupByKey + in-heap sort
  * formulation, whose per-key buffer OOMs on a pathologically hot key at
  * the 100 TB target. Semantics are unchanged: parallel across keys,
  * sequential within a key (SURVEY §7.4 HARD #1); each merge decision
  * depends on the fold state, not a fixed frame, which is why this is not a
  * SQL window.
  */
object Sessionize {

  /** Values are LONG (callers quantize doubles upstream, e.g.
    * round(x*1e6)): per-session sums stay exact integer arithmetic at any
    * magnitude, where a double accumulator would silently lose exactness
    * past 2^53 on precisely the pathological hot keys this operator is
    * built to survive. */
  final case class Event(key: Long, tsUs: Long, value: Long)
  final case class Session(key: Long, startUs: Long, endUs: Long,
                           nEvents: Int, sumValue: Long)

  /** Merge each key's ts-ordered points into sessions whose total SPAN stays
    * within `maxSpanUs` (gaps count toward the span, exactly like
    * pa.py:140's `next_end - temp_segment_start`); drop sessions shorter
    * than `minSpanUs` (pa.py:128-131). */
  def spanMerge(events: Dataset[Event], minSpanUs: Long, maxSpanUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("value"))
      .mapPartitions { it =>
        new scala.collection.AbstractIterator[Session] {
          private val buf = it.buffered
          private var pending: Session = null

          // Consume events until a keepable session materializes or the
          // partition is exhausted. Only the open session's scalars live on
          // the heap — never a key's event list.
          private def advance(): Unit =
            while (pending == null && buf.hasNext) {
              val first = buf.next()
              val key = first.key
              val start = first.tsUs
              var end = first.tsUs
              var n = 1
              var sum = first.value
              var growing = true
              while (growing && buf.hasNext && buf.head.key == key) {
                val e = buf.head
                if (e.tsUs - start <= maxSpanUs) {
                  buf.next(); end = e.tsUs; n += 1; sum += e.value
                } else growing = false
              }
              if (end - start >= minSpanUs) pending = Session(key, start, end, n, sum)
            }

          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Session = {
            advance()
            if (pending == null) throw new NoSuchElementException("empty partition")
            val r = pending; pending = null; r
          }
        }
      }
  }

  /** The events-table query shape used by SparkEntry (q31): 15 MINUTES max
    * span, 3 minutes min — the reference's 15 s / 3 s segment bounds scaled
    * x60 to the events table's time density. Values are quantized to
    * round(value*1e6) BEFORE the fold so the per-session sum is exact
    * integer arithmetic — order-independent and bit-identical across
    * engines — which is what lets the stateful fold be oracle-checked
    * against DuckDB's recursive-CTE replay (same trick as q51's quantized
    * centroids). */
  def spanMergeEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.core.Tables.events(s, dir)
      .selectExpr("user_id as key", "ts_us as tsUs",
                  "cast(round(value * 1e6) as long) as value")
      .as[Event]
    spanMerge(ev, minSpanUs = 3L * 60 * 1000000, maxSpanUs = 15L * 60 * 1000000)
      .toDF()
      .select(col("key"), col("startUs").as("start_us"), col("endUs").as("end_us"),
              col("nEvents").cast("long").as("n_events"),
              col("sumValue").as("sum_q6"))
      .orderBy(col("key"), col("start_us"))
  }

  final case class KeyedValue(key: Long, tsUs: Long, seq: Long, value: Double)
  final case class EwmaResult(key: Long, nEvents: Long, ewma: Double)

  /** EWMA as a secondary-sort fold — the O(1)-heap-per-key scale path for
    * q98's recurrence (e_0 = v_0, e_i = α·v_i + (1-α)·e_{i-1}). The HOF
    * formulation (LlmOps.q98) collects and sorts each key's values inside
    * the aggregate — per-key memory is the group itself, which is the
    * right plan until a key is pathologically hot. This operator is the
    * same trade [[spanMerge]] makes for sessions: repartition on key,
    * sort runs within partitions, fold left-to-right holding two scalars.
    * The fold ORDER is identical to the HOF's array_sort order
    * ((key, tsUs, seq) with unique seq), so results are BIT-IDENTICAL —
    * LlmOpsSpec asserts exact equality between the two paths. */
  final case class KeyedToken(key: Long, tsUs: Long, seq: Long, token: String)
  final case class ConcatDigest(key: Long, nEvents: Long, journeyMd5: String)

  /** Ordered group concat as a ROLLING DIGEST — the constant-memory scale
    * path for q97: instead of materializing each key's joined journey
    * string (O(journey) heap in both the collect aggregate and any
    * string_agg), the secondary-sort fold feeds each token (and the '>'
    * separator between tokens) straight into an incremental MD5. Per key
    * the heap holds one MessageDigest — however long the journey. Byte
    * stream equals UTF-8(array_join(tokens, ">")), so the hex digest is
    * IDENTICAL to q97's md5-of-joined-string (LlmOpsSpec asserts it). */
  def orderedConcatMd5(events: Dataset[KeyedToken]): Dataset[ConcatDigest] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("seq"))
      .mapPartitions { it =>
        val sep = ">".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        new scala.collection.AbstractIterator[ConcatDigest] {
          private val buf = it.buffered
          override def hasNext: Boolean = buf.hasNext
          override def next(): ConcatDigest = {
            val md = java.security.MessageDigest.getInstance("MD5")
            val first = buf.next()
            val key = first.key
            md.update(first.token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var n = 1L
            while (buf.hasNext && buf.head.key == key) {
              val e = buf.next()
              md.update(sep)
              md.update(e.token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              n += 1
            }
            ConcatDigest(key, n,
              md.digest().map(b => f"$b%02x").mkString)
          }
        }
      }
  }

  final case class MotifCount(key: Long, seqLen: Long, nMotif: Long)

  /** Sequence-motif counting as a secondary-sort fold — the bounded-memory
    * scale path for q176's journey recurrence. The HOF formulation
    * (AnalyticsOps.q176) materializes each user's full journey string
    * inside a collect_list aggregate: per-key memory is the journey itself,
    * which is the right plan until a key is pathologically hot (a bot-grade
    * user concentrates one giant string on one task). This fold holds O(1)
    * state per key — the KMP match position, the event count, and the motif
    * counter — however long the journey.
    *
    * Counting semantics are EXACTLY q176's fixed-substring arithmetic
    * ((len − len(replace(s, motif, ''))) / len(motif)): `replace` consumes
    * greedy non-overlapping left-to-right occurrences, which is precisely
    * KMP with a reset-to-zero after each full match. The fold order
    * ((key, tsUs, seq) with unique seq) matches the HOF's
    * array_sort(struct(ts_us, event_id, ini)) order, so results are
    * bit-identical — OpsSpec asserts equality on a 1M-event hot key. */
  def motifCountFold(events: Dataset[KeyedToken], motif: String): Dataset[MotifCount] = {
    require(motif.nonEmpty, "motif must be non-empty")
    import events.sparkSession.implicits._
    // KMP failure table: fail(j) = length of the longest proper prefix of
    // motif(0..j) that is also a suffix — standard; built once on the driver
    val fail = {
      val f = new Array[Int](motif.length)
      var k = 0
      var j = 1
      while (j < motif.length) {
        while (k > 0 && motif(j) != motif(k)) k = f(k - 1)
        if (motif(j) == motif(k)) k += 1
        f(j) = k
        j += 1
      }
      f
    }
    events
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("seq"))
      .mapPartitions { it =>
        new scala.collection.AbstractIterator[MotifCount] {
          private val buf = it.buffered
          override def hasNext: Boolean = buf.hasNext
          override def next(): MotifCount = {
            val first = buf.next()
            val key = first.key
            var j = 0 // KMP state: chars of motif currently matched
            var len = 0L // journey length in chars (== seq_len of the HOF path)
            var hits = 0L
            def feed(t: String): Unit = {
              var i = 0
              while (i < t.length) {
                val c = t.charAt(i)
                while (j > 0 && c != motif(j)) j = fail(j - 1)
                if (c == motif(j)) j += 1
                if (j == motif.length) { hits += 1; j = 0 } // non-overlapping: reset
                i += 1
              }
              len += t.length
            }
            feed(first.token)
            while (buf.hasNext && buf.head.key == key) feed(buf.next().token)
            MotifCount(key, len, hits)
          }
        }
      }
  }

  def ewmaFold(events: Dataset[KeyedValue], alpha: Double): Dataset[EwmaResult] = {
    import events.sparkSession.implicits._
    val beta = 1.0 - alpha
    events
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("seq"))
      .mapPartitions { it =>
        new scala.collection.AbstractIterator[EwmaResult] {
          private val buf = it.buffered
          override def hasNext: Boolean = buf.hasNext
          override def next(): EwmaResult = {
            val first = buf.next()
            val key = first.key
            var acc = first.value
            var n = 1L
            while (buf.hasNext && buf.head.key == key) {
              val e = buf.next()
              acc = alpha * e.value + beta * acc
              n += 1
            }
            EwmaResult(key, n, acc)
          }
        }
      }
  }
}
