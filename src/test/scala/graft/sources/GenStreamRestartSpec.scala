package graft.sources

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart semantics of the DSv2 streaming face (round-5 ADVICE
  * item 1): offsets handed back by the engine — checkpoint restore via
  * deserializeOffset, completed batches via commit — must ratchet the
  * in-memory cursor so a restarted query resumes AT the committed position
  * instead of re-walking (empty) batches from lo. */
class GenStreamRestartSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("id", LongType)))

  test("deserializeOffset (checkpoint restore) resumes from the committed position") {
    val st = new GenMicroBatchStream(0L, 100000L, 4, 8192L, schema)
    st.deserializeOffset("50000") // engine restores the checkpointed offset
    val next = st.latestOffset().asInstanceOf[GenOffset].pos
    assert(next == 58192L, s"expected resume at 50000+8192, got $next")
  }

  test("commit ratchets the cursor past an externally-planned batch") {
    val st = new GenMicroBatchStream(0L, 100000L, 4, 8192L, schema)
    st.commit(GenOffset(16384L))
    val next = st.latestOffset().asInstanceOf[GenOffset].pos
    assert(next == 24576L, s"expected 16384+8192, got $next")
  }

  test("ratchet clamps at the table end and never moves backwards") {
    val st = new GenMicroBatchStream(0L, 10000L, 4, 8192L, schema)
    st.deserializeOffset("999999") // corrupt/foreign offset: clamp to hi
    assert(st.latestOffset().asInstanceOf[GenOffset].pos == 10000L)
    st.deserializeOffset("5") // stale offset: cursor must not rewind
    assert(st.latestOffset().asInstanceOf[GenOffset].pos == 10000L)
  }

  test("fresh stream still walks from lo in batchRows steps") {
    val st = new GenMicroBatchStream(0L, 50000L, 4, 8192L, schema)
    assert(st.initialOffset().asInstanceOf[GenOffset].pos == 0L)
    assert(st.latestOffset().asInstanceOf[GenOffset].pos == 8192L)
    assert(st.latestOffset().asInstanceOf[GenOffset].pos == 16384L)
  }
}
