package graft

import java.io.EOFException
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.io.WavCodec
import graft.ops.{Inference, ProcessTranscriber}

/** End-to-end drive of the length-prefixed WAV↔transcript wire protocol
  * (round-6 verdict item 3) against the committed stdlib-only echo worker
  * `scripts/asr_echo_worker.py`. The worker replies
  * "<index>:<md5-prefix-8>:<byte-length>" per frame, so these tests pin
  * BOTH ordering (index) and payload integrity (md5 of exactly the WAV
  * bytes the driver framed). Nothing here registers the transcriber — the
  * stub stays the default everywhere; the spec constructs instances
  * directly. */
class ProcessTranscriberSpec extends AnyFunSuite {

  private val workerScript = {
    val f = new java.io.File("scripts/asr_echo_worker.py")
    assert(f.isFile, s"worker script missing at ${f.getAbsolutePath}")
    f.getPath
  }

  private def worker(mode: String*) =
    new ProcessTranscriber(Seq("python3", workerScript) ++ mode)

  private def pool(cap: Int, mode: String*) =
    new ProcessTranscriber(Seq("python3", workerScript) ++ mode, maxWorkers = cap)

  /** deterministic per-index test signal (arbitrary but stable) */
  private def input(i: Int, n: Int = 1600): Inference.AsrInput = {
    val samples = Array.tabulate(n)(j => math.sin((i + 1) * 0.01 * j).toFloat)
    Inference.AsrInput(samples, 16000)
  }

  private def expectedReply(i: Int, a: Inference.AsrInput): String = {
    val wav = WavCodec.encodeMono16(a.samples, a.sampleRate)
    val md5 = MessageDigest.getInstance("MD5").digest(wav)
      .map(b => f"$b%02x").mkString.take(8)
    s"$i:$md5:${wav.length}"
  }

  /** Mirror of the `dsp` worker's features, computed by independently
    * re-parsing the RIFF container the driver framed (chunk walk + LE
    * int16 read — NOT WavCodec's own decoder, so an encoder bug can't
    * cancel out). Integer math end to end: both sides agree exactly. */
  private def dspExpected(a: Inference.AsrInput): String = {
    val wav = WavCodec.encodeMono16(a.samples, a.sampleRate)
    def le32(o: Int) = (wav(o) & 0xff) | ((wav(o + 1) & 0xff) << 8) |
      ((wav(o + 2) & 0xff) << 16) | ((wav(o + 3) & 0xff) << 24)
    var o = 12
    while (!(wav(o) == 'd' && wav(o + 1) == 'a' && wav(o + 2) == 't' &&
             wav(o + 3) == 'a')) o += 8 + le32(o + 4)
    val n = le32(o + 4) / 2
    val xs = Array.tabulate(n)(i =>
      (((wav(o + 8 + 2 * i) & 0xff) | (wav(o + 9 + 2 * i) << 8)).toShort).toInt)
    def isqrt(v: Long): Long = {
      var r = math.sqrt(v.toDouble).toLong
      while (r * r > v) r -= 1
      while ((r + 1) * (r + 1) <= v) r += 1
      r
    }
    val sq = xs.foldLeft(0L)((acc, x) => acc + x.toLong * x)
    val rms = if (n == 0) 0L else isqrt(sq / n)
    val zc = xs.indices.drop(1).count(i => (xs(i - 1) < 0) != (xs(i) < 0))
    val peak = if (n == 0) 0 else xs.map(math.abs).max
    s"sr=${a.sampleRate} n=$n rms=$rms zc=$zc peak=$peak"
  }

  test("dsp mode: the worker DECODES the framed WAV with python's stdlib " +
       "wave module and replies content-derived features") {
    val batch = Seq(input(0), input(1, 800), input(2, 2400))
    val got = worker("dsp").transcribe(batch)
    assert(got == batch.map(dspExpected))
    // a different sample rate survives the container round trip
    val a8k = Inference.AsrInput(input(3, 640).samples, 8000)
    assert(worker("dsp").transcribe(Seq(a8k)) == Seq(dspExpected(a8k)))
  }

  test("batch of 3: transcripts attach to the right segments, in order") {
    val batch = Seq(input(0), input(1, 800), input(2, 2400))
    val got = worker().transcribe(batch)
    val want = batch.zipWithIndex.map { case (a, i) => expectedReply(i, a) }
    assert(got == want)
  }

  test("sequential batches share one worker: frame index keeps advancing") {
    val t = worker()
    assert(t.transcribe(Seq(input(0))) == Seq(expectedReply(0, input(0))))
    // same worker process: the second batch's frame is index 1, not 0
    assert(t.transcribe(Seq(input(1))) == Seq(expectedReply(1, input(1))))
  }

  test("replies larger than the OS pipe buffer do not deadlock (concurrent drain)") {
    // 64 frames x ~32 KB WAV; 'fat' mode pads each reply to its input frame's
    // size, so accumulated replies (~2 MB) overflow the ~64 KB stdout pipe
    // while the driver is still writing — the write-all-then-read-all shape
    // deadlocks here; the writer-thread drain must complete
    val batch = (0 until 64).map(i => input(i, 16000))
    val got = worker("fat").transcribe(batch)
    assert(got.size == 64)
    batch.zipWithIndex.foreach { case (a, i) =>
      val want = expectedReply(i, a)
      assert(got(i).startsWith(want), s"frame $i: ${got(i).take(40)}")
      assert(got(i).length == WavCodec.encodeMono16(a.samples, a.sampleRate).length)
    }
  }

  test("concurrent tasks on one cached instance do not interleave frames") {
    // local[N] shape: one Transcriber instance, N tasks calling it at once.
    // Payload integrity (md5) per reply proves frames never interleaved on
    // the pipe; consecutive indices within a batch prove batch atomicity.
    val t = worker()
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[String]]()
    val threads = (0 until 8).map { k =>
      new Thread(() => {
        val batch = Seq(input(10 * k), input(10 * k + 1), input(10 * k + 2))
        results.put(k, t.transcribe(batch))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(results.size == 8)
    (0 until 8).foreach { k =>
      val batch = Seq(input(10 * k), input(10 * k + 1), input(10 * k + 2))
      val got = results.get(k)
      val parts = got.map(_.split(":", 3))
      // md5 + length match this batch's frames exactly
      batch.zip(parts).foreach { case (a, p) =>
        val wav = WavCodec.encodeMono16(a.samples, a.sampleRate)
        val md5 = MessageDigest.getInstance("MD5").digest(wav)
          .map(b => f"$b%02x").mkString.take(8)
        assert(p(1) == md5 && p(2) == wav.length.toString, got.mkString("; "))
      }
      // batch atomicity: the worker numbered these three frames consecutively
      val idx = parts.map(_(0).toInt)
      assert(idx == Seq(idx.head, idx.head + 1, idx.head + 2), idx.mkString(","))
    }
  }

  test("pool: >1 batch genuinely in flight, frames intact per worker") {
    // 4 one-frame batches against 'slow' (1 s per reply) on a cap-4 pool.
    // Serial execution = >= 4 s; concurrent must land far under that. Each
    // fresh worker numbers its frames from 0, so all-indices-zero proves 4
    // DISTINCT worker processes served the 4 batches; md5 per reply proves
    // no cross-batch interleave on any pipe.
    val t = pool(4, "slow")
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[String]]()
    val t0 = System.nanoTime()
    val threads = (0 until 4).map { k =>
      new Thread(() => results.put(k, t.transcribe(Seq(input(20 + k)))))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(results.size == 4)
    (0 until 4).foreach { k =>
      val got = results.get(k)
      assert(got == Seq(expectedReply(0, input(20 + k))), s"batch $k: $got")
    }
    assert(wallMs < 2500, s"4 slow batches took $wallMs ms — pool not concurrent")
    // released workers are reused: a follow-up call advances an existing
    // worker's frame index instead of spawning a 5th process
    assert(t.transcribe(Seq(input(30))) == Seq(expectedReply(1, input(30))))
  }

  test("pool cap bounds spawns: 8 callers on a cap-2 pool use exactly 2 workers") {
    // 'slow' (1 s/reply) guarantees the 8 borrows overlap, so the cap is the
    // only thing limiting spawns: exactly 2 workers must serve all 8 frames.
    val t = pool(2, "slow")
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[String]]()
    val threads = (0 until 8).map { k =>
      new Thread(() => results.put(k, t.transcribe(Seq(input(40 + k)))))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(results.size == 8)
    // every reply intact (md5+length pin the payload to the right batch)
    (0 until 8).foreach { k =>
      val p = results.get(k).head.split(":", 3)
      val wav = WavCodec.encodeMono16(input(40 + k).samples, 16000)
      val md5 = MessageDigest.getInstance("MD5").digest(wav)
        .map(b => f"$b%02x").mkString.take(8)
      assert(p(1) == md5 && p(2) == wav.length.toString)
    }
    // 8 frames served by exactly 2 workers: each worker numbers its own
    // frames 0..k, so the index multiset must be two prefix-runs — the
    // per-value counts start at 2 (two fresh workers) and never increase
    val idx = results.values().stream().map[Int](s => s.head.split(":", 3)(0).toInt)
      .toArray(n => new Array[Integer](n)).map(_.toInt).toSeq
    val counts = (0 to idx.max).map(v => idx.count(_ == v))
    assert(counts.head == 2, s"expected exactly 2 fresh workers, indices $idx")
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, s"indices $idx")
    assert(counts.sum == 8, s"indices $idx")
  }

  test("worker death mid-batch fails the task (no silent empties)") {
    val e = intercept[Exception] {
      worker("die-after-1").transcribe(Seq(input(0), input(1), input(2)))
    }
    assert(e.isInstanceOf[EOFException], e.toString)
  }

  test("absurd reply length trips the frame guard") {
    val e = intercept[IllegalArgumentException] {
      worker("absurd").transcribe(Seq(input(0)))
    }
    assert(e.getMessage.contains("absurd frame length"), e.getMessage)
  }
}
