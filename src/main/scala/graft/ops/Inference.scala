package graft.ops

import java.util.concurrent.ConcurrentHashMap

/** The batched ML-inference operator (O16/O26, pa.py:241-278, SURVEY §2.7).
  *
  * The reference loads Whisper once per process at module import
  * (pa.py:37-46) and runs batched calls (batch_size=8). The Spark-native
  * analog: a per-executor-JVM lazy singleton resolved by NAME on the executor
  * (never serialized into closures — models don't ship over the wire), driven
  * from `mapPartitions` with an in-partition micro-batching loop.
  *
  * The environment here is offline, so the real HF-backed implementation is a
  * plug point: `Transcriber` is the trait, the deterministic stub is what
  * tests/bench run (SURVEY §2.7 "pluggable Transcriber"). GPU scheduling on a
  * real cluster is spark.executor.resource.gpu.amount + task-level resource
  * requests; nothing in this operator changes.
  */
object Inference {

  final case class AsrInput(samples: Array[Float], sampleRate: Int)

  trait Transcriber extends Serializable {
    /** Transcribe a micro-batch; must return exactly one text per input. */
    def transcribe(batch: Seq[AsrInput]): Seq[String]
  }

  /** Deterministic offline stub: text is a pure function of the audio content
    * (sample count + coarse energy fingerprint), drawn from a fixed vocab that
    * deliberately includes hallucination-pattern strings, short strings, and
    * letter-free strings so the downstream text filters (O18-O20) are
    * exercised end-to-end. */
  final class StubTranscriber extends Transcriber {
    private val vocab = Array(
      "hello", "world", "spark", "audio", "segment", "quality", "data",
      "training", "voice", "signal", "clean", "speech", "model", "batch")
    override def transcribe(batch: Seq[AsrInput]): Seq[String] = batch.map { in =>
      var h = 1125899906842597L // deterministic FNV-ish fold over a sample sketch
      h = h * 31 + in.samples.length
      h = h * 31 + in.sampleRate
      var i = 0
      while (i < in.samples.length) {
        h = h * 31 + math.round(in.samples(i) * 100).toLong
        i += math.max(1, in.samples.length / 64) // 64-point sketch
      }
      val m = math.floorMod(h, 23L).toInt
      m match {
        case 0 => ""                        // dropped: empty (pa.py:302)
        case 1 => "so yeah"                 // dropped: <=2 words (pa.py:302-303)
        case 2 => "1 2 3 4"                 // dropped: no letters (pa.py:304-305)
        case 3 => "[MUSIC] plays loudly here" // dropped: bracket pattern
        case 4 => "thanks for watching everyone today" // dropped: hallucination
        case _ =>
          val n = 3 + math.floorMod(h >> 8, 6L).toInt
          val words = (0 until n).map(k => vocab(math.floorMod(h >> (k * 5), vocab.length.toLong).toInt))
          // occasionally force a boundary word so the overlap flag fires
          val w2 = if (math.floorMod(h >> 40, 4L) == 0) words.updated(n - 1, "hello") else words
          val w3 = if (math.floorMod(h >> 44, 4L) == 0) "hello" +: w2.tail else w2
          w3.mkString(" ")
      }
    }
  }

  /** Per-JVM transcriber cache — the distributed analog of the reference's
    * module-level ASR_PIPELINE global. The FACTORY (a small serializable
    * closure) ships to executors inside the mapPartitions closure and is
    * resolved on the driver at plan-build time; the constructed MODEL never
    * leaves the JVM it was built in. Runtime `register` therefore works on a
    * real multi-JVM cluster, not just local mode. */
  object Transcribers {
    private val factories = new ConcurrentHashMap[String, () => Transcriber]()
    private val instances = new ConcurrentHashMap[String, Transcriber]()
    register("stub", () => new StubTranscriber)

    def register(name: String, factory: () => Transcriber): Unit = {
      factories.put(name, factory)
      instances.remove(name)
    }
    /** Driver-side: resolve the factory to embed in a task closure. */
    def factoryFor(name: String): () => Transcriber = {
      val f = factories.get(name)
      require(f != null, s"no transcriber registered under '$name'")
      f
    }
    /** Executor-side: build-or-reuse this JVM's instance for `name`. */
    def getOrCreate(name: String, factory: () => Transcriber): Transcriber =
      instances.computeIfAbsent(name, _ => factory())
  }

  /** In-partition micro-batching loop (pa.py:268-270's batch_size=8): groups
    * the partition iterator, one model call per group, flattens back —
    * preserving input order so texts line up with rows (the reference's
    * index-misalignment bug, SURVEY §2.7, is impossible by construction). */
  def transcribePartition[T](rows: Iterator[T], toInput: T => AsrInput,
                             attach: (T, String) => T,
                             transcriberName: String = "stub",
                             batchSize: Int = 8,
                             factory: () => Transcriber = null): Iterator[T] = {
    val model = Transcribers.getOrCreate(transcriberName,
      if (factory != null) factory else Transcribers.factoryFor(transcriberName))
    rows.grouped(batchSize).flatMap { group =>
      val texts = model.transcribe(group.map(toInput))
      require(texts.length == group.length,
        s"transcriber returned ${texts.length} texts for ${group.length} inputs")
      group.lazyZip(texts).map((r, t) => attach(r, t.trim))
    }
  }
}
