package graft.exec

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{ChatMsg, LlmClient, StubLlm}
import graft.model.{Configs, Instruction, LlmParams, Stage}

/** Counts actual LLM calls; static so local-mode executor closures
  * share the counter with the test. */
object CallCounter {
  val calls = new java.util.concurrent.atomic.AtomicLong()
}
class CountingLlm extends LlmClient {
  override def complete(msgs: Seq[ChatMsg], params: LlmParams): String = {
    CallCounter.calls.incrementAndGet()
    StubLlm.complete(msgs, params)
  }
}

class CachedStageSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  val stage = Stage(Seq(
    Instruction(name = "summary", content = Some("Summarize."), scope = Some(Seq("text"))),
    Instruction(name = "meta", content = Some("Describe."), scope = Some(Seq("lang")))))

  def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => PipeDoc(i.toLong,
      scala.collection.immutable.ListMap(
        "text" -> s"body $i", "lang" -> "en"))).toDS()
  }

  test("second identical run does ZERO llm calls and matches the first") {
    val cachePath = java.nio.file.Files.createTempDirectory("graft-llmcache")
      .toString + "/cache"
    CallCounter.calls.set(0)
    val first = CachedStage.runStage(docs(6), stage, LlmParams(), new CountingLlm, cachePath)
      .collect().sortBy(_.id).toSeq
    // 6 distinct summary prompts + ONE shared meta prompt (identical
    // lang across docs → within-run prompt dedup)
    assert(CallCounter.calls.get() == 7)
    assert(first.forall(_.fields.keySet == Set("summary", "meta")))

    CallCounter.calls.set(0)
    val second = CachedStage.runStage(docs(6), stage, LlmParams(), new CountingLlm, cachePath)
      .collect().sortBy(_.id).toSeq
    assert(CallCounter.calls.get() == 0)  // all hits
    assert(second == first)
  }

  test("partial overlap: only new documents trigger calls") {
    val cachePath = java.nio.file.Files.createTempDirectory("graft-llmcache2")
      .toString + "/cache"
    CachedStage.runStage(docs(4), stage, LlmParams(), StubLlm, cachePath).collect()
    CallCounter.calls.set(0)
    val out = CachedStage.runStage(docs(6), stage, LlmParams(), new CountingLlm, cachePath)
      .collect()
    // only the 2 new summary prompts miss (meta is cached from run 1)
    assert(CallCounter.calls.get() == 2)
    assert(out.length == 6)
  }

  test("cache probe resolves through the Hadoop FileSystem (file: URI works)") {
    // the probe must go through FileSystem.get(path.toUri, conf), not a
    // driver-local java.io.File — a scheme'd URI is the regression canary
    // (and on HDFS/S3, the only correct resolution path)
    val cachePath = "file:" + java.nio.file.Files
      .createTempDirectory("graft-llmcache-uri").toString + "/cache"
    CallCounter.calls.set(0)
    CachedStage.runStage(docs(3), stage, LlmParams(), new CountingLlm, cachePath).collect()
    assert(CallCounter.calls.get() == 4) // 3 summaries + 1 shared meta
    CallCounter.calls.set(0)
    val out = CachedStage.runStage(docs(3), stage, LlmParams(), new CountingLlm, cachePath)
      .collect()
    assert(CallCounter.calls.get() == 0) // replay hits through the URI probe
    assert(out.length == 3)
  }

  test("cached stage agrees with the uncached pipeline runner") {
    val cachePath = java.nio.file.Files.createTempDirectory("graft-llmcache3")
      .toString + "/cache"
    val cached = CachedStage.runStage(docs(5), stage, LlmParams(), StubLlm, cachePath)
      .collect().sortBy(_.id).map(d => d.id -> d.fields).toMap
    val conf = Configs.fromJValue(org.json4s.JObject())
      .copy(pipe = Seq(stage))
    val plain = new InstructionsPipeline(conf, StubLlm).run(docs(5))
      .collect().sortBy(_.id).map(d => d.id -> d.fields).toMap
    assert(cached.keys == plain.keys)
    cached.foreach { case (id, f) => assert(f == plain(id)) }
  }
}
