package graft.exec

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{ChatMsg, LlmClient, StubLlm}
import graft.model.{Instruction, LlmParams, Stage}

/** Records message counts per request. Top-level (serializable, no
  * suite capture); counts land in a static queue — observable because
  * local-mode executors share the test JVM. */
object TurnRecorder {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val formats = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
}
class CountingStub extends LlmClient {
  override def complete(msgs: Seq[ChatMsg], params: LlmParams): String = {
    TurnRecorder.seen.add(msgs.length)
    TurnRecorder.formats.add(msgs.length -> params.responseFormat.getOrElse(""))
    StubLlm.complete(msgs, params)
  }
}

class SelfVerifySpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => PipeDoc(i.toLong,
      scala.collection.immutable.ListMap("text" -> s"doc $i text"))).toDS()
  }

  val mapStage = Stage(Seq(
    Instruction(name = "facts", content = Some("Extract facts."), scope = Some(Seq("text"))),
    Instruction(name = "entities", content = Some("Extract entities."), scope = Some(Seq("text")))),
    role = Some("extractor"))
  val reduceStage = Stage(Seq(
    Instruction(name = "report", content = Some("Merge."), scope = Some(Seq("facts", "entities")))))

  test("3 map turns + 1 reduce call per instruction; conversations grow") {
    TurnRecorder.seen.clear()
    val out = new SelfVerifyPipeline(mapStage, reduceStage, LlmParams(), new CountingStub)
      .run(docs(1)).collect()
    assert(out.length == 1 && out.head.fields.keys.toSeq == Seq("report"))
    val turns = TurnRecorder.seen.toArray(Array.empty[Integer]).map(_.toInt).sorted
    // per map instruction: 2 msgs (t1), 4 (t2), 6 (t3); reduce: 2
    assert(turns.toSeq == Seq(2, 2, 2, 4, 4, 6, 6))
  }

  test("extraction turn is json_schema-constrained; later turns are not") {
    // INIT_GEN_SCHEMA rides only on turn 1 (2-msg conversations);
    // omission/evidence/reduce keep the stage params
    TurnRecorder.formats.clear()
    new SelfVerifyPipeline(mapStage, reduceStage, LlmParams(), new CountingStub)
      .run(docs(1)).collect()
    val byTurn = TurnRecorder.formats.toArray(Array.empty[(Int, String)])
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // 2-msg calls = turn-1 extraction (schema'd) AND the reduce call
    // (plain), so both values appear there; turns 2/3 are plain only
    assert(byTurn(2) == Set(SelfVerifyPipeline.InitGenSchema, ""))
    assert(byTurn(4) == Set("") && byTurn(6) == Set(""))
    val rf = org.json4s.jackson.JsonMethods.parse(SelfVerifyPipeline.InitGenSchema)
    assert((rf \ "type") == org.json4s.JString("json_schema"))
  }

  test("deterministic end-to-end with stub") {
    val p = new SelfVerifyPipeline(mapStage, reduceStage, LlmParams(), StubLlm)
    val a = p.runWithReport(docs(4)).collect().map(_.toString).sorted.toSeq
    val b = p.runWithReport(docs(4)).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.forall(_.contains("# report")))
  }

  test("prune hook filters map outputs before reduce") {
    val p = new SelfVerifyPipeline(mapStage, reduceStage, LlmParams(), StubLlm,
      prune = _.filter(_._1 != "entities"))
    val out = p.run(docs(1)).collect().head
    assert(out.fields.keys.toSeq == Seq("report")) // reduce still runs on facts only
  }
}
