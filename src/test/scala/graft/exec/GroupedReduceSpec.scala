package graft.exec

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.StubLlm
import graft.model.{Instruction, LlmParams}

class GroupedReduceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => PipeDoc(i.toLong,
      scala.collection.immutable.ListMap(
        "text" -> s"doc $i", "grp" -> s"g${i % 3}"))).toDS()
  }

  val instr = Instruction(name = "s", content = Some("Summarize group."),
    scope = Some(Seq("text")))

  test("one output row (and one LLM call) per group") {
    val out = GroupedReduce.run(spark, docs(12), _.fields("grp"), instr,
      LlmParams(), StubLlm).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("g0", "g1", "g2"))
  }

  test("partitioning-invariant: 1 vs 8 partitions give identical results") {
    val one = GroupedReduce.run(spark, docs(20).repartition(1), _.fields("grp"),
      instr, LlmParams(), StubLlm).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val eight = GroupedReduce.run(spark, docs(20).repartition(8), _.fields("grp"),
      instr, LlmParams(), StubLlm).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one == eight)
  }

  test("maxDocs caps the packed prompt deterministically") {
    val out = GroupedReduce.run(spark, docs(30), _.fields("grp"), instr,
      LlmParams(), StubLlm, maxDocs = 2).collect()
    assert(out.length == 3)
    // same cap → same smallest-ids selection regardless of order
    val out2 = GroupedReduce.run(spark, docs(30).repartition(7), _.fields("grp"),
      instr, LlmParams(), StubLlm, maxDocs = 2).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq ==
      out2.map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq)
  }
}
