package graft.exec

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{FailingStubLlm, StubLlm}
import graft.model.Configs

class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  def docs(n: Int): org.apache.spark.sql.Dataset[PipeDoc] = {
    import spark.implicits._
    (0 until n).map(i => PipeDoc(i.toLong,
      scala.collection.immutable.ListMap(
        "text" -> s"document number $i body",
        "lang" -> "en", "n_chars" -> "42"))).toDS()
  }

  val confJson: String =
    """{"pipe": [
      |  [{"name": "summary", "content": "Summarize.", "scope": ["text"]},
      |   {"name": "meta", "content": "Describe metadata.", "scope": ["lang", "n_chars"]}],
      |  [{"name": "merged", "content": "Merge.", "scope": ["summary", "meta"]}]
      |]}""".stripMargin

  test("stage output schema == declared instruction names; chaining works") {
    val conf = Configs.parse(confJson)
    val pipe = new InstructionsPipeline(conf, StubLlm)
    val afterMap = pipe.runStage(docs(4), conf.pipe.head).collect()
    assert(afterMap.forall(_.fields.keys.toSeq == Seq("summary", "meta")))
    val fin = pipe.run(docs(4)).collect()
    assert(fin.length == 4)
    assert(fin.forall(_.fields.keys.toSeq == Seq("merged")))
  }

  test("determinism: two runs produce identical results") {
    val conf = Configs.parse(confJson)
    val pipe = new InstructionsPipeline(conf, StubLlm)
    val a = pipe.run(docs(8)).collect().sortBy(_.id).toSeq
    val b = pipe.run(docs(8)).collect().sortBy(_.id).toSeq
    assert(a == b)
  }

  test("all-or-nothing: one failing instruction nulls the doc result") {
    val conf = Configs.parse(confJson)
    val pipe = new InstructionsPipeline(conf, new FailingStubLlm("Describe metadata"))
    val out = pipe.run(docs(3)).collect()
    assert(out.forall(_.fields == null)) // map stage failed → propagated
  }

  test("scope of a missing field projects empty, does not fail (lenient)") {
    val conf = Configs.parse(
      """{"pipe": [[{"name": "ghost", "content": "x", "scope": ["nope"]}]]}""")
    val out = new InstructionsPipeline(conf, StubLlm).run(docs(2)).collect()
    assert(out.forall(d => d.fields.keys.toSeq == Seq("ghost")))
  }

  test("runWithReport embeds map/reduce results + markdown") {
    val conf = Configs.parse(confJson)
    val df = new InstructionsPipeline(conf, StubLlm).runWithReport(docs(2))
    val row = df.orderBy("id").collect().head
    val res = row.getStruct(1)
    assert(res.getAs[Map[String, String]]("map_results").keySet == Set("summary", "meta"))
    assert(res.getAs[Map[String, String]]("reduce_results").keySet == Set("merged"))
    assert(res.getAs[String]("result").startsWith("# merged\n"))
  }

  test("toDocs stringifies non-string columns (json2str_kv boundary)") {
    import spark.implicits._
    val df = Seq((1L, "t", 5, Seq("a", "b"))).toDF("id", "txt", "num", "arr")
    val d = InstructionsPipeline.toDocs(df, "id").collect().head
    assert(d.fields("txt") == "t")
    assert(d.fields("num") == "5")
    assert(d.fields("arr") == "[\"a\",\"b\"]")
  }
}
