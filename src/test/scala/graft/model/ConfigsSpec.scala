package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ConfigsSpec extends AnyFunSuite {

  val genericJson: String =
    """{
      |  "in_data_path": "/in.jsonl", "out_data_path": "/out.jsonl",
      |  "llm": {"api_type": "openai", "api_url": "http://x", "api_key": "k",
      |          "model": "m", "temperature": 0.0, "top_p": 0.0001, "seed": 2},
      |  "pipe": [
      |    [{"name": "a", "role": "r", "content": "c", "scope": ["f1", "f2"]},
      |     {"name": "b", "content": "c2"}],
      |    [{"name": "red", "input_desc": "i", "output_desc": "o",
      |      "content": null, "scope": ["a", "b"]}]
      |  ]
      |}""".stripMargin

  test("generic 2-stage pipe parses (reference text_mr_pipe.json shape)") {
    val conf = Configs.parse(genericJson)
    assert(conf.pipe.size == 2)
    assert(conf.pipe.head.instructions.map(_.name) == Seq("a", "b"))
    assert(conf.pipe.head.instructions.head.scope.contains(Seq("f1", "f2")))
    assert(conf.pipe(1).instructions.head.content.isEmpty) // null content ok
    assert(conf.llm.seed == 2L && conf.llm.topP == 0.0001)
    assert(conf.outputCol == "results")
  }

  test("stage-level role hoisting (POC dialect) with instruction override") {
    val conf = Configs.parse(
      """{"pipe": [{"role": "stage-role",
        |  "instructions": [{"name": "x"}, {"name": "y", "role": "own"}]}]}""".stripMargin)
    val resolved = conf.pipe.head.resolved
    assert(resolved.head.role.contains("stage-role"))
    assert(resolved(1).role.contains("own"))
  }

  test("duplicate instruction names rejected at plan time") {
    val ex = intercept[IllegalArgumentException] {
      Configs.parse("""{"pipe": [[{"name": "dup"}, {"name": "dup"}]]}""")
    }
    assert(ex.getMessage.contains("dup"))
  }

  test("missing name rejected") {
    intercept[IllegalArgumentException] {
      Configs.parse("""{"pipe": [[{"content": "no name"}]]}""")
    }
  }

  test("lint flags unknown scope refs, dead outputs, empty pipes; clean config is silent") {
    // typo'd scope: stage 2 references a field stage 1 never produces
    val typo = Configs.parse(
      """{"pipe": [
        |  [{"name": "summary", "content": "s"}, {"name": "facts", "content": "f"}],
        |  [{"name": "report", "content": "r", "scope": ["sumary", "facts"]}]
        |]}""".stripMargin)
    val w1 = Configs.lint(typo)
    assert(w1.exists(w => w.contains("'sumary'") && w.contains("stage 2")))
    // dead work: stage-1 output nothing in stage 2 ever scopes
    assert(w1.exists(w => w.contains("'summary'") && w.contains("dead work")))
    // unscoped (scope-all) downstream stage suppresses the dead-work pass
    val scopeAll = Configs.parse(
      """{"pipe": [
        |  [{"name": "a", "content": "x"}],
        |  [{"name": "b", "content": "y"}]
        |]}""".stripMargin)
    assert(Configs.lint(scopeAll).isEmpty)
    // empty pipe and empty stage each warn
    assert(Configs.lint(Configs.parse("""{"pipe": []}""")).nonEmpty)
    assert(Configs.lint(Configs.parse("""{"pipe": [[]]}""")).nonEmpty)
    // the real EHR-shaped config used by the e2e tests lints clean
    val ehr = Configs.parse(
      """{"pipe": [
        |  [{"name": "chief_complaint", "content": "c", "scope": ["encounters"]},
        |   {"name": "medication_history", "content": "m", "scope": ["medications"]}],
        |  [{"name": "overview", "content": "o",
        |    "scope": ["chief_complaint", "medication_history"]}]
        |]}""".stripMargin)
    assert(Configs.lint(ehr).isEmpty)
  }
}
