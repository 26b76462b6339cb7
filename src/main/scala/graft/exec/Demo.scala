package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.llm.StubLlm
import graft.model.{Configs, Instruction, Stage}

/** Driver-visible demo pipelines: the reference's 2-stage map→reduce
  * shape (bin/text_mr_pipe.json — 12 map + 6 reduce over an EHR doc)
  * re-pointed at the `documents` testdata table with the
  * deterministic stub evaluator. These are the `queries` entries that
  * exercise the instructions-MR engine end-to-end under the driver's
  * rows-only check.
  */
object Demo {

  /** Map→reduce config in the generic pipe's JSON dialect (§2C). */
  val pipelineJson: String =
    """{
      |  "output_col": "results",
      |  "llm": {"api_type": "openai", "model": "stub", "temperature": 0.0,
      |          "top_p": 0.0001, "seed": 2},
      |  "pipe": [
      |    [
      |      {"name": "summary", "role": "You are a corpus analyst.",
      |       "content": "Summarize the document text.", "scope": ["text"]},
      |      {"name": "language_note", "content": "Describe the language metadata.",
      |       "scope": ["lang", "source"]},
      |      {"name": "size_note", "content": "Comment on the document size.",
      |       "scope": ["n_chars"]},
      |      {"name": "keywords", "content": "List the salient keywords.",
      |       "output_desc": "A comma-separated list.", "scope": ["text"]}
      |    ],
      |    [
      |      {"name": "overview", "content": "Merge the notes into one overview.",
      |       "input_desc": "Analyst notes.", "scope": ["summary", "language_note"]},
      |      {"name": "index_entry", "content": "Produce a catalog entry.",
      |       "scope": ["keywords", "size_note"]}
      |    ]
      |  ]
      |}""".stripMargin

  /** Generic 2-stage map→reduce over `documents` (stub LLM). */
  def mrPipeline(spark: SparkSession, dir: String): DataFrame =
    InstructionsPipeline.runConfig(spark, pipelineJson,
      Tables.documents(spark, dir), "doc_id", StubLlm)

  /** 3-turn self-verified map + rewriting reduce over a slice of
    * `documents` (stub LLM); the turn chain multiplies LLM calls ×3,
    * so the demo bounds the doc count like the POC bounds its corpus. */
  def selfVerify(spark: SparkSession, dir: String): DataFrame = {
    val mapStage = Stage(Seq(
      Instruction(name = "facts", content = Some("Extract factual statements."),
        scope = Some(Seq("text"))),
      Instruction(name = "entities", content = Some("Extract named entities."),
        scope = Some(Seq("text")))),
      role = Some("You are an information extractor."))
    val reduceStage = Stage(Seq(
      Instruction(name = "report", content = Some("Merge into a verified report."),
        scope = Some(Seq("facts", "entities")))))
    val conf = Configs.parse(pipelineJson)
    val docs = InstructionsPipeline.toDocs(
      Tables.documents(spark, dir).filter(org.apache.spark.sql.functions.col("doc_id") < 100),
      "doc_id")
    new SelfVerifyPipeline(mapStage, reduceStage, conf.llm, StubLlm)
      .runWithReport(docs)
  }
}
