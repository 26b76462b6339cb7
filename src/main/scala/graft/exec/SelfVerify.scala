package graft.exec

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.llm.{ChatMsg, LlmClient}
import graft.model.{LlmParams, Stage}
import graft.ops.DocOps

/** The self-verifying MapReduce POC, Spark-native (SURVEY.md §3.3;
  * /root/reference/bin/poc/self-verified-mr/self_verification_mr.py).
  *
  * Mapper = a 3-turn conversation fold per instruction, all
  * instructions of a document batched per turn (the reference's 4
  * sequential gather-waves of 12,12,12,6 become, per document,
  * 3 batched turns + 1 reduce batch inside ONE partition pass):
  *
  *   turn 1 extraction  — strict "JSON array of string" contract
  *                        (self_verification_mr.py:229-275)
  *   turn 2 omission    — "check which information are missed"
  *                        follow-up on the same conversation (277-294)
  *   turn 3 evidence    — per-element supporting span; sentinel
  *                        "No evidence can support this statement."
  *                        (296-316)
  *   prune              — rule-based hook, default no-op (387-393)
  *
  * Reducer = per reduce-instruction XML-packed rewrite of scoped map
  * outputs (440-521).
  *
  * The whole chain runs in a single `mapPartitions` so conversation
  * state never crosses an exchange — the per-row multi-turn state
  * risk called out in SURVEY.md §7 ("hard parts" #2).
  */
final class SelfVerifyPipeline(
    mapStage: Stage,
    reduceStage: Stage,
    params: LlmParams,
    llm: LlmClient,
    prune: Seq[(String, String)] => Seq[(String, String)] = identity)
    extends Serializable {

  private val extractionSuffix =
    "\n\n# Output Format\nA JSON array of string."
  private val omissionPrompt =
    "Check which information are missed in your last response, and do complementation. " +
    "Return the complete result in the same format."
  private val evidencePrompt =
    "For each extracted element, find the supporting text span from the input. " +
    "Return a JSON array of {\"content\": ..., \"evidence\": ...}; use " +
    "\"No evidence can support this statement.\" when none exists."

  def run(ds: Dataset[PipeDoc]): Dataset[PipeDoc] = {
    val mapInstrs = mapStage.resolved
    val reduceInstrs = reduceStage.resolved
    val p = params
    // the extraction turn is schema-constrained (per-call override —
    // the reference defines INIT_GEN_SCHEMA for exactly this turn,
    // self_verification_mr.py:19-34, and llm_cli.py:80 passes it as
    // response_format); later turns keep the stage params
    val pExtract = p.withOverrides(
      responseFormat = Some(SelfVerifyPipeline.InitGenSchema))
    val client = llm
    val pruneFn = prune
    import ds.sparkSession.implicits._
    ds.mapPartitions { docs =>
      docs.map { doc =>
        if (doc.fields == null) doc
        else {
          // turn 1: extraction
          var convs: Seq[Seq[ChatMsg]] = mapInstrs.map { ins =>
            val projected = DocOps.scopeProject(doc.fields, ins.scope)
            DocOps.initChatml(DocOps.buildSysMsg(ins) + extractionSuffix,
              DocOps.buildUserMsg(projected))
          }
          val r1 = client.completeBatch(convs, pExtract)
          // turn 2: omission check (conversation grows)
          convs = convs.zip(r1).map { case (c, r) =>
            c :+ ChatMsg("assistant", r) :+ ChatMsg("user", omissionPrompt)
          }
          val r2 = client.completeBatch(convs, p)
          // turn 3: evidence grounding
          convs = convs.zip(r2).map { case (c, r) =>
            c :+ ChatMsg("assistant", r) :+ ChatMsg("user", evidencePrompt)
          }
          val r3 = client.completeBatch(convs, p)
          val mapResult = pruneFn(
            mapInstrs.map(_.name).zip(r3.map(DocOps.jsonClean)))
          val mapFields = mapResult.toMap
          // reduce: XML-packed rewrite per group
          val reduceBatch = reduceInstrs.map { ins =>
            val projected = DocOps.scopeProject(mapFields, ins.scope)
            DocOps.initChatml(DocOps.buildSysMsg(ins), DocOps.xmlPack(projected))
          }
          val rr = client.completeBatch(reduceBatch, p)
          if (rr.exists(r => r == null || r.isEmpty)) PipeDoc(doc.id, null)
          else PipeDoc(doc.id,
            scala.collection.immutable.ListMap(
              reduceInstrs.map(_.name).zip(rr): _*))
        }
      }
    }
  }

  /** id + reduce result map + markdown report. */
  def runWithReport(ds: Dataset[PipeDoc]): DataFrame =
    run(ds).toDF()
      .select(col("id"), col("fields").as("reduce_results"),
        DocOps.mdRenderCol(col("fields")).as("result"))
}

object SelfVerifyPipeline {

  /** The POC's json_schema response_format for the extraction turn —
    * /root/reference/bin/poc/self-verified-mr/self_verification_mr.py:19-34
    * (INIT_GEN_SCHEMA), passed as the chat-completions
    * `response_format` (llm_cli.py:80). */
  val InitGenSchema: String =
    """{"type":"json_schema","json_schema":{""" +
    """"name":"instruction_generated_elements_schema",""" +
    """"schema":{"type":"object","properties":{"content":{"type":"string"}},""" +
    """"required":["content"],"additionalProperties":false},""" +
    """"strict":true}}"""
}
