package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pipeline IR: the engine's logical-plan nodes for the instructions-
  * MapReduce surface (SURVEY.md §1.1, §2C).
  *
  * An [[Instruction]] is a config-driven operator instance: one output
  * field, a prompt recipe, and a `scope` (input projection; None ⇒ all
  * fields — /root/reference/src/python/instructionspipe/instructions.py:10-18,
  * instructions_runners.py:38-39). A [[Stage]] is one map or reduce
  * wave; a [[PipelineConf]] is the ordered stage list plus LLM params
  * (/root/reference/bin/text_mr_pipe.json).
  */
final case class Instruction(
    name: String,
    role: Option[String] = None,
    content: Option[String] = None,
    inputDesc: Option[String] = None,
    outputDesc: Option[String] = None,
    scope: Option[Seq[String]] = None)

/** One stage = a list of instructions evaluated concurrently; `role`
  * is the stage-level default the POC hoists
  * (self_verification_mr.json:30,95), overridable per instruction. */
final case class Stage(
    instructions: Seq[Instruction],
    role: Option[String] = None) {
  def resolved: Seq[Instruction] =
    instructions.map(i => if (i.role.isEmpty) i.copy(role = role) else i)
}

/** LLM call parameters. `responseFormat` is the OpenAI
  * `response_format` object as a compact JSON string (e.g.
  * `{"type":"json_schema","json_schema":{...}}`) — the reference
  * passes it on every call (llm_cli.py:66,80 `response_format=
  * json_schema`); None omits the field. Per-call overrides (the
  * reference's async_run(temperature=, max_tokens=, json_schema=)
  * — llm_cli.py:60-66) are expressed by passing a modified copy to
  * `LlmClient.complete`, which takes params per call: see
  * [[withOverrides]]. The reference's `prefix` messages need no
  * knob — callers already pass the full conversation. */
final case class LlmParams(
    apiType: String = "openai",
    apiUrl: String = "",
    apiKey: String = "",
    apiVersion: Option[String] = None,
    model: String = "stub",
    temperature: Double = 0.0,
    topP: Double = 0.0001,
    seed: Long = 2,
    maxTokens: Int = 4096,
    responseFormat: Option[String] = None) {

  /** Per-call parameter override (None ⇒ keep the stage value). */
  def withOverrides(
      temperature: Option[Double] = None,
      maxTokens: Option[Int] = None,
      responseFormat: Option[String] = None): LlmParams =
    copy(
      temperature = temperature.getOrElse(this.temperature),
      maxTokens = maxTokens.getOrElse(this.maxTokens),
      responseFormat = responseFormat.orElse(this.responseFormat))
}

final case class PipelineConf(
    inDataPath: Option[String],
    outDataPath: Option[String],
    outputCol: String,
    llm: LlmParams,
    pipe: Seq[Stage])

/** JSON config reader mirroring the reference's surface (§2C):
  * snake_case keys, nullable prompt sections, 2..N stages. Unlike the
  * reference (which silently overwrites duplicate names,
  * instructions.py:55-57), duplicate instruction names within a stage
  * are a plan-time error. */
object Configs {

  def parse(json: String): PipelineConf = fromJValue(JsonMethods.parse(json))

  def fromJValue(jv: JValue): PipelineConf = {
    val llm = jv \ "llm" match {
      case JObject(_) => llmParams(jv \ "llm")
      case _          => LlmParams()
    }
    val stages = (jv \ "pipe") match {
      case JArray(xs) => xs.map(stage)
      case JNothing   => Nil
      case other => throw new IllegalArgumentException(s"'pipe' must be a list, got $other")
    }
    stages.foreach(validate)
    PipelineConf(
      inDataPath = str(jv \ "in_data_path"),
      outDataPath = str(jv \ "out_data_path"),
      outputCol = str(jv \ "output_col").getOrElse("results"),
      llm = llm,
      pipe = stages)
  }

  private def validate(s: Stage): Unit = {
    val dups = s.instructions.groupBy(_.name).collect { case (n, is) if is.size > 1 => n }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate instruction names in stage: ${dups.mkString(", ")}")
  }

  /** Semantic LINT of a parsed pipeline — the plan-time analysis the
    * reference lacks (its scope projection silently drops unknown
    * keys at RUNTIME, instructions_runners.py:38-39, so a typo'd
    * scope entry just produces an empty prompt section mid-run on
    * the cluster). Warnings, not errors, because lenient-drop IS the
    * reference semantics the engine reproduces — but a CI that
    * asserts `lint(conf).isEmpty` catches:
    *  - a stage ≥ 2 instruction scoping a field no previous-stage
    *    instruction produces (stage 1 scopes address the input
    *    document, which is unknowable statically);
    *  - a non-final stage output that no later instruction ever
    *    scopes (dead work — every LLM call costs real money);
    *  - an empty pipe / empty stage. */
  def lint(conf: PipelineConf): Seq[String] = {
    val w = Seq.newBuilder[String]
    if (conf.pipe.isEmpty) w += "pipe is empty: no stages configured"
    conf.pipe.zipWithIndex.foreach { case (s, i) =>
      if (s.instructions.isEmpty) w += s"stage ${i + 1} has no instructions"
    }
    conf.pipe.sliding(2).zipWithIndex.foreach {
      case (Seq(prev, next), i) =>
        val produced = prev.instructions.map(_.name).toSet
        next.instructions.foreach { ins =>
          ins.scope.getOrElse(Nil).filterNot(produced).foreach { missing =>
            w += s"stage ${i + 2} instruction '${ins.name}' scopes " +
              s"'$missing', which stage ${i + 1} does not produce " +
              s"(produces: ${produced.toSeq.sorted.mkString(", ")})"
          }
        }
        val consumed = next.instructions
          .flatMap(_.scope.getOrElse(Nil)).toSet
        val allExplicit = next.instructions.forall(_.scope.isDefined)
        if (allExplicit) {
          (produced -- consumed).toSeq.sorted.foreach { unused =>
            w += s"stage ${i + 1} output '$unused' is never scoped by " +
              s"stage ${i + 2} (dead work: its LLM calls are discarded)"
          }
        }
      case _ => ()
    }
    w.result()
  }

  /** A stage is either a bare list of instructions (generic pipe) or
    * an object {role, instructions} (POC stage-level role). */
  private def stage(jv: JValue): Stage = jv match {
    case JArray(xs) => Stage(xs.map(instruction))
    case o: JObject =>
      val role = str(o \ "role")
      (o \ "instructions") match {
        case JArray(xs) => Stage(xs.map(instruction), role)
        case _ => throw new IllegalArgumentException("stage object needs 'instructions'")
      }
    case other => throw new IllegalArgumentException(s"bad stage: $other")
  }

  private def instruction(jv: JValue): Instruction = Instruction(
    name = str(jv \ "name").getOrElse(
      throw new IllegalArgumentException("instruction needs 'name'")),
    role = str(jv \ "role"),
    content = str(jv \ "content"),
    inputDesc = str(jv \ "input_desc"),
    outputDesc = str(jv \ "output_desc"),
    scope = (jv \ "scope") match {
      case JArray(xs) => Some(xs.collect { case JString(s) => s })
      case _          => None
    })

  private def llmParams(jv: JValue): LlmParams = LlmParams(
    apiType = str(jv \ "api_type").getOrElse("openai"),
    apiUrl = str(jv \ "api_url").getOrElse(""),
    apiKey = str(jv \ "api_key").getOrElse(""),
    apiVersion = str(jv \ "api_version"),
    model = str(jv \ "model").getOrElse("stub"),
    temperature = dbl(jv \ "temperature").getOrElse(0.0),
    topP = dbl(jv \ "top_p").getOrElse(0.0001),
    seed = lng(jv \ "seed").getOrElse(2L),
    maxTokens = lng(jv \ "max_tokens").map(_.toInt).getOrElse(4096),
    responseFormat = (jv \ "response_format") match {
      case JNothing | JNull => None
      case o                => Some(JsonMethods.compact(JsonMethods.render(o)))
    })

  private def str(jv: JValue): Option[String] = jv match {
    case JString(s) => Some(s)
    case _          => None
  }
  private def dbl(jv: JValue): Option[Double] = jv match {
    case JDouble(d)  => Some(d)
    case JInt(i)     => Some(i.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _           => None
  }
  private def lng(jv: JValue): Option[Long] = jv match {
    case JInt(i)    => Some(i.toLong)
    case JLong(l)   => Some(l)
    case JDouble(d) => Some(d.toLong)
    case _          => None
  }
}
