package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{HttpLlm, LlmClient, StubLlm}
import graft.model.Configs
import graft.sources.Jsonl

/** The reference's primary UX, Spark-native:
  * `python text_mr_pipe.py config.json` → `graft.Main config.json`
  * (/root/reference/bin/text_mr_pipe.py:29-58). Loads the JSON
  * config, health-checks the LLM (the reference's "Hi" roundtrip,
  * text_mr_pipe.py:38-44), then runs JSONL scan → map/reduce →
  * enriched-JSONL sink via [[Jsonl.enrich]].
  *
  * Evaluator selection: `model="stub"` or an empty `api_url` runs the
  * deterministic offline stub (tests, dry runs); anything else goes
  * over HTTP with the configured dialect (openai/azure).
  */
object Main {

  private[graft] def pickLlm(apiUrl: String, model: String): LlmClient =
    if (apiUrl.isEmpty || model == "stub") StubLlm else new HttpLlm()

  /** Testable core: parse config, health-check, scan→MR→sink.
    * Returns the enriched DataFrame (also written to the config's
    * out_data_path when set). */
  def run(spark: SparkSession, configPath: String): DataFrame = {
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val conf = Configs.parse(json)
    val inPath = conf.inDataPath.getOrElse(
      throw new IllegalArgumentException("config needs 'in_data_path'"))
    val llm = pickLlm(conf.llm.apiUrl, conf.llm.model)
    // conn-check before touching data — fail fast like the reference
    if (!llm.healthCheck(conf.llm))
      throw new IllegalStateException(
        s"LLM health check failed for ${conf.llm.apiType} @ ${conf.llm.apiUrl}")
    Jsonl.enrich(spark, conf, llm, inPath)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.Main <config.json>")
    val spark = SparkSession.builder()
      .appName("graft-mr-pipe")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // spark-submit injects spark.master as a system property and
      // wins; a bare `java -cp`/sbt invocation falls back to local
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val out = run(spark, args(0))
      println(s"[graft.Main] enriched ${out.count()} records")
    } finally spark.stop()
  }
}
