package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.{InstructionsPipeline, PipeDoc}
import graft.llm.LlmClient
import graft.model.PipelineConf

/** The reference's I/O surface (SURVEY.md §2A ops 1-3), Spark-native:
  * JSONL scan (`spark.read.json` handles one-object-per-line with
  * blank-line tolerance natively — bin/text_mr_pipe.py:46-49), the
  * enriched-record embed (`results` struct next to the original
  * fields — bin/text_mr_pipe.py:55), and JSONL sink
  * (bin/text_mr_pipe.py:50-58).
  *
  * Unlike the reference's append-per-record file handle, the sink is
  * a partitioned distributed write — at 100 TB the output is a
  * directory of part files, the only shape that scales.
  */
object Jsonl {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Full reference driver loop (bin/text_mr_pipe.py main): JSONL in
    * → per-document map/reduce → original record + `results` → JSONL
    * out. A synthetic stable id keys the join of pipeline outputs
    * back onto source records; both sides derive from ONE cached
    * DataFrame so the id assignment is consistent. */
  def enrich(spark: SparkSession, conf: PipelineConf, llm: LlmClient,
      inPath: String, outPath: Option[String] = None): DataFrame = {
    val src = read(spark, inPath)
      .withColumn("__graft_id", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = InstructionsPipeline.toDocs(src, "__graft_id", pretty = true)
    val results = new InstructionsPipeline(conf, llm).runWithReport(docs)
    val enriched = src
      .join(results.withColumnRenamed("id", "__graft_id"), "__graft_id")
      .drop("__graft_id")
    outPath.orElse(conf.outDataPath).foreach(p => write(enriched, p))
    enriched
  }
}
