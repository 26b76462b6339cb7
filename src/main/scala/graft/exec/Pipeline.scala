package graft.exec

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{ChatMsg, LlmClient}
import graft.model.{Instruction, JsonUtil, PipelineConf, Stage}
import graft.ops.DocOps

/** One pipeline document: stable id + the canonical field map
  * (everything stringified at stage boundaries — SURVEY.md §1.2). */
final case class PipeDoc(id: Long, fields: Map[String, String])

/** The instructions-MapReduce runner, Spark-native (SURVEY.md §3.4).
  *
  * Where the reference loops documents sequentially in one process
  * (bin/text_mr_pipe.py:51-58), here the document axis is the
  * Dataset's partition axis and each stage is ONE `mapPartitions`
  * pass: per document, all N instructions of the stage are built,
  * sent as one batch (LlmClient.completeBatch = the asyncio.gather
  * analog), and pivoted back into the next field map
  * (instructions.py:39-59). Parallelism = partitions × maxInFlight.
  *
  * Stage semantics preserved from the reference:
  *  - scope projection with silent missing-key drop (op 4);
  *  - all-or-nothing pivot: any empty/failed instruction response
  *    nulls the whole document's stage result (instructions.py:43-45,
  *    surfaced here as fields=null);
  *  - stage k+1 consumes ONLY stage k's result map (v0.py:45-50).
  *
  * Scale posture: no driver-side state; the LLM client is rebuilt
  * per executor (@transient lazy); deterministic params make the
  * stage idempotent and therefore retry/cache-safe (SURVEY.md §4).
  */
final class InstructionsPipeline(conf: PipelineConf, llm: LlmClient)
    extends Serializable {

  /** Run one stage over documents. */
  def runStage(ds: Dataset[PipeDoc], stage: Stage): Dataset[PipeDoc] = {
    val instrs = stage.resolved
    val params = conf.llm
    val client = llm
    import ds.sparkSession.implicits._
    ds.mapPartitions { docs =>
      docs.map { doc =>
        if (doc.fields == null) doc // propagate failed stage
        else {
          val batch: Seq[Seq[ChatMsg]] = instrs.map { ins =>
            val projected = DocOps.scopeProject(doc.fields, ins.scope)
            DocOps.initChatml(DocOps.buildSysMsg(ins), DocOps.buildUserMsg(projected))
          }
          val responses = client.completeBatch(batch, params)
          // all-or-nothing pivot (instructions.py:43-45)
          if (responses.exists(r => r == null || r.isEmpty))
            PipeDoc(doc.id, null)
          else
            PipeDoc(doc.id,
              scala.collection.immutable.ListMap(
                instrs.map(_.name).zip(responses): _*))
        }
      }
    }
  }

  /** Fold all stages; returns the final field map per document. */
  def run(ds: Dataset[PipeDoc]): Dataset[PipeDoc] =
    conf.pipe.foldLeft(ds)((d, s) => runStage(d, s))

  /** Full reference contract (v0.py:26-56): map results, reduce
    * results, and the markdown report, embedded next to the input
    * fields under `conf.outputCol` (bin/text_mr_pipe.py:55). */
  def runWithReport(ds: Dataset[PipeDoc]): DataFrame = {
    import ds.sparkSession.implicits._
    val staged = conf.pipe.scanLeft(ds)((d, s) => runStage(d, s))
    val mapOut = staged(1)
    val reduceOut = staged.last
    val joined = mapOut.select(col("id"), col("fields").as("map_results"))
      .join(reduceOut.select(col("id"), col("fields").as("reduce_results")), "id")
    joined.withColumn(conf.outputCol,
      struct(col("map_results"), col("reduce_results"),
        DocOps.mdRenderCol(col("reduce_results")).as("result")))
      .select(col("id"), col(conf.outputCol))
  }
}

object InstructionsPipeline {

  /** Python-json.dumps(indent=2)-compatible re-render of a compact
    * JSON string (the reference's stringify formatting). */
  private val prettyJson = udf { s: String =>
    if (s == null) null else graft.model.JsonUtil.pretty(graft.model.JsonUtil.parse(s))
  }

  /** Lift a DataFrame into the canonical Dataset[PipeDoc]: every
    * column stringified via the reference's json2str_kv rules
    * (strings as-is, everything else JSON — utils.py:10-17).
    * `pretty = true` matches the reference's indent=2 formatting
    * byte-for-byte (JsonUtil); false keeps `to_json`'s compact form
    * (cheaper; fine when prompts need not be byte-faithful). */
  def toDocs(df: DataFrame, idCol: String, pretty: Boolean = false): Dataset[PipeDoc] = {
    import df.sparkSession.implicits._
    val others = df.schema.fields.filter(_.name != idCol)
    val kvs = others.flatMap { f =>
      val stringified = f.dataType match {
        case org.apache.spark.sql.types.StringType => col(f.name)
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType =>
          if (pretty) prettyJson(to_json(col(f.name))) else to_json(col(f.name))
        case _ => col(f.name).cast("string")
      }
      Seq(lit(f.name), coalesce(stringified, lit("null")))
    }
    df.select(col(idCol).cast("long").as("id"), map(kvs: _*).as("fields"))
      .as[PipeDoc]
  }

  /** Run a JSON pipeline config against a table, reference-style. */
  def runConfig(spark: SparkSession, confJson: String, df: DataFrame,
      idCol: String, llm: LlmClient): DataFrame = {
    val conf = graft.model.Configs.parse(confJson)
    new InstructionsPipeline(conf, llm).runWithReport(toDocs(df, idCol))
  }
}
