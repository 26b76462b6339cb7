package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.exec.{InstructionsPipeline, PipeDoc}
import graft.llm.LlmClient
import graft.model.PipelineConf

/** Structured Streaming surface. The reference explicitly cannot
  * stream end-to-end (/root/reference/README.md:96-97) because each
  * reduce depends on the previous stage's complete output — but that
  * limitation is per-DOCUMENT, not per-corpus: every stage here is a
  * pure row-wise transform (`mapPartitions`), so a whole multi-stage
  * pipeline applies to an unbounded stream of documents with no
  * cross-row state at all. What the reference calls "only streaming
  * the last input" becomes, Spark-natively: the full MR chain as a
  * stateless streaming map, plus genuinely stateful analytics
  * (windowed aggregation with watermarks) that the reference has no
  * analog for.
  */
object StreamOps {

  /** Tumbling-window event aggregation with a watermark — the
    * streaming form of Relational.eventsHourly. Late data beyond 2h
    * is dropped; state is bounded by the watermark, which is what
    * lets this run forever at 100 TB/day ingest. */
  def eventsHourlyStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(col("win.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window rates: 15-minute hops over 1-hour windows. */
  def eventsSlidingStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("n_events"))

  /** The instructions-MR pipeline over a document stream: stateless
    * per-row stages compose directly on a streaming Dataset — no
    * foreachBatch needed for the map chain itself. */
  def pipelineStream(docs: Dataset[PipeDoc], conf: PipelineConf,
      llm: LlmClient): Dataset[PipeDoc] =
    new InstructionsPipeline(conf, llm).run(docs)

  /** Batch-equivalent execution of a streaming source via
    * foreachBatch: reuse ANY batch transform (joins against static
    * dims, the full report assembly) per micro-batch. */
  def foreachBatchWriter[T](ds: Dataset[T])(f: (Dataset[T], Long) => Unit): DataStreamWriter[T] =
    ds.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: Dataset[T], id: Long) => f(batch, id))

  /** File-source streaming read of an events directory with the
    * events schema (ns timestamps pre-converted like Tables.events). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.events(spark, dir).schema
    spark.readStream
      .schema(schema)
      .parquet(dir)
  }
}
