package graft.streaming

import graft.operators.Mentions
import graft.sources.SynthTranscripts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming lift of the per-turn extraction path. The batch
  * extraction (SynthTranscripts.project → Mentions.extract) is stateless
  * per-row, so it composes directly onto readStream (SURVEY.md §2.9);
  * aggregation variants get watermark/outputMode treatment.
  *
  * The reference is strictly batch — this is the declared streaming
  * counterpart for ingest-as-it-lands deployments: same operators, same
  * results (asserted by parity tests and the stream_* oracle queries).
  */
object StreamOps {

  /** events parquet as a file-source stream (schema pinned from the batch
    * read — required by readStream). The file source needs a DIRECTORY to
    * watch; production streams land in one, the test fixture is a single
    * file — so it is symlinked into a scratch dir. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val scratch = Files.createTempDirectory("graft-stream")
    Files.createSymbolicLink(
      scratch.resolve("events.parquet"), Paths.get(s"$dir/events.parquet"))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(scratch.toString)
  }

  /** Streaming mention extraction (stateless map — no watermark needed). */
  def mentionStream(spark: SparkSession, dir: String): DataFrame =
    Mentions.extract(SynthTranscripts.project(eventStream(spark, dir)))
      .select("conv_id", "turn_idx", "kind", "midx", "surface")

  /** Streaming tumbling-window aggregation (1h windows on ts, per type),
    * the streaming twin of operators.Sessions.hourlyAgg. */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame =
    SynthTranscriptsFree.hourly(eventStream(spark, dir))

  /** Drain a stream fully into a memory sink and return the batch result.
    * Used by parity tests and the stream_* verification queries. */
  def runToBatch(spark: SparkSession, stream: DataFrame, name: String,
                 mode: String): DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

/** Aggregations shared between batch and streaming shapes. */
private object SynthTranscriptsFree {
  def hourly(events: DataFrame): DataFrame =
    events
      // watermark requires TIMESTAMP (session-UTC); parquet yields NTZ —
      // cast is value-preserving under the fixed UTC session zone, and the
      // window boundary is cast back so batch/stream schemas agree.
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "0 seconds")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).cast("long").as("value_cents"))
      // window.start is TIMESTAMP — matches batch date_trunc, which
      // implicitly promotes the NTZ input to session-UTC TIMESTAMP too.
      .select(col("window.start").as("hour"),
        col("event_type"), col("n"), col("value_cents"))
}
