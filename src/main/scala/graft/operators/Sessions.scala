package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization and windowed aggregation over the `events` table —
  * the batch twins of the Structured Streaming operators in
  * graft.streaming (same semantics, verifiable against the DuckDB oracle;
  * the streaming variants are tested for parity against these in ScalaTest).
  *
  * Float discipline: value sums are computed in integer cents
  * (floor(value*100 + 0.5)) because cross-engine double accumulation order
  * is not reproducible; the cent trick keeps sums exact.
  */
object Sessions {

  /** Gap-based sessionization (30-minute inactivity gap). One shuffle on
    * user_id; both windows share the same partitioning. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // microsecond integers (unix_micros ↔ DuckDB epoch_us) — no float time
    // math. Parquet yields TIMESTAMP_NTZ; cast to session-UTC timestamp
    // (value-preserving) because unix_micros requires TIMESTAMP.
    val us = unix_micros(col("ts").cast("timestamp"))
    val prevUs = lag(us, 1).over(byUser)
    val newSession = when(
      us - prevUs > gapMinutes * 60L * 1000000L, 1)
      .otherwise(when(prevUs.isNull, 1).otherwise(0))
    val sess = events
      .withColumn("sess_idx", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id",
        concat(col("user_id").cast("string"), lit("_"), col("sess_idx").cast("string")))
    sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"),
        sum(floor(col("value") * 100 + 0.5)).cast("long").as("value_cents"))
  }

  /** Tumbling 1-hour window aggregation per event_type (the batch shape of
    * a streaming windowed agg with watermark). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).cast("long").as("value_cents"))
}
