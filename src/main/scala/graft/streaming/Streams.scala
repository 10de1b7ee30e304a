package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** Structured Streaming surface (SURVEY §1.4). The reference has no
  * stream engine — its incremental idiom is batch discovery + anti-join
  * re-run. The Spark-native equivalents:
  *  - a file-source stream with `Trigger.AvailableNow` reproduces the
  *    "process whatever has appeared since last run" semantics exactly;
  *  - windowed aggregation + watermark covers the event-style tables.
  *
  * The windowed aggregation is ONE function used by both the batch gate
  * query (DuckDB-oracled) and the streaming query (ScalaTest drives it
  * through a memory sink) — semantics are identical by construction.
  */
object Streams {

  /** Schema of events as read with nanos-as-long (see Tables.t). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window aggregation applied to a (batch or streaming)
    * events DataFrame with a proper `ts` timestamp column. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming read of an events directory (file source — picks up new
    * files per trigger, the Spark-native version of the reference's
    * glob + anti-join rescan). `dir` must be a DIRECTORY (the file
    * source watches it for new files); tests stage parquet files into
    * a temp dir to simulate arrival. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked streaming hourly aggregation (update/append-capable). */
  def streamingHourlyAgg(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(eventStream(spark, dir).withWatermark("ts", "2 hours"))

  // ---- gate query (batch semantics of the same code path) ----

  private def stWindowAgg(s: SparkSession, d: String): DataFrame =
    hourlyAgg(t(s, d, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_window_agg" -> stWindowAgg _)

  val oracle: Map[String, String] = Map(
    "st_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, count(*) AS n, round(sum(value),2) AS total_value
         FROM events GROUP BY 1, 2""")
}
