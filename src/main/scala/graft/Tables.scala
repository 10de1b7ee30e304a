package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-generated TESTDATA star schema
  * (see /root/repo/TESTDATA.md). The reference warehouse keys everything
  * by sample / secondary entity (reference `code/postgres.Rmd` passim);
  * here the TPC-H-ish star plays that role: `lineitem` is the fact
  * ("read mapping"), `part`/`supplier`/`customer` are dimensions.
  *
  * Scale posture: dimension tables (region/nation/part/supplier) are
  * broadcast-sized at any SF the reference deals with; facts
  * (lineitem/events/documents/embeddings) are the 100 TB-scale tables and
  * every operator that touches them partitions by its natural key.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // the generator has produced events.ts in two physical shapes:
      // parquet TIMESTAMP(NANOS) (no native Spark type — read the raw
      // int64 via the legacy conf and floor ns → µs, the same truncation
      // DuckDB applies casting to its µs TIMESTAMP) and plain µs
      // TIMESTAMP with isAdjustedToUTC=false (Spark TIMESTAMP_NTZ,
      // DuckDB TIMESTAMP — no conversion needed). Normalize both to
      // session-TZ TimestampType (UTC session → instant-identical) so
      // every downstream operator sees one type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame's `ts` to TimestampType across the
    * physical encodings the test generator has emitted (int64 nanos,
    * TIMESTAMP_NTZ µs, native TIMESTAMP). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
