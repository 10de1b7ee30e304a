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
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native
      // type for (PARQUET_TYPE_ILLEGAL without the legacy conf). Read the
      // raw int64 nanos and floor-convert to a micros timestamp — the
      // same truncation DuckDB applies when casting ns → its µs TIMESTAMP,
      // so oracle comparisons stay exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
