package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scale-path forms of the engine's backbone idioms, each gated by a
  * query whose result is EXACTLY the naive form's (so the DuckDB
  * oracle states the naive semantics and the gate proves the scale
  * path preserves it):
  *
  *  - `j5b_bloom_incremental` — Bloom-prefiltered anti-join
  *    (`ingest.Incremental.newRowsBloom`): the incremental-load filter
  *    when the loaded-key set outgrows a broadcast.
  *  - `j_salted_skew` — `ops.Skew.saltedJoin`: hot-key fan-out join,
  *    result multiset identical to the plain join.
  *  - `g_incr_agg_merge` — incremental aggregate maintenance: merge a
  *    delta batch's partial aggregate into a stored aggregate without
  *    re-scanning history (the materialized-view refresh pattern; at
  *    100 TB the history scan is the cost that must never repeat).
  */
object ScaleOps {

  /** Merge partial grouped aggregates (stored agg + delta batches)
    * into the aggregate the full recompute would produce. Only
    * decomposable metrics merge (sum/count/min/max); derived ratios
    * (avg, rates) must be re-derived AFTER the merge — never averaged.
    * Sums ride DECIMAL so the merge is order-exact: float partials
    * re-summed in a different order would drift off the full-recompute
    * value. */
  def mergeGroupedAgg(parts: Seq[DataFrame], keys: Seq[String],
      sumCols: Seq[String], countCol: String): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    val unioned = parts.reduce(_.unionByName(_))
    val aggs = sumCols.map(c => sum(col(c)).as(c)) :+
      sum(col(countCol)).as(countCol)
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Partial aggregate of one batch in the mergeable shape used by
    * `g_incr_agg_merge` (decimal sums + row count). */
  private def partialAgg(batch: DataFrame): DataFrame =
    batch.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .as("sum_price"),
        count(lit(1)).as("n"))

  /** Gate: history agg (shipdate < 1996) merged with the 1996+ delta
    * == the full recompute the oracle runs. Derived avg re-derived
    * post-merge. */
  private def gIncrAggMerge(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val split = lit("1996-01-01").cast("timestamp")
    val history = partialAgg(li.filter(col("l_shipdate") < split))
    val delta = partialAgg(li.filter(col("l_shipdate") >= split))
    mergeGroupedAgg(Seq(history, delta),
      Seq("l_returnflag", "l_linestatus"),
      Seq("sum_qty", "sum_price"), "n")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_price").cast("double").as("sum_price"),
        col("n"),
        round(col("sum_qty").cast("double") / col("n"), 4)
          .as("avg_qty"))
  }

  /** Gate: Bloom-prefiltered incremental filter — lineitems of orders
    * not yet loaded (loaded = orders placed before 1997). Oracle is
    * the plain NOT EXISTS anti-join semantics. */
  private def j5bBloomIncremental(s: SparkSession,
      d: String): DataFrame = {
    val loaded = t(s, d, "orders")
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey").as("l_orderkey"))
    val fresh = graft.ingest.Incremental.newRowsBloom(
      t(s, d, "lineitem"), loaded, "l_orderkey")
    fresh.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
  }

  /** Gate: salted join == plain join (multiset), proven through an
    * order-insensitive aggregate. */
  private def jSaltedSkew(s: SparkSession, d: String): DataFrame = {
    val big = t(s, d, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_quantity"))
    val small = t(s, d, "part")
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    Skew.saltedJoin(big, small, "partkey", salt = 8, joinType = "inner")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_incr_agg_merge" -> gIncrAggMerge _,
    "j5b_bloom_incremental" -> j5bBloomIncremental _,
    "j_salted_skew" -> jSaltedSkew _)

  val oracle: Map[String, String] = Map(
    "g_incr_agg_merge" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price,
         count(*) AS n,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / count(*), 4) AS avg_qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "j5b_bloom_incremental" ->
      """SELECT l_returnflag, count(*) AS n_lines,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
         FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             AND o.o_orderkey = l.l_orderkey)
         GROUP BY l_returnflag""",
    "j_salted_skew" ->
      """SELECT p_brand, count(*) AS n_lines,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""")
}
