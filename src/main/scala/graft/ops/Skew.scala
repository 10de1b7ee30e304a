package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins (SURVEY §4 / the builder's scale
  * checklist). AQE's skew-join handles sort-merge skew at runtime; the
  * salted form remains necessary when the skewed side must HASH-join a
  * medium table that cannot broadcast, or under static planning.
  *
  * Salt is position-based (`monotonically_increasing_id`), which also
  * spreads fully IDENTICAL rows (a content-hash salt would map them to
  * one reducer and not break the skew). It is stable per partition and
  * row order, so a retried task reproduces its own salts — unlike a
  * rand() salt, which breaks retry idempotence.
  */
object Skew {

  private def saltCol(n: Int): Column =
    pmod(monotonically_increasing_id(), lit(n.toLong)).cast("int")

  /** Equi-join `big ⨝ small` on `key`, fanning `small` out `salt`-ways
    * so a hot key's rows spread over `salt` reducers. Exact same result
    * multiset as the plain join FOR THE SUPPORTED JOIN TYPES: inner and
    * big-side-preserving (left/left_semi/left_anti). Right/full outer
    * would emit each unmatched small-side row once per salt copy, so
    * they are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 8, joinType: String = "inner"): DataFrame = {
    val supported =
      Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti")
    require(supported.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-side join types, got $joinType " +
        "(right/full outer would duplicate unmatched small-side rows " +
        "once per salt copy)")
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "an input already has a __salt column — rename it first")
    val salted = big.withColumn("__salt", saltCol(salt))
    val fanned = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(fanned, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Grouped aggregation with two-phase salting: partial aggregate on
    * (key, salt), then final on key. Use when ONE group dominates the
    * data (the degenerate-bucket case); for ordinary data Spark's own
    * partial aggregation already does this. The aggregate must be
    * decomposable (sum/count/min/max). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salt: Int = 8): DataFrame =
    df.withColumn("__salt", saltCol(salt))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
