package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Table profiler: null accounting, native-type min/max, exact vs
  * approx distinct paths. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (Some(10L), Some("b")), (Some(2L), None),
    (Some(10L), Some("a")), (None, Some("a"))
  ).toDF("k", "s")

  test("profile: per-column rows/nulls/distincts and typed min/max") {
    val out = Relational.profile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    // min/max computed in the NATIVE type then cast: numeric min is
    // 2, not lexicographic "10"
    assert(out("k") == ((4L, 1L, 2L, "2", "10")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: approx path agrees on small cardinalities and never " +
    "expands the input") {
    val exact = Relational.profile(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Relational.profile(docs, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact == approx) // HLL is exact at tiny cardinality
    // the scale property: the approx plan has no Expand (the exact
    // multi-distinct plan pays one input duplication per column)
    val plan = Relational.profile(docs, exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(2000))
  }
}
