package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed fact: one hot key with 1000 rows, two cold keys
  private lazy val big = (Seq.fill(1000)(("hot", 1.0)) ++
    Seq(("cold1", 2.0), ("cold2", 3.0))).toDF("k", "v")
  private lazy val small = Seq(("hot", 10), ("cold1", 20), ("cold2", 30))
    .toDF("k", "w")

  test("salted join result equals plain join") {
    val plain = big.join(small, Seq("k")).groupBy("k")
      .agg(sum(col("v") * col("w")).as("s"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 4)
      .groupBy("k").agg(sum(col("v") * col("w")).as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salted join preserves row multiplicity") {
    assert(Skew.saltedJoin(big, small, "k", salt = 4).count() ==
      big.join(small, Seq("k")).count())
  }

  test("two-phase salted sum equals plain grouped sum") {
    val plain = big.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedSum(big, "k", "v", salt = 4)
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("outer join types that would duplicate small-side rows are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", salt = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", salt = 4, joinType = "full_outer")
    }
  }

  test("salt actually spreads the hot key (even identical rows)") {
    val saltDist = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(4L)).cast("int"))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(saltDist > 1, "hot key landed on a single salt value")
  }
}
