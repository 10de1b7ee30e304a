package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The four coexisting top-hit tie behaviors (SURVEY §7.4 risk 2):
  * W2 arbitrary-single (with_ties=FALSE), W3 keep-ties-then-cascade,
  * W4 discard-on-tie, W5 margin-keep. Hand-built rows with engineered
  * ties; expected outputs hand-computed. */
class TieSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (group, item, score): g1 has a tie at top; g2 a unique top.
  private lazy val hits = Seq(
    ("g1", "a", 10.0), ("g1", "b", 10.0), ("g1", "c", 9.5),
    ("g2", "d", 8.0), ("g2", "e", 5.0),
    ("g3", "f", 7.0), ("g3", "g", 6.5), ("g3", "h", 6.29)
  ).toDF("grp", "item", "score")

  test("W2 with_ties=FALSE: exactly one winner per group, deterministic") {
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("item").asc)
    val out = hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("grp", "item")
      .as[(String, String)].collect().toSet
    assert(out == Set(("g1", "a"), ("g2", "d"), ("g3", "f")))
  }

  test("W3 rank keeps ties") {
    val w = Window.partitionBy("grp").orderBy(col("score").desc)
    val out = hits.withColumn("r", rank().over(w))
      .filter(col("r") === 1).select("grp", "item")
      .as[(String, String)].collect().toSet
    assert(out ==
      Set(("g1", "a"), ("g1", "b"), ("g2", "d"), ("g3", "f")))
  }

  test("W4 tie-discard drops tied groups entirely " +
    "(hmm_summarize.py:144-149)") {
    val wG = Window.partitionBy("grp")
    val out = hits
      .withColumn("mx", max(col("score")).over(wG))
      .filter(col("score") === col("mx"))
      .groupBy("grp", "mx").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).select("grp")
      .as[String].collect().toSet
    assert(out == Set("g2", "g3")) // g1 discarded: tied top
  }

  test("W5 margin keeps all hits within 10% of top " +
    "(AnnotateContigs.pl:384-396)") {
    val wG = Window.partitionBy("grp")
    val out = hits
      .withColumn("mx", max(col("score")).over(wG))
      .filter(col("score") >= col("mx") * 0.9)
      .select("grp", "item").as[(String, String)].collect().toSet
    // g1: a,b (10.0) and c (9.5 ≥ 9.0); g2: d only (5 < 7.2);
    // g3: f (7.0), g (6.5 ≥ 6.3), h excluded at 6.29 < 6.3
    assert(out == Set(("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "d"), ("g3", "f"), ("g3", "g")))
  }

  test("anvio cascade picks a unique row per gene (postgres.Rmd golden)") {
    // kofam-shaped fixture: gene g with two KOs, sig rescue, thrshld
    // tie-break — every branch of postgres.Rmd:1420-1432.
    val kofam = Seq(
      // gene, ko, thrshld, score, e_value, sig
      ("gA", "K1", 100.0, 120.0, 1e-10, true),  // passes, single KO→keep
      ("gB", "K1", 100.0, 110.0, 1e-9, false),  // two KOs, not sig → drop
      ("gB", "K2", 90.0, 115.0, 1e-9, true),    // sig → rescued, wins
      ("gC", "K1", 100.0, 130.0, 1e-8, true),   // tie on score with K2
      ("gC", "K2", 120.0, 130.0, 1e-8, true)    // higher thrshld wins
    ).toDF("gene", "ko", "thrshld", "score", "e_value", "sig")
    val relaxed = kofam.filter(col("score") > col("thrshld") * 0.5 &&
      col("e_value") < 1e-5)
    val wGK = Window.partitionBy("gene", "ko").orderBy(col("score").desc)
    val wG = Window.partitionBy("gene")
    val wGS = Window.partitionBy("gene").orderBy(col("score").desc)
    val wGT = Window.partitionBy("gene").orderBy(col("thrshld").desc)
    val out = relaxed
      .withColumn("r1", rank().over(wGK)).filter(col("r1") === 1)
      .withColumn("n", count(lit(1)).over(wG))
      .filter(col("n") === 1 || col("sig"))
      .withColumn("r2", rank().over(wGS)).filter(col("r2") === 1)
      .withColumn("rn", row_number().over(wGT)).filter(col("rn") === 1)
      .select("gene", "ko").as[(String, String)].collect().toSet
    assert(out == Set(("gA", "K1"), ("gB", "K2"), ("gC", "K2")))
  }
}
