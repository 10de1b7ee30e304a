package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** heavyHitters: the bounded-shuffle exact top-k path (Misra-Gries
  * candidates + exact recount) must equal the full-vocabulary
  * aggregate wherever its guarantee holds — and the gate fixture must
  * keep the guarantee margin that makes the DuckDB oracle valid. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveTopK(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("token").asc)
    docs.select(col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("lang", "rank", "token", "n")
  }

  test("equals the full-vocab aggregate on the corpus fixture") {
    val docs = graft.Tables.t(spark, TestSpark.sf001, "documents")
    val got = TextOps.heavyHitters(docs, "text", k = 15, m = 64)
      .orderBy("lang", "rank").collect().toSeq
    val want = naiveTopK(docs, 15).orderBy("lang", "rank").collect().toSeq
    assert(got == want)
  }

  test("ORACLE PRECONDITION: gate fixture k-th count > N_lang/m " +
      "in every language (m=64, k=15)") {
    val docs = graft.Tables.t(spark, TestSpark.sf001, "documents")
    val counts = docs.select(col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("token").asc)
    val kth = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 15)
      .join(counts.groupBy("lang").agg(sum("n").as("total")), Seq("lang"))
      .select(col("lang"), col("n"), (col("total") / 64.0).as("bound"))
      .collect()
    assert(kth.nonEmpty)
    kth.foreach { r =>
      assert(r.getLong(1) > r.getDouble(2),
        s"lang ${r.getString(0)}: 15th count ${r.getLong(1)} must " +
          s"exceed N/m = ${r.getDouble(2)} or the Misra-Gries " +
          "survival guarantee no longer covers the gate's top-15 — " +
          "re-size m before trusting the oracle compare")
    }
  }

  test("adversarial: decrement-heavy stream (m far below the " +
      "vocabulary) still returns the exact top-k") {
    // 5 heavy tokens (600..1000 occurrences) drowned in 400 singleton
    // tokens; m=16 forces constant Misra-Gries decrements. The heavy
    // counts exceed N/m = 4400/16 = 275, so survival is guaranteed and
    // the recount must reproduce the exact counts.
    val heavy = (0 until 5).flatMap(i =>
      Seq.fill(600 + i * 100)(s"heavy_$i"))
    val noise = (0 until 400).map(i => s"noise_$i")
    val words = new scala.util.Random(7).shuffle((heavy ++ noise).toVector)
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, "en", g.mkString(" ")) }
      .toSeq.toDF("doc_id", "lang", "text").repartition(7)
    val got = TextOps.heavyHitters(docs, "text", k = 5, m = 16)
      .orderBy("rank").collect()
    assert(got.map(_.getString(2)).toSeq ==
      Seq("heavy_4", "heavy_3", "heavy_2", "heavy_1", "heavy_0"))
    assert(got.map(_.getLong(3)).toSeq ==
      Seq(1000L, 900L, 800L, 700L, 600L))
  }

  test("ties break token-ascending, deterministically") {
    val docs = Seq((1L, "en", "b b a a c c"), (2L, "en", "d"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.heavyHitters(docs, "text", k = 3, m = 8)
      .orderBy("rank").collect()
    assert(got.map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq == Seq((1, "a", 2L), (2, "b", 2L), (3, "c", 2L)))
  }
}
