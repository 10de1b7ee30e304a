package graft.functions

import graft.TestSpark
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stats(tokens: Seq[String], n: Int = 2): (Int, Int) = {
    import spark.implicits._
    val df = Seq(Tuple1(tokens)).toDF("tok")
    val c = GraftColumnBridge.column(
      NgramStats(GraftColumnBridge.expression(col("tok")), n))
    val row = df.select(c.getField("n_grams"), c.getField("top_count"))
      .head()
    (row.getInt(0), row.getInt(1))
  }

  test("counts total and most-frequent bigram") {
    // bigrams: "a b","b a","a b","b c" → top "a b" ×2 of 4
    assert(stats(Seq("a", "b", "a", "b", "c")) == (4, 2))
  }

  test("all-identical tokens → top_count == n_grams") {
    assert(stats(Seq("x", "x", "x", "x")) == (3, 3))
  }

  test("all-distinct tokens → top_count 1") {
    assert(stats(Seq("a", "b", "c", "d")) == (3, 1))
  }

  test("short and empty arrays → (0, 0)") {
    assert(stats(Seq("only")) == (0, 0))
    assert(stats(Seq.empty) == (0, 0))
  }

  test("matches the relational explode formulation on real docs") {
    import graft.text.TextOps
    val docs = graft.Tables.t(spark, TestSpark.sf0001, "documents")
    val tok = TextOps.tokens(col("text"))
    val c = GraftColumnBridge.column(
      NgramStats(GraftColumnBridge.expression(tok), 2))
    val native = docs.select(col("doc_id"),
      c.getField("n_grams").as("n_grams"),
      c.getField("top_count").as("top_count"))

    val grams = docs.select(col("doc_id"), tok.as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("i", "w")))
      .withColumn("nxt", lead("w", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i")))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat(col("w"), lit(" "), col("nxt")).as("gram"))
    val relational = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("int").as("n_grams"),
        max("c").cast("int").as("top_count"))

    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }
}
