package graft.tax

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** LCA Aggregator: golden cases from the reference semantics
  * (`AnnotateContigs.pl:996-1032`) + algebraic properties that make the
  * map-side partial aggregation legal (seeded random exploration —
  * scalacheck-style without the scalatestplus bridge). */
class LcaSpec extends AnyFunSuite {

  private def reduceAll(lineages: Seq[String]): String = {
    val buf = lineages.foldLeft(LcaAggregator.zero)(LcaAggregator.reduce)
    LcaAggregator.finish(buf)
  }

  test("identical lineages → the lineage itself") {
    assert(reduceAll(Seq("a;b;c", "a;b;c")) == "a;b;c")
  }

  test("common prefix → prefix") {
    assert(reduceAll(Seq("a;b;c", "a;b;d", "a;b;c;e")) == "a;b")
  }

  test("no common prefix → NCA") {
    assert(reduceAll(Seq("a;b", "x;y")) == "NCA")
  }

  test("single lineage → itself; nulls ignored") {
    assert(reduceAll(Seq("k;p;c")) == "k;p;c")
    assert(reduceAll(Seq(null, "k;p;c", null)) == "k;p;c")
    assert(reduceAll(Seq(null, null)) == null)
  }

  private val rng = new scala.util.Random(67) // reference's own test seed
  private def randLineage(): String =
    Seq.fill(1 + rng.nextInt(4))("abc".charAt(rng.nextInt(3)).toString)
      .mkString(";")

  test("merge is commutative and associative (partial-agg legality)") {
    for (_ <- 1 to 500) {
      val Seq(x, y, z) = Seq.fill(3)(
        LcaAggregator.reduce(LcaAggregator.zero, randLineage()))
      val ab = LcaAggregator.merge(LcaAggregator.merge(x, y), z)
      val ba = LcaAggregator.merge(x, LcaAggregator.merge(y, z))
      val comm = LcaAggregator.merge(LcaAggregator.merge(y, x), z)
      assert(LcaAggregator.finish(ab) == LcaAggregator.finish(ba))
      assert(LcaAggregator.finish(ab) == LcaAggregator.finish(comm))
    }
  }

  test("idempotent: lca(x, x) = lca(x)") {
    for (_ <- 1 to 200) {
      val l = randLineage()
      assert(reduceAll(Seq(l, l)) == reduceAll(Seq(l)))
    }
  }

  test("SQL registration works end-to-end") {
    val spark = TestSpark.spark
    Lca.register(spark)
    import spark.implicits._
    val df = Seq(("g1", "a;b;c"), ("g1", "a;b;d"), ("g2", "x;y"))
      .toDF("g", "lineage")
    df.createOrReplaceTempView("lca_in")
    val out = spark.sql(
      "SELECT g, lca(lineage) AS l FROM lca_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("g1", "a;b"), ("g2", "x;y")))
  }
}
