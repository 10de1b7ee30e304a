package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5 plan) over the engine's pure
  * kernels — the algebraic laws that make distributed execution legal
  * are exactly the ones scalacheck can attack: partial-aggregation
  * legality for the LCA monoid, histogram invariants for the native
  * n-gram expression, split-assignment totality. Spark-free per case,
  * so hundreds of generated cases run in milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name falsified: ${res.status}")
  }

  // ---- LCA monoid (tax.LcaAggregator) ----

  private val tokenGen = Gen.oneOf("a", "b", "c", "d")
  private val lineageGen: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, tokenGen).map(_.mkString(";")))
  private val bufGen = lineageGen.map(l =>
    tax.LcaAggregator.reduce(tax.LcaAggregator.zero, l))

  test("LCA merge is commutative, associative, and has zero as unit") {
    import tax.LcaAggregator.{merge, zero, finish}
    check("commutativity", Prop.forAll(bufGen, bufGen) { (a, b) =>
      finish(merge(a, b)) == finish(merge(b, a))
    })
    check("associativity", Prop.forAll(bufGen, bufGen, bufGen) {
      (a, b, c) =>
        finish(merge(merge(a, b), c)) == finish(merge(a, merge(b, c)))
    })
    check("unit", Prop.forAll(bufGen) { a =>
      finish(merge(a, zero)) == finish(a) &&
        finish(merge(zero, a)) == finish(a)
    })
  }

  test("LCA is idempotent and order-insensitive over whole groups") {
    import tax.LcaAggregator.{reduce, zero, finish}
    def lcaOf(ls: Seq[String]): String =
      finish(ls.foldLeft(zero)(reduce))
    check("idempotence", Prop.forAll(lineageGen) { l =>
      lcaOf(Seq(l, l, l)) == lcaOf(Seq(l))
    })
    check("permutation invariance",
      Prop.forAll(Gen.listOfN(5, lineageGen), Gen.chooseNum(0L, 999L)) {
        (ls, seed) =>
          val shuffled = new scala.util.Random(seed).shuffle(ls)
          lcaOf(ls) == lcaOf(shuffled)
      })
    check("result is a prefix of every input",
      Prop.forAll(Gen.nonEmptyListOf(lineageGen)) { ls =>
        val out = lcaOf(ls)
        out == "NCA" || ls.forall(l =>
          (l + ";").startsWith(out + ";"))
      })
  }

  // ---- NgramStats (functions.NgramStats histogram invariants) ----

  private def ngramEval(tokens: Seq[String], n: Int): (Int, Int) = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t)).toArray[Any])
    val row = functions.NgramStats(
        org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), n)
      .nullSafeEval(arr)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    (row.getInt(0), row.getInt(1))
  }

  test("NgramStats: histogram totals and bounds hold for any input") {
    val toksGen = Gen.listOf(Gen.oneOf("x", "y", "z"))
    check("total = max(len-n+1, 0); 0 ≤ top ≤ total; top ≥ ⌈total/distinct⌉",
      Prop.forAll(toksGen, Gen.chooseNum(1, 3)) { (toks, n) =>
        val (total, top) = ngramEval(toks, n)
        val expectTotal = math.max(toks.length - n + 1, 0)
        val grams = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        val expectTop =
          if (grams.isEmpty) 0
          else grams.groupBy(identity).values.map(_.size).max
        total == expectTotal && top == expectTop
      })
  }

  // ---- splitAssign totality (every id lands in exactly one split) ----

  test("splitAssign thresholds partition the hex space") {
    // drives the PRODUCTION kernel (text.TextOps.splitOfHexPrefix —
    // the same thresholds the Column expression is built from)
    check("every 2-hex prefix maps to exactly one valid split",
      Prop.forAll(Gen.chooseNum(0, 255)) { b =>
        Set("test", "val", "train")
          .contains(text.TextOps.splitOfHexPrefix(f"$b%02x"))
      })
    check("all three splits are reachable and ordered",
      Prop.forAll(Gen.const(())) { _ =>
        text.TextOps.splitOfHexPrefix("00") == "test" &&
          text.TextOps.splitOfHexPrefix("0d") == "val" &&
          text.TextOps.splitOfHexPrefix("1a") == "train" &&
          text.TextOps.splitTestMax < text.TextOps.splitValMax
      })
  }
}
