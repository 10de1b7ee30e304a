package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's error contract, pinned: soak records have no
  * oracle behind them, so a gate that throws at scale must surface as
  * an ERROR row in the record — never as a plausible-looking
  * time-to-failure number (r11 verdict "What's wrong #1"). */
class BenchSpec extends AnyFunSuite {

  test("timeGate: a thrown gate records the exception class, never a " +
    "duration") {
    val r = Bench.timeGate("boom",
      () => throw new IllegalStateException("forced"))
    assert(r == Left("java.lang.IllegalStateException"))
  }

  test("timeGate: a healthy gate records a non-negative duration") {
    val r = Bench.timeGate("ok", () => ())
    assert(r.isRight && r.toOption.get >= 0.0)
  }

  test("timeGate: a REAL gate pointed at a bogus sf dir is an error " +
    "row, not a number") {
    val spark = TestSpark.spark
    val fn = SparkEntry.queries("a1_grouped_sum")
    val r = Bench.timeGate("a1_grouped_sum", () =>
      fn(spark, "/nonexistent_sf_dir").write
        .format("noop").mode("overwrite").save())
    assert(r.isLeft, "a failed gate must not produce a measurement")
  }

  test("gateJson: an error renders {err:class} (unmistakable for a " +
    "measurement); a measurement renders {s, rel_spread, n}") {
    assert(Bench.gateJson("g", Left("java.lang.RuntimeException")) ==
      "\"g\":{\"err\":\"java.lang.RuntimeException\"}")
    assert(Bench.gateJson("g", Right((1.5, 0.25, 3))) ==
      "\"g\":{\"s\":1.500,\"rel_spread\":0.250,\"n\":3}")
  }
}
