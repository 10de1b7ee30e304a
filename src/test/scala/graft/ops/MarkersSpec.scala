package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** F13 golden: marker RPKM math + clade rollup, hand-computed. */
class MarkersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("marker rpm/rpkm and clade rollup match hand values") {
    val idx = Seq(
      ("m1", 1000L, 500L),
      ("m2", 2000L, 1000L),
      ("m3", 500L, 0L)
    ).toDF("seqnames", "seqlength", "mapped")
    val totals = Seq(("s1", 1000000L)).toDF("sample", "total_reads")
    val groups = Seq(
      ("m1", "gA", "cladeX"), ("m2", "gA", "cladeX"),
      ("m3", "gB", "cladeY")
    ).toDF("seqnames", "genome", "clade")

    val m = Markers.markerMetrics(idx, totals, "s1")
    val byMarker = m.collect().map(r => r.getAs[String]("seqnames") ->
      (r.getAs[Double]("rpm"), r.getAs[Double]("rpkm"))).toMap
    // m1: rpm = 500/1e6*1e6 = 500; rpkm = 500/1000*1000 = 500
    assert(byMarker("m1") == ((500.0, 500.0)))
    // m2: rpm = 1000; rpkm = 1000/2000*1000 = 500
    assert(byMarker("m2") == ((1000.0, 500.0)))
    assert(byMarker("m3") == ((0.0, 0.0)))

    val clades = Markers.cladeRollup(m, groups).collect()
      .map(r => r.getAs[String]("clade") ->
        (r.getAs[Double]("clade_rpkm"), r.getAs[Long]("clade_mapped")))
      .toMap
    assert(clades("cladeX") == ((1000.0, 1500L)))
    assert(clades("cladeY") == ((0.0, 0L)))
  }
}
