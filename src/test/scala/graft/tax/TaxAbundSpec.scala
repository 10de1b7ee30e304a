package graft.tax

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** F3/F6 golden: the contig-LCA → taxon-abundance pipeline with
  * hand-computed rollup values. */
class TaxAbundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rollup matches hand values; invariant holds") {
    val lca = Seq(
      ("c1", "Bacteria;Proteobacteria;Ecoli"),
      ("c2", "Bacteria;Proteobacteria"),
      ("c3", "Bacteria;Firmicutes;Bacillus"),
      ("c4", "Archaea;Euryarchaeota"),
      ("c5", "Bacteria")
    ).toDF("contig", "lineage")
    val abund = Seq(("c1", 10.0), ("c2", 20.0), ("c3", 5.0),
      ("c4", 2.5), ("c5", 1.0)).toDF("contig", "tpm")

    val out = TaxAbund.taxAbundFromContigs(lca, abund)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // Bacteria subtree: c1+c2+c3+c5 = 36; direct: c5 only = 1
    assert(out("Bacteria") == ((36.0, 1.0)))
    // Proteobacteria: c1+c2 = 30; direct: c2 = 20
    assert(out("Bacteria;Proteobacteria") == ((30.0, 20.0)))
    // leaf: w_subtax == direct
    assert(out("Bacteria;Proteobacteria;Ecoli") == ((10.0, 10.0)))
    assert(out("Bacteria;Firmicutes") == ((5.0, 0.0)))
    assert(out("Archaea") == ((2.5, 0.0)))
    // conservation: root-level w_subtax sums = total tpm
    val roots = out.filterKeys(!_.contains(";"))
    assert(math.abs(roots.values.map(_._1).sum - 38.5) < 1e-9)

    TaxAbund.assertRollup(TaxAbund.taxAbundFromContigs(lca, abund))
  }

  test("contigs without abundance still surface their taxon nodes") {
    val lca = Seq(("c1", "Bacteria;Proteo"), ("c6", "Bacteria;Plancto"))
      .toDF("contig", "lineage")
    val abund = Seq(("c1", 10.0)).toDF("contig", "tpm") // c6 missing
    val nodes = TaxAbund.taxAbundFromContigs(lca, abund)
      .select("node").as[String].collect().toSet
    assert(nodes.contains("Bacteria;Plancto")) // left join keeps it
  }

  test("degenerate flat taxonomy trips the invariant") {
    val lca = Seq(("c1", "A"), ("c2", "B")).toDF("contig", "lineage")
    val abund = Seq(("c1", 1.0), ("c2", 2.0)).toDF("contig", "tpm")
    intercept[IllegalArgumentException] {
      TaxAbund.assertRollup(TaxAbund.taxAbundFromContigs(lca, abund))
    }
  }
}
