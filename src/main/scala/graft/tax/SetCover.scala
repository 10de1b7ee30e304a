package graft.tax

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T4: lineage-based greedy set cover (reference
  * `AnnotateContigs.pl:541-554`): sort candidate lineages by
  * (uniq desc, score desc, completeness desc), accept a lineage if it
  * still covers ≥1 unaccounted gene, remove covered genes, repeat.
  *
  * The greedy loop is inherently sequential, but its input is the
  * per-lineage AGGREGATE table (thousands of rows, not the raw
  * gene×hit facts) — so the distributed plan computes the aggregates
  * and the driver runs the loop, then the accepted set broadcasts back
  * as a filter. This is the documented deviation from pure-DataFrame
  * (SURVEY §2.8 T4); it is bounded by lineage count, never by read
  * count.
  *
  * Determinism (SURVEY §7.4 risk 5): the reference's 3-key sort leaves
  * ties unordered; we add the lineage string as the final tie-break.
  */
object SetCover {

  /** One candidate lineage with its aggregate stats and covered set. */
  case class Candidate(lineage: String, uniq: Long, score: Double,
      completeness: Double, genes: Seq[String])

  /** Driver-side greedy loop. Input rows are per-lineage aggregates;
    * returns accepted lineages in acceptance order. */
  def greedy(cands: Seq[Candidate]): Seq[String] = {
    val sorted = cands.sortBy(c =>
      (-c.uniq, -c.score, -c.completeness, c.lineage))
    val covered = scala.collection.mutable.HashSet.empty[String]
    val accepted = scala.collection.mutable.ArrayBuffer.empty[String]
    sorted.foreach { c =>
      if (c.genes.exists(g => !covered.contains(g))) {
        accepted += c.lineage
        covered ++= c.genes
      }
    }
    accepted.toSeq
  }

  /** Distributed wrapper: aggregate gene-hit facts per lineage (the A6
    * stats), collect THE AGGREGATES, run the greedy loop, and return
    * facts filtered to accepted lineages via a broadcast isin. Expects
    * columns (gene, lineage, score, uniq: boolean). */
  def screenLineages(facts: DataFrame): (Seq[String], DataFrame) = {
    val agg = facts.groupBy("lineage").agg(
      sum(when(col("uniq"), 1L).otherwise(0L)).as("uniq"),
      sum("score").as("score"),
      countDistinct("gene").as("n_genes"),
      sort_array(collect_set(col("gene"))).as("genes"))
    val cands = agg.collect().map { r =>
      Candidate(r.getAs[String]("lineage"), r.getAs[Long]("uniq"),
        r.getAs[Double]("score"),
        r.getAs[Long]("n_genes").toDouble,
        r.getAs[scala.collection.Seq[String]]("genes").toSeq)
    }.toSeq
    val accepted = greedy(cands)
    val kept = facts.filter(
      col("lineage").isin(accepted.map(x => x: Any): _*))
    (accepted, kept)
  }
}
