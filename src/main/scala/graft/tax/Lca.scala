package graft.tax

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Buffer for the LCA aggregation: `seen=false` until the first lineage
  * arrives (so empty groups / all-null input stay distinguishable from a
  * genuine empty common prefix). */
case class LcaBuffer(seen: Boolean, prefix: Seq[String])

/** Lowest-common-ancestor of a set of `;`-delimited lineage paths —
  * the reference's `MakeLCA` (longest common prefix across lineage
  * strings; `NCA` when none, `/root/reference/code/AnnotateContigs.pl:996-1032`).
  *
  * Implemented as a typed `Aggregator` (SURVEY §2.10): the pairwise
  * common-prefix reduction is associative and commutative, so Spark can
  * partial-aggregate it map-side — at 100 TB each partition collapses to
  * one short token list before the shuffle, making the shuffle payload
  * O(groups × depth), independent of row count.
  */
object LcaAggregator extends Aggregator[String, LcaBuffer, String] {

  private def commonPrefix(a: Seq[String], b: Seq[String]): Seq[String] =
    a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

  override def zero: LcaBuffer = LcaBuffer(seen = false, Nil)

  override def reduce(b: LcaBuffer, lineage: String): LcaBuffer = {
    if (lineage == null) return b
    val toks = lineage.split(";", -1).toSeq.map(_.trim).filter(_.nonEmpty)
    if (!b.seen) LcaBuffer(seen = true, toks)
    else LcaBuffer(seen = true, commonPrefix(b.prefix, toks))
  }

  override def merge(a: LcaBuffer, b: LcaBuffer): LcaBuffer =
    if (!a.seen) b
    else if (!b.seen) a
    else LcaBuffer(seen = true, commonPrefix(a.prefix, b.prefix))

  /** Reference semantics: no common prefix at all → literal "NCA"
    * ("no common ancestor", `AnnotateContigs.pl:1024-1030`). */
  override def finish(r: LcaBuffer): String =
    if (!r.seen) null
    else if (r.prefix.isEmpty) "NCA"
    else r.prefix.mkString(";")

  override def bufferEncoder: Encoder[LcaBuffer] = Encoders.product[LcaBuffer]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object Lca {
  /** Column-level handle: `df.groupBy(...).agg(Lca.lca(col("lineage")))`. */
  def lca(c: Column): Column = udaf(LcaAggregator, Encoders.STRING).apply(c)

  /** SQL registration: `SELECT lca(lineage) FROM ... GROUP BY ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("lca", udaf(LcaAggregator, Encoders.STRING))
}
