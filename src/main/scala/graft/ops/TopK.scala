package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** One retained entry: value + a unique tiebreak id (deterministic
  * total order: value desc, tie asc). */
case class TopKEntry(v: Double, tie: Long)

/** Bounded aggregation buffer — at most k entries, kept in final
  * order. */
case class TopKBuf(entries: Seq[TopKEntry])

/** Wrapper so the output rides a plain product encoder. */
case class TopKResult(entries: Seq[TopKEntry])

/** Bounded top-k per group as a typed `Aggregator` — the SCALE PATH
  * for "top k rows per key". The window form (`row_number() OVER
  * (PARTITION BY g ORDER BY v DESC)`) must shuffle and SORT every row
  * of every group; this form partial-aggregates map-side, so each
  * partition contributes at most k entries per group and the shuffle
  * payload is O(groups × k), independent of row count — the same
  * discipline as `LcaAggregator`'s bounded prefix buffer. Reduction is
  * associative and commutative; ties break on the unique `tie` id, so
  * the result is deterministic at any partitioning.
  *
  * IN is (v, tie): the group key has already been consumed by
  * `groupByKey` (typed path) or `GROUP BY` (the `TopK.udafTopK` SQL
  * surface); the aggregator only orders by (v desc, tie asc).
  *
  * Ordering is `java.lang.Double.compare` EVERYWHERE (fast-reject,
  * insert, merge) with -0.0 normalized to 0.0 on entry, so the
  * aggregator ranks exactly like the SQL window form it promises to
  * reproduce: Spark SQL's ordering collapses ±0.0 and sorts NaN as the
  * largest value — both of which IEEE `>`/`==` silently disagree with
  * (the r13 ADVICE finding: a mixed ±0.0 buffer could keep a
  * higher-tie +0.0 over a lower-tie -0.0).
  *
  * The buffer is maintained IN ORDER: each accepted row does one O(k)
  * ordered insert and each merge is one O(k) sorted-merge — no
  * sort-per-insert (the r13 verdict's O(k log k) inner-loop note).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKResult] {
  require(k > 0, s"k must be > 0: $k")

  /** Negative iff `a` ranks strictly before `b` (v desc, tie asc).
    * Double.compare gives the SQL total order: NaN largest, and the
    * ±0.0 case never reaches it — entries are normalized on entry. */
  private def cmp(a: TopKEntry, b: TopKEntry): Int = {
    val c = java.lang.Double.compare(b.v, a.v)
    if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
  }

  /** Ordered insert into an already-ordered buffer, truncated at k. */
  private def insert(es: Seq[TopKEntry], e: TopKEntry): Seq[TopKEntry] = {
    val (before, after) = es.span(x => cmp(x, e) < 0)
    ((before :+ e) ++ after).take(k)
  }

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, row: (Double, Long)): TopKBuf = {
    val e = TopKEntry(row._1 + 0.0, row._2) // +0.0 collapses -0.0
    val es = b.entries
    // fast reject: full buffer and e does not beat the current floor
    if (es.size >= k && cmp(e, es.last) > 0) b
    else TopKBuf(insert(es, e))
  }

  /** Sorted-merge of two ordered buffers, truncated at k. */
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val xi = a.entries.iterator.buffered
    val yi = b.entries.iterator.buffered
    val out = scala.collection.mutable.ArrayBuffer.empty[TopKEntry]
    while (out.size < k && (xi.hasNext || yi.hasNext)) {
      if (!yi.hasNext || (xi.hasNext && cmp(xi.head, yi.head) <= 0))
        out += xi.next()
      else out += yi.next()
    }
    TopKBuf(out.toSeq)
  }

  override def finish(r: TopKBuf): TopKResult = TopKResult(r.entries)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKResult] =
    Encoders.product[TopKResult]
}

object TopK {
  /** (group, value, tie) dataset → (group, rank 1..k, tie, value) —
    * the exploded relational result of the bounded aggregation. */
  def topKPerGroup(ds: org.apache.spark.sql.Dataset[(Long, Double, Long)],
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (g, res) =>
        res.entries.zipWithIndex.map { case (e, i) =>
          (g, i + 1, e.tie, e.v)
        }
      }
      .toDF("g", "rank", "tie", "v")
  }

  /** The SQL surface of the bounded aggregation: a `functions.udaf`
    * wrapper taking (value, tie) columns, for `spark.sql` users (the
    * dbplyr-analog entry point — `g_tpm_sql` precedent). Register as
    * e.g. `spark.udf.register("top_k3", TopK.udafTopK(3))`; explode
    * `.entries` for the relational form (gate `w13_topk_sql`). */
  def udafTopK(k: Int): UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.product[(Double, Long)])

  /** Idempotent session registration of the top-k UDAF under
    * `top_k<k>`. */
  def registerSql(spark: SparkSession, k: Int): Unit =
    spark.udf.register(s"top_k$k", udafTopK(k))
}
