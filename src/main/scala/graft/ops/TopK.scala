package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

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
  * IN is the grouped row (g, v, tie) — `groupByKey(_._1)` has already
  * consumed the key, the aggregator only orders by (v desc, tie asc).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double, Long), TopKBuf, TopKResult] {
  require(k > 0, s"k must be > 0: $k")

  private def ord(e: TopKEntry): (Double, Long) = (-e.v, e.tie)

  private def trim(s: Seq[TopKEntry]): Seq[TopKEntry] =
    s.sortBy(ord).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, row: (Long, Double, Long)): TopKBuf = {
    val e = TopKEntry(row._2, row._3)
    if (b.entries.size >= k) {
      // fast reject: full buffer and e does not beat the current floor
      val f = b.entries.last
      val beats = e.v > f.v || (e.v == f.v && e.tie < f.tie)
      if (!beats) b else TopKBuf(trim(b.entries :+ e))
    } else TopKBuf(trim(b.entries :+ e))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(trim(a.entries ++ b.entries))

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
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (g, res) =>
        res.entries.zipWithIndex.map { case (e, i) =>
          (g, i + 1, e.tie, e.v)
        }
      }
      .toDF("g", "rank", "tie", "v")
  }
}
