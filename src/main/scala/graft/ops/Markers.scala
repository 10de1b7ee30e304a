package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Marker-gene read-mapping summaries (SURVEY §7.1 `ops/Markers`;
  * reference `code/summarize_marker_gene_read_mapping.R:38-64` over
  * BAM idxstats + sample read totals + marker→clade groupings):
  * per-marker RPM/RPKM, then the clade-level rollup.
  *
  * idxstats: (seqnames, seqlength, mapped) — the S13 tool-boundary
  * table; readTotals: (sample, total_reads); groups: (seqnames,
  * genome, clade).
  */
object Markers {

  /** Per-marker metrics for one sample's idxstats:
    * rpm  = mapped / total_reads × 1e6,
    * rpkm = rpm / seqlength × 1e3 (reference lines 48-52). */
  def markerMetrics(idxstats: DataFrame, readTotals: DataFrame,
      sample: String): DataFrame =
    idxstats
      .withColumn("sample", lit(sample))
      .join(broadcast(readTotals), Seq("sample"))
      .withColumn("rpm",
        col("mapped") * lit(1e6) / col("total_reads"))
      .withColumn("rpkm", col("rpm") * lit(1e3) / col("seqlength"))

  /** Clade rollup: summed RPKM per (sample, clade) plus mapped-read
    * totals (reference lines 60-64: group_by(clade) %>%
    * summarize(sum)). */
  def cladeRollup(metrics: DataFrame, groups: DataFrame): DataFrame =
    metrics.join(broadcast(groups), Seq("seqnames"), "left")
      .groupBy("sample", "clade")
      .agg(
        round(sum("rpkm"), 6).as("clade_rpkm"),
        sum("mapped").as("clade_mapped"),
        count(lit(1)).as("n_markers"))
}
