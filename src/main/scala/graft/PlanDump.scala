package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Per-gate plan-dump main for optimization-round evidence: writes
  * `<outDir>/<gate>_<suffix>.txt` with the formatted physical plan of
  * each named gate — the `plans/rNN/<gate>_before.txt` /
  * `..._after.txt` files a round's plan claims are checked against.
  * Usage: graft.PlanDump <sfDir> <outDir> <suffix> <gate1,gate2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: graft.PlanDump <sfDir> <outDir> <suffix> <gates,comma,sep>")
    val Array(sfDir, outDir, suffix, gatesCsv) = args
    // a suffix containing "noaqe" disables AQE for the dump: the
    // formatted explain of an AdaptiveSparkPlan never shows
    // [codegen id : n] annotations, so WholeStageCodegen-span evidence
    // needs a non-adaptive physical plan (codegen collapse is
    // orthogonal to AQE)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled",
        (!suffix.contains("noaqe")).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // a suffix ending in "final" EXECUTES the query first (noop sink)
    // so the dumped plan is AQE's final physical plan — the only form
    // that shows WholeStageCodegen spans and runtime join rewrites
    val exec = suffix.endsWith("final")
    gatesCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { g =>
      val df = SparkEntry.queries(g)(spark, sfDir)
      if (exec) df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.explainString(FormattedMode)
      val p = Paths.get(outDir, s"${g}_$suffix.txt")
      Files.writeString(p, plan)
      println(s"wrote $p")
    }
    spark.stop()
  }
}
