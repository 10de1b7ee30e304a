package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Per-gate Spark JOB counter — evidence for loop-barrier claims
  * (each convergence/materialization action is at least one job; the
  * event-log "job count roughly halved" criterion made checkable
  * without shipping event logs). Runs each named gate once WARM
  * (after an untimed warmup execution) and prints
  * `jobs <gate> <count>`. Usage: graft.JobCount <sfDir> <gates,csv>
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.JobCount <sfDir> <gates>")
    val Array(sfDir, gatesCsv) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    gatesCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { g =>
      def run(): Unit = SparkEntry.queries(g)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      run() // warmup: plans/codegen compiled outside the counted run
      // listener events are asynchronous — drain before snapshotting
      Thread.sleep(1000) // listener events are async; let them drain
      val before = jobs.get()
      run()
      Thread.sleep(1000) // listener events are async; let them drain
      println(s"jobs $g ${jobs.get() - before}")
    }
    spark.stop()
  }
}
