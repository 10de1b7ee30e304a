package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

class WritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_w").toString

  test("K1 tsv roundtrip") {
    val p = s"${tmp()}/t"
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    Writers.writeTsv(df, p, singleFile = true)
    val back = spark.read.option("sep", "\t").option("header", "true")
      .option("inferSchema", "true").csv(p)
    assert(back.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 2)))
  }

  test("K5 materializeUnique enforces the unique-index semantics") {
    val ok = Seq(("g1", 1.0), ("g2", 2.0)).toDF("gene", "score")
    assert(Writers.materializeUnique(ok, s"${tmp()}/mv", Seq("gene")) == 2)
    val dup = Seq(("g1", 1.0), ("g1", 2.0)).toDF("gene", "score")
    intercept[IllegalArgumentException] {
      Writers.materializeUnique(dup, s"${tmp()}/mv2", Seq("gene"))
    }
  }

  test("K7 fasta roundtrip through the fasta reader") {
    val p = s"${tmp()}/f"
    val df = Seq(("c1", "ACGT"), ("c2", "GGCC")).toDF("id", "seq")
    Writers.writeFasta(df, p, singleFile = true)
    val back = Readers.readFasta(spark, p)
    assert(back.select("id", "seq").as[(String, String)].collect().toSet ==
      Set(("c1", "ACGT"), ("c2", "GGCC")))
    assert(back.filter(col("id") === "c2").select("gc_pct")
      .as[Double].head() == 100.0)
  }

  test("K9/P4 partitioned write creates one dir per key") {
    val p = s"${tmp()}/part"
    val df = Seq(("s1", 1), ("s1", 2), ("s2", 3)).toDF("sample", "v")
    Writers.writePartitioned(df, p, Seq("sample"))
    val dirs = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("sample=")).map(_.getName).toSet
    assert(dirs == Set("sample=s1", "sample=s2"))
    // partition pruning: reading one key touches one dir
    assert(spark.read.parquet(p).filter(col("sample") === "s1")
      .count() == 2)
  }

  test("K4 view + K8 json") {
    val df = Seq(("x", 1)).toDF("k", "v")
    Writers.createView(df, "w_test_view")
    assert(spark.sql("SELECT v FROM w_test_view").as[Int].head() == 1)
    val p = s"${tmp()}/j"
    Writers.writeJson(df, p)
    assert(spark.read.json(p).count() == 1)
  }

  test("refreshPartitions rewrites only the delta's partitions") {
    val p = s"${tmp()}/refresh"
    val base = Seq(("s1", 1), ("s1", 2), ("s2", 3), ("s3", 4))
      .toDF("sample", "v")
    Writers.writePartitioned(base, p, Seq("sample"))
    def files(sample: String): Map[String, Long] =
      new java.io.File(s"$p/sample=$sample").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val s2Before = files("s2")
    val s3Before = files("s3")

    // refresh only s1 with new contents
    val delta = Seq(("s1", 10)).toDF("sample", "v")
    Writers.refreshPartitions(delta, p, Seq("sample"))

    // untouched partitions: identical files, same mtimes
    assert(files("s2") == s2Before)
    assert(files("s3") == s3Before)
    // refreshed partition: fully replaced (old rows gone, delta in)
    val back = spark.read.parquet(p)
    assert(back.filter(col("sample") === "s1")
      .select("v").as[Int].collect().toSeq == Seq(10))
    assert(back.count() == 3) // s1 -> 1 row, s2 + s3 untouched
  }

  test("K3b staged overwrite: content swaps, no .staging/.retired " +
    "residue, and a crashed-swap .retired generation is recoverable") {
    val p = s"${tmp()}/staged"
    Writers.overwriteStaged(Seq(("a", 1)).toDF("k", "v"), p)
    Writers.overwriteStaged(Seq(("b", 2)).toDF("k", "v"), p)
    assert(spark.read.parquet(p).as[(String, Int)].collect().toSeq ==
      Seq(("b", 2)))
    assert(!new java.io.File(p + ".staging").exists())
    assert(!new java.io.File(p + ".retired").exists())
    // simulate the crash window between the two renames: the live
    // generation was retired, the promotion never happened
    assert(new java.io.File(p).renameTo(new java.io.File(p + ".retired")))
    assert(Writers.recoverStaged(spark, p))
    assert(spark.read.parquet(p).as[(String, Int)].collect().toSeq ==
      Seq(("b", 2)))
    // idempotent: nothing left to recover
    assert(!Writers.recoverStaged(spark, p))
  }

  test("K3b staged overwrite restores an orphaned .retired-only state " +
    "rather than deleting the last copy") {
    val p = s"${tmp()}/orphan"
    Writers.overwriteStaged(Seq(("old", 1)).toDF("k", "v"), p)
    assert(new java.io.File(p).renameTo(new java.io.File(p + ".retired")))
    // next publish must go through (and the retired copy must not be
    // destroyed before the new generation is safely promoted)
    Writers.overwriteStaged(Seq(("new", 2)).toDF("k", "v"), p)
    assert(spark.read.parquet(p).as[(String, Int)].collect().toSeq ==
      Seq(("new", 2)))
    assert(!new java.io.File(p + ".retired").exists())
  }

  private def cat(files: (String, Long)*) =
    files.toSeq.toDF("file_name", "size_bytes")
      .withColumn("is_parquet", lit(true))

  test("K10 compaction plan: hand-computed bins at target 10") {
    // desc by size: a=12,b=5,c=4,d=3,e=2; running 12,17,21,24,26
    // bin = floor((running-size)/10): a→0, b,c→1, d,e→2
    val plan = Writers.compactionPlan(
      cat(("a", 12L), ("b", 5L), ("c", 4L), ("d", 3L), ("e", 2L)), 10L)
    val m = plan.select("bin", "n_files", "total_bytes", "first_file")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m == Map(0L -> ((1L, 12L, "a")), 1L -> ((2L, 9L, "b")),
      2L -> ((2L, 5L, "d"))))
  }

  test("K10: bin assignment invariant to input partitioning") {
    val files = (1 to 200)
      .map(i => (f"f$i%03d", (i * 37 % 90 + 1).toLong))
    def run(parts: Int) = Writers.compactionPlan(
        cat(files: _*).repartition(parts), 64L)
      .select("bin", "n_files", "total_bytes", "first_file")
      .as[(Long, Long, Long, String)].collect().toSet
    val one = run(1)
    assert(run(7) == one)
    assert(run(32) == one)
    // conservation: every byte and file lands in exactly one bin
    assert(one.toSeq.map(_._3).sum == files.map(_._2).sum)
    assert(one.toSeq.map(_._2).sum == files.size.toLong)
  }

  test("K10: non-parquet files are excluded; empty catalog → empty plan") {
    val mixed = cat(("x", 100L))
      .union(Seq(("y.txt", 999L, false)).toDF(
        "file_name", "size_bytes", "is_parquet"))
    val plan = Writers.compactionPlan(mixed, 10L)
    assert(plan.agg(sum("total_bytes")).as[Long].head() == 100L)
    assert(Writers.compactionPlan(cat(), 10L).count() == 0)
  }
}
