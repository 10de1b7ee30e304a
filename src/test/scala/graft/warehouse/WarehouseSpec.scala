package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The bucketed-warehouse claim, verified on the plan: co-bucketed
  * fact tables join with ZERO shuffle exchanges. */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed fact join plans without Exchange") {
    Warehouse.buildFactTables(spark, TestSpark.sf0001, numBuckets = 4)
    // At test scale the orders side is broadcast-small, which would
    // bypass the bucketing path entirely — force the sort-merge plan
    // the join takes at warehouse scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Warehouse.bucketedFactJoin(spark)
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        "10485760")
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // exactly ONE exchange may remain: the final tiny aggregate by
    // o_orderpriority. The join itself must read co-bucketed files.
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1,
      s"bucketed join still shuffles ($exchanges exchanges):\n" +
        plan.take(3000))
    assert(plan.contains("SelectedBucketsCount"),
      s"bucket pruning metadata missing:\n${plan.take(3000)}")
    // and the result matches the plain (shuffling) join
    val plain = {
      import org.apache.spark.sql.functions._
      graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
        .join(graft.Tables.t(spark, TestSpark.sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    }
    assert(joined.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
    spark.sql("DROP TABLE IF EXISTS w_lineitem")
    spark.sql("DROP TABLE IF EXISTS w_orders")
  }

  test("compact collapses a small-file directory, preserving rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/t"
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
    df.repartition(64).write.parquet(dir)
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles() == 64)
    val before = df.collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap

    val n = Warehouse.compact(spark, dir, targetBytes = 512L * 1024)
    assert(n == parquetFiles())
    assert(n < 64, s"compaction left $n files")
    // exact multiset of rows survives the rewrite
    val after = spark.read.parquet(dir).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(after == before)

    // already-compact directory stays at its floor of one file
    assert(Warehouse.compact(spark, dir,
      targetBytes = 1L << 40) == 1)
  }

  test("compactPartitions preserves layout; flat compact refuses it") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_part").toString + "/t"
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .withColumn("sample", col("l_suppkey") % 4)
    // simulate several incremental cycles: multiple small files per
    // sample partition
    (1 to 3).foreach { _ =>
      df.repartition(8).write.mode("append")
        .partitionBy("sample").parquet(dir)
    }
    val hRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = hRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafFiles(p: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/$p"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(leafFiles("sample=0").length > 1)

    // the flattening bug class is now an explicit error
    val e = intercept[IllegalArgumentException] {
      Warehouse.compact(spark, dir)
    }
    assert(e.getMessage.contains("compactPartitions"))

    val before = spark.read.parquet(dir).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    // scope to two partitions: only those are rewritten
    val only = spark.range(2).select(col("id").as("sample"))
    val untouched = leafFiles("sample=3")
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
    val n = Warehouse.compactPartitions(spark, dir, Seq("sample"),
      onlyPartitions = Some(only))
    assert(n == 2, s"expected 2 partitions rewritten, got $n")
    assert(leafFiles("sample=0").length == 1)
    assert(leafFiles("sample=3")
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .toSeq == untouched.toSeq, "untouched partition moved")
    // layout survived: partition column still prunes + types intact
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("sample"))
    assert(back.collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap == before)

    // the ADVICE repro: a later partitioned append must still read
    df.limit(10).write.mode("append").partitionBy("sample").parquet(dir)
    assert(spark.read.parquet(dir).count() == df.count() * 3 + 10)

    // remaining small-file partitions picked up by an unscoped pass
    val n2 = Warehouse.compactPartitions(spark, dir, Seq("sample"))
    assert(n2 >= 2) // sample=1,2 (+ any appended-to partitions)
    // second unscoped pass is a no-op: everything already at its floor
    assert(Warehouse.compactPartitions(spark, dir, Seq("sample")) == 0)
  }

  test("compactPartitions: scoped mode works through a RELATIVE table " +
    "path (listStatus returns qualified paths; the root must be " +
    "qualified before prefix-stripping or the scope never matches)") {
    import org.apache.spark.sql.functions._
    val abs = java.nio.file.Files
      .createTempDirectory("graft_compact_rel").resolve("t")
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .withColumn("sample", col("l_suppkey") % 2)
    (1 to 3).foreach { _ =>
      df.repartition(6).write.mode("append")
        .partitionBy("sample").parquet(abs.toString)
    }
    val cwd = java.nio.file.Paths.get(
      new java.io.File(".").getCanonicalPath)
    val rel = cwd.relativize(abs).toString
    assert(!rel.startsWith("/"))
    val only = spark.range(1).select(col("id").as("sample"))
    val n = Warehouse.compactPartitions(spark, rel, Seq("sample"),
      onlyPartitions = Some(only))
    assert(n == 1, s"scoped compaction through relative path: $n")
    assert(spark.read.parquet(abs.toString).count() == df.count() * 3)
  }

  test("compactPartitions: null partition values compact in scoped " +
    "mode (matched via the Hive default-partition dir name)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_null").toString + "/t"
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .withColumn("sample",
        when(col("l_suppkey") % 3 === 0, lit(null))
          .otherwise(col("l_suppkey") % 3))
    (1 to 3).foreach { _ =>
      df.repartition(6).write.mode("append")
        .partitionBy("sample").parquet(dir)
    }
    val nullDir = new org.apache.hadoop.fs.Path(
      s"$dir/sample=__HIVE_DEFAULT_PARTITION__")
    val fs = nullDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(nullDir), "fixture should have a null partition")
    val before = fs.listStatus(nullDir).count(_.isFile)
    assert(before > 1)
    val only = spark.sql("SELECT CAST(NULL AS bigint) AS sample")
    val n = Warehouse.compactPartitions(spark, dir, Seq("sample"),
      onlyPartitions = Some(only))
    assert(n == 1, "null-keyed partition skipped in scoped mode")
    assert(fs.listStatus(nullDir).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")) == 1)
  }

  test("compactPartitions refuses a leftover non-empty staging dir " +
    "instead of deleting a possibly-displaced partition") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_stale").toString + "/t"
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .withColumn("sample", col("l_suppkey") % 2)
    (1 to 2).foreach { _ =>
      df.repartition(4).write.mode("append")
        .partitionBy("sample").parquet(dir)
    }
    val staging = new org.apache.hadoop.fs.Path(dir + ".compact-staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(staging, "0.old"))
    val e = intercept[IllegalArgumentException] {
      Warehouse.compactPartitions(spark, dir, Seq("sample"))
    }
    assert(e.getMessage.contains("_leaf_map"))
    // the displaced copy is still there — nothing deleted it
    assert(fs.exists(new org.apache.hadoop.fs.Path(staging, "0.old")))
    // recovery: clear staging, compaction proceeds
    fs.delete(staging, true)
    assert(Warehouse.compactPartitions(spark, dir, Seq("sample")) == 2)
  }

  test("compactPartitions auto-restores a partition displaced by a " +
    "crash between the swap renames, using the _leaf_map marker") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_restore").toString + "/t"
    val df = graft.Tables.t(spark, TestSpark.sf0001, "lineitem")
      .withColumn("sample", col("l_suppkey") % 2)
    (1 to 2).foreach { _ =>
      df.repartition(4).write.mode("append")
        .partitionBy("sample").parquet(dir)
    }
    val rows = spark.read.parquet(dir).count()
    val hadoop = spark.sparkContext.hadoopConfiguration
    val staging = new org.apache.hadoop.fs.Path(dir + ".compact-staging")
    val fs = staging.getFileSystem(hadoop)
    val leaf = new org.apache.hadoop.fs.Path(dir + "/sample=0")
    // simulate the crash window: marker written, leaf renamed aside,
    // staged dir never swapped in
    fs.mkdirs(staging)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(staging, "_leaf_map"), false)
    out.write(s"0\t${fs.makeQualified(leaf)}\n".getBytes("UTF-8"))
    out.close()
    assert(fs.rename(leaf, new org.apache.hadoop.fs.Path(staging, "0.old")))
    assert(!fs.exists(leaf))
    // next run: partition restored, then both partitions compact
    assert(Warehouse.compactPartitions(spark, dir, Seq("sample")) == 2)
    assert(!fs.exists(staging))
    assert(spark.read.parquet(dir).count() == rows)

    // crash AFTER the swap (leaf present, aside superseded): staging
    // is dropped, the compacted leaf is untouched
    (1 to 2).foreach { _ =>
      df.filter(col("sample") === 0).drop("sample").repartition(4)
        .write.mode("append").parquet(dir + "/sample=0")
    }
    val rows2 = spark.read.parquet(dir).count()
    fs.mkdirs(staging)
    val out2 = fs.create(
      new org.apache.hadoop.fs.Path(staging, "_leaf_map"), false)
    out2.write(s"0\t${fs.makeQualified(leaf)}\n".getBytes("UTF-8"))
    out2.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(staging, "0.old"))
    assert(Warehouse.compactPartitions(spark, dir, Seq("sample")) >= 1)
    assert(!fs.exists(staging))
    assert(spark.read.parquet(dir).count() == rows2)
  }
}
