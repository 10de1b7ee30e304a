package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity proofs for the temporal joins: the scalable reformulation
  * must return EXACTLY what the naive quadratic form returns. */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = Tables.t(spark, TestSpark.sf0001, "events")

  test("asofJoin == inequality-join + per-row argmax (naive form)") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))

    val fast = TemporalJoins.asofJoin(purchases, clicks.select(
        col("c_user").as("user_id"), col("c_ts").as("ts"),
        col("click_id")),
      Seq("user_id"), "ts", Seq("click_id"))
      .select("user_id", "purchase_id", "click_id")

    val w = Window.partitionBy("purchase_id")
      .orderBy(col("c_ts").desc, col("click_id").desc)
    val naive = purchases.join(clicks,
        col("user_id") === col("c_user") && col("c_ts") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "purchase_id", "click_id")

    assert(fast.count() == purchases.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin: equal timestamps are visible (>= semantics)") {
    import spark.implicits._
    val right = Seq((1L, 100L, "r1"), (1L, 200L, "r2"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
    val left = Seq((1L, 100L, 10L), (1L, 150L, 11L), (1L, 50L, 12L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
      Seq("tag")).select("lid", "tag").as[(Long, String)]
      .collect().toMap
    assert(out(10L) == "r1") // equal ts: right row visible
    assert(out(11L) == "r1") // latest at-or-before
    assert(out(12L) == null) // before any right row
  }

  test("asofJoin: null-ts / null-key right rows never match (join " +
    "semantics, not window-sort semantics)") {
    import spark.implicits._
    val right = Seq(
        (Some(1L), Some(50L), "bad_ts"), // null ts below
        (None, Some(60L), "bad_key"),
        (Some(1L), Some(200L), "good"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
      .withColumn("ts", when(col("tag") === "bad_ts",
        lit(null).cast("timestamp")).otherwise(col("ts")))
    val left = Seq((1L, 100L, 10L), (1L, 300L, 11L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
      Seq("tag")).select("lid", "tag").as[(Long, String)]
      .collect().toMap
    assert(out(10L) == null) // only null-ts/null-key rows precede it
    assert(out(11L) == "good")
  }

  test("forward asofJoin == inequality-join + per-row argmin") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))

    val fast = TemporalJoins.asofJoin(clicks, purchases.select(
        col("p_user").as("user_id"), col("p_ts").as("ts"),
        col("purchase_id")),
      Seq("user_id"), "ts", Seq("purchase_id"), forward = true)
      .select("user_id", "click_id", "purchase_id")

    val w = Window.partitionBy("click_id")
      .orderBy(col("p_ts").asc, col("purchase_id").asc)
    val naive = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") >= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "click_id", "purchase_id")

    assert(fast.count() == clicks.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin: a right row with NULL payload VALUES still wins " +
    "(no stale carry-forward), and multi-payload columns never stitch " +
    "across rows") {
    import spark.implicits._
    val right = Seq(
        (1L, 100L, Option("x"), Option.empty[String]),
        (1L, 200L, Option.empty[String], Option("y")))
      .toDF("k", "t", "a", "b")
      .select(col("k"), timestamp_micros(col("t")).as("ts"),
        col("a"), col("b"))
    val left = Seq((1L, 300L, 10L), (1L, 150L, 11L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("a", "b"))
      .select("lid", "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // latest right row at ts=200 has a=NULL, b='y' — BOTH columns must
    // come from it (ASOF semantics), not a='x' carried from ts=100
    assert(out(10L) == ((null, "y")))
    assert(out(11L) == (("x", null)))
  }

  // ---- hot-key pre-split path ----

  test("split asofJoin == plain asofJoin on a hot key holding >50% of " +
    "events, both directions, at several range widths") {
    import spark.implicits._
    // one key owns 60% of all rows — the plain window form puts its
    // whole history on one task; the split path must not change the
    // answer while spreading it over span/width tasks
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map { i =>
      val k = if (i % 5 < 3) 1L else 1L + rnd.nextInt(40)
      val t = rnd.nextLong() % (30L * 86400 * 1000000L)
      val side = if (rnd.nextBoolean()) "l" else "r"
      (k, math.abs(t), side, i.toLong)
    }
    val df = rows.toDF("k", "t", "side", "id")
      .select(col("k"), timestamp_micros(col("t")).as("ts"),
        col("side"), col("id"))
    val left = df.filter(col("side") === "l").select(
      col("k"), col("ts"), col("id").as("lid"))
    val right = df.filter(col("side") === "r").select(
      col("k"), col("ts"), col("id").as("rid"))
    for (fwd <- Seq(false, true); width <- Seq(3600L, 86400L, 777L)) {
      val plain = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("rid"), forward = fwd).select("lid", "rid")
      val split = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("rid"), forward = fwd, splitRangeSeconds = Some(width))
        .select("lid", "rid")
      assert(split.count() == left.count())
      assert(split.exceptAll(plain).isEmpty &&
        plain.exceptAll(split).isEmpty,
        s"split (forward=$fwd width=$width) diverges from plain")
    }
  }

  test("split asofJoin: incoming carry crosses empty ranges; range-" +
    "boundary and tie timestamps; null left ts matches nothing") {
    import spark.implicits._
    val us = 1000000L
    // right rows only in bucket 0 (width 10s): left rows in buckets
    // 3 and 7 must reach back across empty buckets; a left row at an
    // exact bucket boundary (t=30s) must see the carry, not null
    val right = Seq((1L, 5L * us, "r5"), (1L, 9L * us, "r9a"),
        (1L, 9L * us, "r9b"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
    val left = Seq(
        (1L, Some(9L * us), 1L),   // tie ts: sees a 9s row
        (1L, Some(30L * us), 2L),  // exact boundary of bucket 3
        (1L, Some(75L * us), 3L),  // bucket 7, far from any right row
        (1L, Some(2L * us), 4L),   // before all right rows
        (1L, Option.empty[Long], 5L)) // null ts
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("tag"), splitRangeSeconds = Some(10L))
      .select("lid", "tag").as[(Long, String)].collect().toMap
    assert(out(1L) == "r9b") // tie-break: max payload, same as plain
    assert(out(2L) == "r9b")
    assert(out(3L) == "r9b")
    assert(out(4L) == null) // t=2s precedes every right row
    assert(out(5L) == null)
    // forward mirror: left in bucket 0 reaches forward to bucket 4
    val fright = Seq((1L, 45L * us, "f45a"), (1L, 45L * us, "f45b"),
        (1L, 48L * us, "f48"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
    val fout = TemporalJoins.asofJoin(left, fright, Seq("k"), "ts",
        Seq("tag"), forward = true, splitRangeSeconds = Some(10L))
      .select("lid", "tag").as[(Long, String)].collect().toMap
    assert(fout(1L) == "f45b") // earliest at-or-after, max payload tie
    assert(fout(3L) == null)   // after all right rows
    assert(fout(5L) == null)
  }

  test("split asofJoin == plain asofJoin when KEYS are null on either " +
    "side (null-keyed right rows are dropped up front, so no carry " +
    "can exist for a null key in either path)") {
    import spark.implicits._
    val us = 1000000L
    val right = Seq(
        (Option(1L), 5L * us, "r5"),
        (Option.empty[Long], 3L * us, "rnull"), // dropped: null key
        (Option(1L), 25L * us, "r25"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
    val left = Seq(
        (Option(1L), 30L * us, 1L),
        (Option.empty[Long], 30L * us, 2L), // null key: matches nothing
        (Option.empty[Long], 4L * us, 3L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("lid"))
    for (fwd <- Seq(false, true)) {
      val plain = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("tag"), forward = fwd).select("lid", "tag")
      val split = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("tag"), forward = fwd, splitRangeSeconds = Some(10L))
        .select("lid", "tag")
      assert(split.exceptAll(plain).isEmpty &&
        plain.exceptAll(split).isEmpty,
        s"null-key split (forward=$fwd) diverges from plain")
      val m = split.as[(Long, String)].collect().toMap
      assert(m(2L) == null && m(3L) == null) // SQL join semantics
    }
  }

  test("split asofJoin: composite keys + multi-column payload match " +
    "the plain path") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val right = (1 to 400).map { i =>
      (rnd.nextInt(3).toLong, if (rnd.nextBoolean()) "x" else "y",
        math.abs(rnd.nextLong() % (5L * 86400 * 1000000L)),
        i.toLong, s"p$i")
    }.toDF("k1", "k2", "t", "rid", "tag")
      .select(col("k1"), col("k2"),
        timestamp_micros(col("t")).as("ts"), col("rid"), col("tag"))
    val left = (1 to 300).map { i =>
      (rnd.nextInt(3).toLong, if (rnd.nextBoolean()) "x" else "y",
        math.abs(rnd.nextLong() % (5L * 86400 * 1000000L)), i.toLong)
    }.toDF("k1", "k2", "t", "lid")
      .select(col("k1"), col("k2"),
        timestamp_micros(col("t")).as("ts"), col("lid"))
    for (fwd <- Seq(false, true)) {
      val plain = TemporalJoins.asofJoin(left, right, Seq("k1", "k2"),
        "ts", Seq("rid", "tag"), forward = fwd)
        .select("lid", "rid", "tag")
      val split = TemporalJoins.asofJoin(left, right, Seq("k1", "k2"),
        "ts", Seq("rid", "tag"), forward = fwd,
        splitRangeSeconds = Some(3600L))
        .select("lid", "rid", "tag")
      assert(split.exceptAll(plain).isEmpty &&
        plain.exceptAll(split).isEmpty,
        s"composite-key split (forward=$fwd) diverges from plain")
    }
  }

  test("split asofJoin plans ONE full-data shuffle, on (key, range)") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("cid"))
    val plan = TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", Seq("cid"), splitRangeSeconds = Some(86400L))
      .queryExecution.executedPlan.toString
    // the big-side window must partition by the range column (the
    // split), and nothing may plan a nested loop
    val rangeExchanges = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        l.contains("__graft_range")).size
    assert(rangeExchanges >= 1,
      s"split path lost its (key, range) partitioning:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    // shuffle budget: tails partial-agg (map-side combined), tails
    // window on (key), join sides, main window — anything beyond 5
    // exchanges means the plan grew an unplanned shuffle
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).size
    assert(exchanges <= 5, s"$exchanges exchanges in split plan:\n$plan")
  }

  test("bucketedRangeJoin == naive inequality join, at several widths") {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

    val naive = clicks.join(signups.withColumnRenamed("user_id", "s_user"),
        col("user_id") === col("s_user") &&
          col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("signup_id", "click_id")

    for (width <- Seq(600L, 3600L, 7200L, 100000L)) {
      val fast = TemporalJoins.bucketedRangeJoin(clicks, signups,
        Seq("user_id"), "ts", "start_ts", "end_ts", width)
        .select("signup_id", "click_id")
      assert(fast.exceptAll(naive).isEmpty &&
        naive.exceptAll(fast).isEmpty,
        s"bucket width $width diverges from the naive join")
    }
  }

  test("intervalOverlapJoin == naive inequality join, at several " +
    "widths (multiset parity proves the canonical-bucket emit is " +
    "exactly-once)") {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("s_end"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts").as("e_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("e_end"))
    val naive = signups
      .join(errors.withColumnRenamed("user_id", "e_user"),
        col("user_id") === col("e_user") &&
          col("s_start") <= col("e_end") &&
          col("e_start") <= col("s_end"))
      .select("signup_id", "error_id")
    for (width <- Seq(600L, 3600L, 7200L, 100000L)) {
      val fast = TemporalJoins.intervalOverlapJoin(signups, errors,
        Seq("user_id"), "s_start", "s_end", "e_start", "e_end", width)
        .select("signup_id", "error_id")
      assert(fast.exceptAll(naive).isEmpty &&
        naive.exceptAll(fast).isEmpty,
        s"overlap at bucket width $width diverges from the naive join")
    }
  }

  test("intervalOverlapJoin: touching endpoints overlap (closed " +
    "intervals), disjoint do not, and zero-length intervals work") {
    import spark.implicits._
    def df(rows: Seq[(Long, String, String)], id: String, s: String,
        e: String) =
      rows.toDF("k", "s0", "e0")
        .select(col("k"), monotonically_increasing_id().as(id),
          col("s0").cast("timestamp").as(s),
          col("e0").cast("timestamp").as(e))
    val a = Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      (1L, "2024-01-01 05:00:00", "2024-01-01 05:00:00")) // zero-length
    val b = Seq(
      (1L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"), // touches a1
      (1L, "2024-01-01 03:00:00", "2024-01-01 04:00:00"), // disjoint
      (1L, "2024-01-01 04:30:00", "2024-01-01 05:00:00")) // touches a2
    val out = TemporalJoins.intervalOverlapJoin(
      df(a, "a_id", "a_s", "a_e"), df(b, "b_id", "b_s", "b_e"),
      Seq("k"), "a_s", "a_e", "b_s", "b_e", 600L)
      .select(col("a_s").cast("string"), col("b_s").cast("string"))
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      ("2024-01-01 05:00:00", "2024-01-01 04:30:00")))
  }

  test("resampleFill == naive per-grid-point argmax; grid is exactly " +
    "floor(min/step)..floor(max/step) per key") {
    val obs = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("src_event"))
    val step = 21600L
    val out = TemporalJoins.resampleFill(obs, Seq("user_id"), "ts",
      Seq("src_event"), step)
    // grid shape: per key, one row per step index in [⌊mn/U⌋, ⌊mx/U⌋]
    val shape = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min(unix_micros(col("ts"))).as("gmn"),
        max(unix_micros(col("ts"))).as("gmx"))
    val bounds = obs.groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
    val usec = step * 1000000L
    val bad = shape.join(bounds, "user_id").filter(
      col("n") =!= (expr(s"mx div $usec") - expr(s"mn div $usec") + 1) ||
        col("gmn") =!= expr(s"mn div $usec") * usec ||
        col("gmx") =!= expr(s"mx div $usec") * usec)
    assert(bad.count() == 0, "grid shape wrong for some key")
    // fill parity: every grid row's payload = the argmax obs ≤ grid ts
    val naive = out.select(col("user_id"), col("ts").as("gts"))
      .join(obs.select(col("user_id"), col("ts").as("ots"),
        col("src_event").as("want")),
        Seq("user_id"), "left")
      .filter(col("ots") <= col("gts"))
      .groupBy("user_id", "gts").agg(max(struct(col("ots"),
        col("want"))).as("b"))
      .select(col("user_id"), col("gts").as("ts"),
        col("b.want").as("want"))
    val joined = out.join(naive, Seq("user_id", "ts"), "left")
    assert(joined.filter(
      !(col("src_event") <=> col("want"))).count() == 0,
      "forward fill diverges from the naive argmax")
  }

  test("resampleFill: grid points before the first observation get " +
    "null payload (left-asof), and a single-obs key yields one row") {
    import spark.implicits._
    val obs = Seq(
      (1L, "2024-01-01 00:10:00", 7.0), // mn not step-aligned
      (1L, "2024-01-01 02:30:00", 9.0),
      (2L, "2024-01-05 13:00:00", 4.0)  // single obs
    ).toDF("k", "ts0", "v")
      .select(col("k"), col("ts0").cast("timestamp").as("ts"), col("v"))
    val out = TemporalJoins.resampleFill(obs, Seq("k"), "ts",
      Seq("v"), 3600L)
      .select(col("k"), col("ts").cast("string"), col("v"))
      .as[(Long, String, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, "2024-01-01 00:00:00", None),       // before first obs
      (1L, "2024-01-01 01:00:00", Some(7.0)),
      (1L, "2024-01-01 02:00:00", Some(7.0)),
      (2L, "2024-01-05 13:00:00", Some(4.0))))
  }

  test("intervalOverlapJoin plans an equi-join, not a nested loop") {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("s_end"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("ts").as("e_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("e_end"))
      .withColumnRenamed("u2", "user_id")
    val plan = TemporalJoins.intervalOverlapJoin(signups, errors,
      Seq("user_id"), "s_start", "s_end", "e_start", "e_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"overlap join fell back to a quadratic plan:\n$plan")
  }

  test("bucketedRangeJoin plans an equi-join, not a nested loop") {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val plan = TemporalJoins.bucketedRangeJoin(clicks, signups,
      Seq("user_id"), "ts", "start_ts", "end_ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a quadratic plan:\n$plan")
  }
}
