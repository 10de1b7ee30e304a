package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** W10 gap-based sessionization: hand-derived session splits, the
  * boundary-inclusive gap (gap == threshold stays in-session), and
  * deterministic tie ordering at equal timestamps. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
      .drop("s")

  test("sessionize: hand-derived splits — 30-min gap, boundary " +
    "inclusive, singleton users, equal-ts tie order") {
    val ev = mkEvents(Seq(
      // user 1: 10:00, 10:10 (same), 10:50 (40-min gap -> new),
      // 11:20 (EXACTLY 30 min -> stays), 13:00 (new)
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 10:10:00"),
      (3L, 1L, "2024-01-01 10:50:00"),
      (4L, 1L, "2024-01-01 11:20:00"),
      (5L, 1L, "2024-01-01 13:00:00"),
      // user 2: one event
      (6L, 2L, "2024-01-01 09:00:00"),
      // user 3: two events at the SAME ts -> one session, and the
      // break flag must fire exactly once (tie order by event_id)
      (7L, 3L, "2024-01-01 08:00:00"),
      (8L, 3L, "2024-01-01 08:00:00")
    ))
    val out = Windows.sessionize(ev, "user_id", "ts", "event_id",
        gapUs = 1800000000L)
      .select(col("event_id"), col("session_seq"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      6L -> 1, 7L -> 1, 8L -> 1))
  }

  test("session funnel semantics: per-session stage presence counts " +
    "each session once, however many times the stage repeats") {
    val ev = mkEvents(Seq(
      (1L, 1L, "2024-01-01 10:00:00"), // s1: signup
      (2L, 1L, "2024-01-01 10:05:00"), // s1: view
      (3L, 1L, "2024-01-01 10:06:00"), // s1: view AGAIN (counts once)
      (4L, 1L, "2024-01-01 12:00:00"), // s2: view only
      (5L, 2L, "2024-01-01 09:00:00")  // u2 s1: purchase
    )).withColumn("event_type",
      when(col("event_id") === 1, "signup")
        .when(col("event_id") === 5, "purchase").otherwise("view"))
    val sess = Windows.sessionize(ev, "user_id", "ts", "event_id",
        gapUs = 1800000000L)
      .groupBy("user_id", "session_seq")
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0))
          .as("has_signup"),
        max(when(col("event_type") === "view", 1).otherwise(0))
          .as("has_view"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("has_purchase"))
    val agg = sess.agg(count(lit(1)), sum("has_signup"),
        sum("has_view"), sum("has_purchase"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(agg == ((3L, 1L, 2L, 1L)))
  }

  test("sessionize: session ids are dense per key and every event " +
    "lands in exactly one session on the corpus slice") {
    val ev = graft.Tables.t(spark, graft.TestSpark.sf001, "events")
      .filter(col("user_id") < 50)
    val tagged = Windows.sessionize(ev, "user_id", "ts", "event_id",
      gapUs = 1800000000L)
    assert(tagged.count() == ev.count()) // row-preserving
    val perUser = tagged.groupBy("user_id")
      .agg(max(col("session_seq")).as("mx"),
        countDistinct(col("session_seq")).as("nd"))
      .as[(Long, Int, Long)].collect()
    perUser.foreach { case (u, mx, nd) =>
      assert(mx.toLong == nd, s"user $u: session ids not dense 1..$mx")
    }
    assert(perUser.exists(_._2 > 1)) // the slice genuinely splits
  }
}
