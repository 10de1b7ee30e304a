package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The soak-corpus synthesizer's construction claims, pinned: the
  * salting must preserve within-replica structure EXACTLY (so per-
  * replica work is the sf0.1 problem, 10×) and destroy cross-replica
  * similarity (so pair surfaces scale linearly, not quadratically). */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = TestSpark.sf0001
  private def t(name: String) = graft.Tables.t(spark, d, name)

  test("keys: replica keyspaces are disjoint and FKs stay consistent " +
    "within a replica (no orphaned lineitem at any replica)") {
    val orders = ScaleUp.scaleTable("orders", t("orders"), 3)
    val lineitem = ScaleUp.scaleTable("lineitem", t("lineitem"), 3)
    // disjoint keyspaces: every replica's keys land in its own stride
    val strides = orders.select(
        (col("o_orderkey") / ScaleUp.keyStride).cast("long").as("r"))
      .distinct().as[Long].collect().toSet
    assert(strides == Set(0L, 1L, 2L))
    // FK integrity: the anti-join is empty for every replica
    val orphans = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
    assert(orphans.count() == 0, "salting broke l_orderkey → o_orderkey")
    assert(lineitem.count() == 3 * t("lineitem").count())
  }

  test("dims are not scaled; facts are") {
    assert(ScaleUp.scaleTable("nation", t("nation"), 5).count() ==
      t("nation").count())
    assert(ScaleUp.scaleTable("events", t("events"), 5).count() ==
      5 * t("events").count())
  }

  test("documents: the letter permutation preserves length and WITHIN-" +
    "replica duplicate structure exactly, destroys CROSS-replica " +
    "n-gram similarity; replica 0 is the identity") {
    val base = t("documents")
    val scaled = ScaleUp.scaleTable("documents", base, 2)
    val k = ScaleUp.keyStride
    // replica 0 identity
    val r0 = scaled.filter(col("doc_id") < k)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val orig = base.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(r0 == orig)
    // length preserved per replica pair; text differs for r1
    val joined = scaled.filter(col("doc_id") >= k)
      .select((col("doc_id") - k).as("doc_id"),
        col("text").as("t1"), col("source").as("s1"))
      .join(base.select(col("doc_id"), col("text").as("t0"),
        col("source").as("s0")), Seq("doc_id"))
    assert(joined.filter(length(col("t1")) =!= length(col("t0")))
      .count() == 0, "Caesar changed a byte length")
    assert(joined.filter(col("t1") === col("t0") &&
      col("t0").rlike("[A-Za-z]")).count() == 0,
      "replica 1 text identical to replica 0 on lettered docs")
    assert(joined.filter(col("s1") =!= concat(col("s0"), lit("_r1")))
      .count() == 0, "source not replica-tagged")
    // WITHIN-replica dup structure: exact-dup groups replicate exactly
    // (same rotation applies to every member of a dup pair)
    def dupPairs(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("text").count().filter(col("count") > 1)
        .agg(coalesce(sum((col("count") * (col("count") - 1) / 2)
          .cast("long")), lit(0L))).head.getLong(0)
    val basePairs = dupPairs(base)
    val scaledPairs = dupPairs(scaled)
    assert(scaledPairs == 2 * basePairs,
      s"exact-dup pair surface must scale linearly: " +
        s"$scaledPairs vs 2×$basePairs")
  }

  test("past the old Caesar period: every replica's transform is " +
    "distinct (text r=1 vs r=27; embeddings r=0 vs r=d) — no " +
    "artificial cross-replica duplicate surface at factor > 26") {
    // text: the same doc under replicas 1 and 27 must differ (a
    // Caesar scheme would make them byte-identical)
    assert(ScaleUp.letterPerm(1) != ScaleUp.letterPerm(27))
    assert(ScaleUp.letterPerm(27) != ScaleUp.letterPerm(0))
    val perms = (0 until 100).map(ScaleUp.letterPerm)
    assert(perms.distinct.size == 100, "letter permutations collide")
    // embeddings: at replica r = d the rotation is the identity again;
    // the sign mask must still decorrelate vs replica 0
    val base = t("embeddings")
    val dim = base.select(size(col("embedding"))).head.getInt(0)
    val sameRot = base.select(col("vec_id"),
        col("embedding").as("e0"),
        ScaleUp.rotateDims(col("embedding"), dim).as("ed"))
      .select(graft.sim.Similarity.cosine(col("e0"), col("ed")).as("cos"))
    val avgAbsD = sameRot.agg(avg(abs(col("cos")))).head.getDouble(0)
    assert(avgAbsD < 0.5,
      s"replica d shares the rotation with replica 0 and the sign " +
        s"mask failed to decorrelate: $avgAbsD")
  }

  test("embeddings: dimension rotation preserves norms (same real " +
    "value; double fold order may differ in the last ulp) and " +
    "decorrelates across replicas") {
    val base = t("embeddings")
    val scaled = ScaleUp.scaleTable("embeddings", base, 2)
    val k = ScaleUp.keyStride
    def l2(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, v) => a + v))
    def norms(df: org.apache.spark.sql.DataFrame, shift: Long) =
      df.select((col("vec_id") - shift).as("vec_id"),
        l2(col("embedding")).as("nrm"))
    val j = norms(scaled.filter(col("vec_id") >= k), k)
      .join(norms(base, 0L)
        .withColumnRenamed("nrm", "nrm0"), Seq("vec_id"))
    // the coordinate multiset is identical, so the real norm is; the
    // double fold visits terms in rotated order → tolerance is ulp-
    // scale, far below the engine's round-6 comparison grid
    assert(j.filter(abs(col("nrm") - col("nrm0")) >
      lit(1e-9) * greatest(col("nrm0"), lit(1e-9))).count() == 0,
      "rotation changed a norm beyond fold-order ulp")
    // cross-replica cosine of the same id decorrelates: strictly less
    // than the self-cosine 1.0 for every non-constant vector, and low
    // on average
    val pairs = scaled.filter(col("vec_id") >= k)
      .select((col("vec_id") - k).as("vec_id"),
        col("embedding").as("e1"))
      .join(base.select(col("vec_id"), col("embedding").as("e0")),
        Seq("vec_id"))
      .select(graft.sim.Similarity.cosine(col("e0"), col("e1"))
        .as("cos"))
    val avgAbs = pairs.agg(avg(abs(col("cos")))).head.getDouble(0)
    assert(avgAbs < 0.5, s"cross-replica cosine too high: $avgAbs")
  }

  test("embedding transform distinctness ENUMERATED at the corpus " +
    "dimension: (rotation r mod d, flip mask over d dims) is unique " +
    "for every replica r = 0..99 — and the enumeration has teeth " +
    "(at d=16 it would catch the replica-48 ≡ replica-0 collision)") {
    // pure-Scala mirror of rotateDims' mask: flip rotated dim i iff
    // ((i+1)·m mod 101) < 40 with m = ((r+1)·1000003) mod 101;
    // replica 0 short-circuits to the identity (no rotation, no mask)
    def maskOf(r: Int, d: Int): Seq[Boolean] =
      if (r == 0) Seq.fill(d)(false)
      else {
        val m = ((r.toLong + 1L) * 1000003L) % 101L
        (0 until d).map(i => ((i + 1) * m) % 101L < 40L)
      }
    def transformOf(r: Int, d: Int): (Int, Seq[Boolean]) =
      (if (r == 0) 0 else r % d, maskOf(r, d))
    val dim = t("embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    val ts = (0 until 100).map(transformOf(_, dim))
    assert(ts.distinct.size == 100,
      s"replica transforms collide at corpus dimension $dim — a " +
        "dimension change reintroduced cross-replica cosine-1 twins")
    // negative control: the claim is dimension-DEPENDENT, not
    // universal — at d=16 replica 48 gets rotation 0 with an empty
    // flip mask (identical to replica 0), which this enumeration
    // style catches
    val t16 = (0 until 100).map(transformOf(_, 16))
    assert(t16.distinct.size < 100,
      "expected the d=16 counterexample — the enumeration lost its " +
        "teeth")
  }

  test("replica-0 identity contract: for EVERY table the replica-0 " +
    "slice of a scaled output equals the source rows exactly — the " +
    "contract that keeps absolute-id gate slices (vec_id<10 queries, " +
    "doc_id<40 word slices) byte-comparable across scale factors") {
    val keyCol = Map(
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    graft.Tables.names.foreach { name =>
      val src = t(name)
      val scaled = ScaleUp.scaleTable(name, src, 3)
      val r0 = keyCol.get(name) match {
        case Some(k) => scaled.filter(col(k) < ScaleUp.keyStride)
        case None => scaled // unscaled dims: the whole table
      }
      assert(r0.exceptAll(src).count() == 0 &&
        src.exceptAll(r0).count() == 0,
        s"$name: replica-0 slice is not the identity")
    }
  }
}
