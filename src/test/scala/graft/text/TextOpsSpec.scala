package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Training-data curation ops: sequence packing and deterministic
  * split assignment. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wordsDoc(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("dedupPassages: duplicated tiles keep only the first " +
    "(doc, tile) occurrence — across docs AND within one doc — and " +
    "docs reassemble in tile order") {
    val docs = Seq(
      (1L, Option("a b c d e f")), // tiles: "a b c", "d e f"
      (2L, Option("a b c d e f")), // exact dup of 1: both tiles cut
      (3L, Option("a b c x y z")), // shares tile 0 with doc 1 only
      (4L, Option("q r s q r s")), // in-doc repeat: 2nd occurrence cut
      (5L, Option("u v")),         // short doc: one partial tile, unique
      (6L, Option.empty[String]),  // null text = empty doc, NOT a cut
      (7L, Option(""))             // empty doc: dups doc 6's "" tile
    ).toDF("doc_id", "text")
    val out = TextOps.dedupPassages(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Int]("n_tiles"),
          r.getAs[Int]("n_cut")))).toMap
    assert(out.size == 7) // fully-cut docs keep their row
    assert(out(1L) == (("a b c d e f", 2, 0)))
    assert(out(2L) == (("", 2, 2)))      // empty text, not a lost row
    assert(out(3L) == (("x y z", 2, 1))) // surviving tiles stay ordered
    assert(out(4L) == (("q r s", 2, 1))) // keep-first applies in-doc too
    assert(out(5L) == (("u v", 1, 0)))   // partial tile, no false cut
    assert(out(6L) == (("", 1, 0)))      // null text: kept, never "cut"
    assert(out(7L) == (("", 1, 1)))      // second "" tile dups doc 6's
  }

  test("packBins: bins fill to capacity by start offset, per partition") {
    // lang a: 60+60+60 tokens at capacity 100 → starts 0,60,120 →
    // bins 0,0,1; lang b packs independently from offset 0
    val docs = Seq(
      (1L, "a", wordsDoc(60)), (2L, "a", wordsDoc(60)),
      (3L, "a", wordsDoc(60)), (4L, "b", wordsDoc(10))
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.packBins(docs, "doc_id", "text", "lang", 100)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_off"), r.getAs[Long]("bin"))).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (60L, 0L))
    assert(out(3L) == (120L, 1L))
    assert(out(4L) == (0L, 0L))
  }

  test("packBins: every doc assigned exactly once, bins contiguous") {
    val docs = (1L to 50L)
      .map(i => (i, "en", wordsDoc(1 + (i % 7).toInt)))
      .toDF("doc_id", "lang", "text")
    val out = TextOps.packBins(docs, "doc_id", "text", "lang", 16)
    assert(out.count() == 50)
    assert(out.select("doc_id").distinct().count() == 50)
    val bins = out.select("bin").distinct()
      .as[Long].collect().sorted
    assert(bins.head == 0L && bins.sameElements(bins.head to bins.last))
  }

  test("splitAssign: deterministic, id-pure, roughly 5/5/90") {
    val docs = (1L to 2000L).toDF("doc_id")
    val a = docs.select(col("doc_id"),
      TextOps.splitAssign(col("doc_id")).as("split"))
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // '0d'/256 ≈ 5.1%, '1a'/256 ≈ 10.2% cumulative
    assert(counts("test") > 50 && counts("test") < 160)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("train") > 1700)
    // pure function of id: same assignment on a re-derived frame with
    // different partitioning
    val b = docs.repartition(7).select(col("doc_id"),
      TextOps.splitAssign(col("doc_id")).as("split"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("splitAssign: salt changes membership") {
    val docs = (1L to 500L).toDF("doc_id")
    val a = docs.select(col("doc_id"),
      TextOps.splitAssign(col("doc_id")).as("s1"),
      TextOps.splitAssign(col("doc_id"), "other:").as("s2"))
    assert(a.filter(col("s1") =!= col("s2")).count() > 0)
  }

  test("repetitionSignals: hand values and bounds") {
    val docs = Seq(
      (1L, "spam spam spam spam"),       // one bigram repeated
      (2L, "all words here are unique"), // no repetition
      (3L, "a b a b a b")                // alternating phrase
    ).toDF("doc_id", "text")
    val out = docs.select(
        col("doc_id") +: TextOps.repetitionSignals(col("text")): _*)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (0.75, 1.0))   // 1 distinct of 4; top bigram 3/3
    assert(out(2L) == (0.0, 0.25))   // 5 distinct; 4 distinct bigrams
    assert(out(3L) == (0.6667, 0.6)) // 2 of 6 distinct; "a b" 3 of 5
  }

  test("piiScrub: redacts email/phone/ip with counts; cascade handles " +
    "adjacent classes") {
    val docs = Seq(
      (1L, "write a@b.io or c.d+x@e.org call 555-123-4567"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "nothing here 1.2 and 3.4.5"),
      (4L, "blast 1.2.3.4-555-123-4567 end")
    ).toDF("doc_id", "text")
    val out = docs.select(
        col("doc_id") +: TextOps.piiCounts(col("text")) :+
          TextOps.piiScrub(col("text")).as("scrubbed"): _*)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)), r.getString(4))).toMap
    assert(out(1L) ==
      ((2, 1, 0), "write <EMAIL> or <EMAIL> call <PHONE>"))
    assert(out(2L) == ((0, 0, 2), "server <IP> and <IP> up"))
    assert(out(3L) == ((0, 0, 0), "nothing here 1.2 and 3.4.5"))
    assert(out(4L) == ((0, 1, 1), "blast <IP>-<PHONE> end"))
  }

  test("corpusDupNgramFrac: planted duplicate span; zero-gram docs " +
    "keep a row with null fraction") {
    val docs = Seq(
      (1L, "a b c d e f"), // shares "a b c d e" with doc 2
      (2L, "a b c d e x"),
      (3L, "q r s t u v"), // all grams unique to this doc
      (4L, "too short")    // < 5 tokens → zero grams
    ).toDF("doc_id", "text")
    val out = TextOps.corpusDupNgramFrac(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((2, 1), Some(0.5)))
    assert(out(2L) == ((2, 1), Some(0.5)))
    assert(out(3L) == ((2, 0), Some(0.0)))
    assert(out(4L) == ((0, 0), None))
  }

  test("decontaminate: docs sharing an eval 5-gram are flagged, " +
    "others are not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta eta theta iota kappa omega")
    ).toDF("doc_id", "text")
    val eval = Seq("prefix alpha beta gamma delta epsilon suffix")
    val out = TextOps.decontaminate(docs, "doc_id", "text", eval)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1, true)))
    assert(out(2L) == ((0, false)))
  }

  test("chunkSplit: overlapping windows tile the doc, the last chunk " +
    "reaches the end, short docs yield exactly one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    val out = TextOps.chunkSplit(docs, "doc_id", "text", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getString(3))).toMap
    assert(out((1L, 0)) == ((4, "t1 t2 t3 t4")))
    assert(out((1L, 1)) == ((4, "t4 t5 t6 t7")))
    assert(out((1L, 2)) == ((4, "t7 t8 t9 t10")))
    assert(out((2L, 0)) == ((3, "a b c")))
    assert(out.size == 4)
    intercept[IllegalArgumentException] {
      TextOps.chunkSplit(docs, "doc_id", "text", 4, 5)
    }
  }

  test("bm25TopK: hand-computed scores, zero-hit docs filtered, " +
    "doc_id tie-break, duplicate terms rejected") {
    val docs = Seq(
      (1L, "cat cat dog x"), (2L, "cat x y z"),
      (3L, "x y z w"), (4L, "dog dog dog dog")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text",
      Seq("cat", "dog"), 3, logIdf = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // N=4, every dl=4 → avgdl=4 → denom = tf + k1; df_cat=df_dog=2 →
    // odds idf = 2.5/2.5 = 1. Same op order as the engine:
    def term(tf: Double) =
      1.0 * ((tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * (4.0 / 4.0))))
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L)) // doc3 score 0 → out
    assert(out.toMap == Map(
      1L -> (term(2) + term(1)), 4L -> (term(0) + term(4)),
      2L -> (term(1) + term(0))))
    intercept[IllegalArgumentException] {
      TextOps.bm25TopK(docs, "doc_id", "text", Seq("cat", "cat"), 3)
    }
  }

  test("bm25TopK: log-idf default ranks rarer terms higher at equal tf") {
    // "rare" appears in 1 of 4 docs, "common" in 3 → at tf=1 each,
    // the rare-term doc must outscore a common-term doc
    val docs = Seq(
      (1L, "rare x y z"), (2L, "common x y z"),
      (3L, "common a b c"), (4L, "common p q r")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L))
    assert(out(2L) == out(3L) && out(3L) == out(4L))
  }

  test("shardShuffle: every doc lands once, positions are contiguous " +
    "per shard, and the order is a pure function of the ids") {
    val docs = (1L to 200L).toDF("doc_id")
    val out = TextOps.shardShuffle(docs, "doc_id", 8)
    assert(out.count() == 200)
    assert(out.select("doc_id").distinct().count() == 200)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.forall(r =>
      r.getAs[Int]("lo") == 1 && r.getAs[Long]("n") == r.getAs[Int]("hi")))
    // not the identity order (it actually shuffles)
    val firstShard = out.filter(col("shard") === out.select("shard")
        .head.getInt(0)).orderBy("pos")
      .select("doc_id").as[Long].collect()
    assert(firstShard.sorted.toSeq != firstShard.toSeq)
    // stable under input partitioning
    val again = TextOps.shardShuffle(docs.repartition(7), "doc_id", 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("tokenBudgetMix: admission stops once the budget is crossed") {
    val docs = (1L to 40L)
      .map(i => (i, if (i <= 20) "s1" else "s2", wordsDoc(10)))
      .toDF("doc_id", "source", "text")
    val out = TextOps.tokenBudgetMix(docs, "doc_id", "text", "source",
      _ => lit(35L)) // 10-token docs: admits 4 (cum_before 0,10,20,30)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s1" -> 4L, "s2" -> 4L))
    // admitted set is a pure function of ids — stable under
    // repartitioning, like splitAssign
    val again = TextOps.tokenBudgetMix(docs.repartition(7), "doc_id",
      "text", "source", _ => lit(35L))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("temperatureMix: α=0.5 upweights the tail language's budget " +
    "share above its raw token share; budgets sum to ≤ total") {
    // big: 36 docs × 10 tokens = 360; small: 4 docs × 10 = 40
    val docs = (1L to 40L)
      .map(i => (i, if (i <= 36) "en" else "sw", wordsDoc(10)))
      .toDF("doc_id", "lang", "text")
    val total = 200L
    val out = TextOps.temperatureMix(docs, "doc_id", "text", "lang",
      total)
    val budgets = out.select("lang", "budget").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(budgets.values.sum <= total)
    // raw share of sw = 40/400 = 0.10; √-temperature share =
    // √40/(√360+√40) ≈ 0.25 — the tail must be upweighted
    val swShare = budgets("sw").toDouble / total
    assert(swShare > 0.10 && swShare < 0.5,
      s"sw temperature share $swShare not upweighted above raw 0.10")
    // admission never exceeds the budget by more than one document's
    // overshoot: every admitted doc had cum_before < budget
    assert(out.filter(col("cum_before") >= col("budget")).count() == 0)
    // append-stable / partition-stable like the budget mix
    val again = TextOps.temperatureMix(docs.repartition(7), "doc_id",
      "text", "lang", total)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  // The Sennrich et al. (2016) worked corpus: word frequencies
  // low×5 lower×2 newest×6 widest×3. Every step below is derived by
  // hand — pair counts under the previous merges, argmax with the
  // (cnt DESC, a ASC, b ASC) tie order.
  private def bpeCorpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("id", "word")

  test("bpeLearn: greedy argmax with the fixed tie order, " +
    "hand-derived on the Sennrich corpus") {
    val learned = TextOps.bpeLearn(bpeCorpus, "word", 8)
    assert(learned == Seq(
      ("e", "s", 9L),   // es:9 ties st:9 → left token wins
      ("es", "t", 9L),
      ("l", "o", 7L),   // lo:7 ties ow:7
      ("lo", "w", 7L),
      ("e", "w", 6L),   // 3-way tie ew/ne/w·est at 6
      ("ew", "est", 6L),
      ("n", "ewest", 6L),
      ("d", "est", 3L)))
  }

  test("bpeLearn: minPairCount stops the loop before the cap") {
    // step 7's best pair has cnt 3 — a floor of 4 ends at 7 merges
    val learned = TextOps.bpeLearn(bpeCorpus, "word", 8,
      minPairCount = 4L)
    assert(learned.size == 7 && learned.last == (("n", "ewest", 6L)))
  }

  test("bpeLearn: learned table replays exactly under bpeMerge " +
    "(learn and apply paths cannot drift)") {
    val merges = TextOps.bpeLearn(bpeCorpus, "word", 8)
      .map(m => (m._1, m._2))
    val enc = Seq((1L, "newest"), (2L, "lowest"), (3L, "low"))
      .toDF("id", "w")
      .select(col("id"), TextOps.bpeMerge(col("w"), merges).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(1L) == Seq("newest")) // training word → one piece
    assert(enc(2L) == Seq("low", "est")) // unseen word generalizes
    assert(enc(3L) == Seq("low"))
  }

  test("bigramLmScore: hand-derived add-one probabilities; " +
    "sub-2-token docs score null with 0 bigrams") {
    // corpus: doc 1 = "a b a b", doc 2 = "x".
    // unigrams: a=2 b=2 x=1 -> V=3. bigrams of doc 1: (a,b) (b,a) (a,b)
    // p(a,b) = (2+1)/(2+3) = 0.6 ; p(b,a) = (1+1)/(2+3) = 0.4
    // mean over occurrences = (0.6 + 0.4 + 0.6) / 3 = 0.533333
    val docs = Seq((1L, "a b a b"), (2L, "x")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .map { case (id, n, sc) => id -> (n, sc) }.toMap
    assert(out == Map(1L -> (3L, Some(0.533333)), 2L -> (0L, None)))
  }

  test("pplBuckets: per-language terciles follow (lm_score desc, id) " +
    "order; scoreless docs sink to the tail; every doc keeps one row") {
    // lang a: 6 scored docs + 1 single-token (null score) doc;
    // lang b: 2 docs (ntile(3) on 2 rows -> buckets 1 and 2).
    val docs = Seq(
      (1L, "a", "p p p p p p"),   // maximally repetitive = most fluent
      (2L, "a", "p p p p q r"),
      (3L, "a", "p q r s t u"),
      (4L, "a", "q r s t u v"),
      (5L, "a", "v u t s r q"),
      (6L, "a", "m n o m n o"),
      (7L, "a", "solo"),          // no bigrams -> null score -> tail
      (8L, "b", "p p p"),
      (9L, "b", "z z9")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.pplBuckets(docs, "doc_id", "text", "lang")
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("lang"), r.getAs[Int]("bucket_id"),
        r.getAs[String]("ppl_bucket"),
        Option(r.getAs[Any]("lm_score"))))).toMap
    assert(rows.size == 9)
    // the expected assignment replayed from the score itself: sort each
    // language by (score desc nulls last, id), split into terciles
    val scores = TextOps.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    for (lang <- Seq("a", "b")) {
      val ids = rows.filter(_._2._1 == lang).keys.toSeq
        .sortBy(id => (scores(id).map(-_).getOrElse(Double.MaxValue), id))
      val n = ids.size
      ids.zipWithIndex.foreach { case (id, i) =>
        val expected = (i * 3) / n + 1 // ntile: first buckets get extras
        assert(rows(id)._2 == expected,
          s"doc $id in $lang: got ${rows(id)._2}, want $expected")
      }
    }
    assert(rows(7L)._3 == "tail" && rows(7L)._4.isEmpty)
    assert(rows(1L)._3 == "head")
    assert(rows(8L)._3 == "head" && rows(9L)._3 == "middle")
  }

  test("langConfusion: known predictions land in the right cells and " +
    "n_correct counts exact diagonal hits") {
    val docs = Seq(
      (1L, "en", "the a of and in"),      // -> en: correct
      (2L, "en", "der die und ist ein"),  // -> de: off-diagonal
      (3L, "de", "der die und"),          // -> de: correct
      (4L, "fr", "zzz qqq www")           // no hits -> fallback "de"
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.langConfusion(docs, "doc_id", "text", "lang")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("en", "en") -> ((1L, 1L)),
      ("en", "de") -> ((1L, 0L)),
      ("de", "de") -> ((1L, 1L)),
      ("fr", "de") -> ((1L, 0L))))
  }

  test("corpusReport: hand corpus — dup pair counted on both copies, " +
    "volumes and quality mass exact, blocks isolate") {
    val clean = (1 to 58).map(i => f"word$i%02d").mkString(" ") +
      " the of"
    val docs = Seq(
      (1L, "en", clean),            // passes gopher
      (2L, "en", "the of tiny"),    // fails (short); quality known
      (3L, "en", "the of tiny"),    // exact dup of 2
      (4L, "de", "the of tiny")     // same text, other block: STILL a
                                    // corpus-wide dup (fp is global)
    ).toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
    val out = TextOps.corpusReport(docs, "doc_id", "text",
        Seq("lang", "source"))
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val en = out("en")
    assert(en._3 == 3 && en._7 == 2)       // n_docs, n_exact_dup
    assert(en._6 == 1)                     // only the clean doc keeps
    assert(en._4 == 60 + 3 + 3)            // tokens: 60 + 2×3
    val de = out("de")
    assert(de._3 == 1 && de._7 == 1)       // cross-block dup counted
    // quality mass: "the of tiny" = 3 tok, 2 stop →
    // round(0.03 × (1 − 2/3), 4) = 0.01 each
    val qTiny = 0.01
    assert(math.abs(de._8 - qTiny) < 1e-9)
  }

  test("winnowFingerprints: the MOSS guarantee — a shared run of " +
    "window+k-1 tokens always yields a shared fingerprint hash") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      def junk(n: Int) =
        Seq.fill(n)(s"j${rnd.nextInt(100000)}t$trial").mkString(" ")
      val run = (1 to 6).map(i => s"shared${trial}w$i").mkString(" ")
      val docs = Seq(
        (1L, junk(30) + " " + run + " " + junk(30)),
        (2L, junk(25) + " " + run + " " + junk(35))
      ).toDF("doc_id", "text")
      val fp = TextOps.winnowFingerprints(docs, "doc_id", "text",
          k = 3, window = 4)
        .as[(Long, Int, String)].collect()
      val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
      val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
      assert((h1 & h2).nonEmpty, s"trial $trial: no shared fingerprint")
      // density: winnowing keeps a strict subset of positions
      assert(fp.count(_._1 == 1L) < 30 + 6 + 30 - 2)
    }
  }

  test("winnowFingerprints: boundary sizes — sub-k docs emit nothing, " +
    "a window+k-1-token doc emits exactly one fingerprint") {
    val docs = Seq(
      (1L, "a b"),            // < k tokens
      (2L, "a b c d e f")     // 6 = window+k-1 -> exactly 1 full frame
    ).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text",
        k = 3, window = 4)
      .as[(Long, Int, String)].collect()
    assert(!fp.exists(_._1 == 1L))
    assert(fp.count(_._1 == 2L) == 1)
    assert(fp.forall(f => f._2 >= 1 && f._2 <= 4)) // pos in gram range
  }

  test("ppsSystematicSample: exactly k hits per stratum, heavy items " +
    "drawn with PPS multiplicity, zero-weight items never drawn") {
    // one stratum, T=100, k=4 -> step 25; the 70-token doc must take
    // >=2 selection points WHEREVER the hash order places it
    val docs = Seq(
      (1L, "s", Seq.fill(70)("w").mkString(" ")),
      (2L, "s", Seq.fill(10)("w").mkString(" ")),
      (3L, "s", Seq.fill(10)("w").mkString(" ")),
      (4L, "s", Seq.fill(10)("w").mkString(" "))
    ).toDF("doc_id", "strat", "text")
    val out = TextOps.ppsSystematicSample(docs, "doc_id", "text",
        "strat", k = 4)
      .select("doc_id", "n_hits").as[(Long, Int)].collect().toMap
    assert(out.values.sum == 4)
    assert(out(1L) >= 2, s"heavy doc hits: $out")
  }

  test("ppsSystematicSample: sum of hits == k in every language " +
    "stratum of the corpus") {
    val out = TextOps.ppsSystematicSample(
        graft.Tables.t(spark, graft.TestSpark.sf001, "documents"),
        "doc_id", "text", "lang", k = 25)
      .groupBy("lang").agg(sum("n_hits").as("s"))
      .as[(String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (l, s) => assert(s == 25L, s"lang $l: $s") }
  }

  test("gopherRules: each rule fails on its own engineered doc and " +
    "the clean doc passes the whole battery") {
    // 60 distinct 4-letter-ish words incl. two stopwords: passes all
    val clean = (1 to 58).map(i => f"word$i%02d").mkString(" ") +
      " the of"
    val docs = Seq(
      (1L, clean),
      (2L, "the of just ten tiny words sit right here now"), // r_nwords
      (3L, (1 to 48).map(i => f"w$i%02d").mkString(" ") +
        " the of a b c d e f g h i j"),                      // r_wordlen (many 1-char)
      (4L, (1 to 40).map(i => f"word$i%02d").mkString(" ") +
        " the of " + (1 to 18).map(i => s"$i$i$i").mkString(" ")), // r_alpha
      (5L, (1 to 60).map(i => f"word$i%02d").mkString(" ")), // r_stop
      (6L, "the of " + Seq.fill(58)("again").mkString(" "))  // r_dup
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id") +: TextOps.gopherRules(col("text")): _*)
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    def flags(id: Long) = { val r = out(id)
      (r._3, r._4, r._5, r._6, r._7, r._8) } // (rN,rLen,rAlpha,rStop,rDup,keep)
    assert(flags(1L) == ((1, 1, 1, 1, 1, 1)))
    assert(flags(2L)._1 == 0 && flags(2L)._6 == 0) // too short
    assert(flags(3L)._2 == 0, s"got ${out(3L)}")   // mean word len < 3
    assert(flags(4L)._3 == 0)                      // numeric tokens > 20%
    assert(flags(5L)._4 == 0)                      // no stopwords
    assert(flags(6L)._5 == 0 && flags(6L)._6 == 0) // dup frac > 0.5
  }

  test("CMS token sketch: never undercounts any token, overcounts " +
    "within the collision bound, and merges exactly (halves == whole)") {
    import org.apache.spark.sql.functions._
    val d = graft.TestSpark.sf0001
    val docs = graft.Tables.t(spark, d, "documents")
    val cms = TextOps.cmsTokenSketch(docs, "text")
    val exact = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val total = exact.map(_._2).sum
    val bound = math.max(50.0, 8.0 * total / 2048)
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"CMS undercounted '$t': $est < $n")
      assert(est <= n + bound, s"CMS overcount on '$t': $est vs $n")
    }
    // mergeability: sketches of two disjoint halves merged == the
    // whole-corpus sketch, estimate-for-estimate (counter adds
    // commute — the shard/day union path is exact)
    val lo = docs.filter(col("doc_id") % 2 === 0)
    val hi = docs.filter(col("doc_id") % 2 === 1)
    val merged = TextOps.cmsTokenSketch(lo, "text")
      .mergeInPlace(TextOps.cmsTokenSketch(hi, "text"))
    exact.foreach { case (t, _) =>
      assert(merged.estimateCount(t) == cms.estimateCount(t),
        s"merged sketch diverged on '$t'")
    }
  }

  test("normalizeUrl: every noise shape canonicalizes — case, www, " +
    "default vs non-default port, utm params, fragment, trailing " +
    "slash, root path") {
    val cases = Seq(
      // (raw, url_norm, host, domain)
      ("HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&id=3#frag",
        "https://news.example.com/a/b?id=3",
        "news.example.com", "example.com"),
      ("http://site.org:8080/p", // non-default port KEPT
        "http://site.org:8080/p", "site.org", "site.org"),
      ("http://site.org:80/p", // default port for http stripped
        "http://site.org/p", "site.org", "site.org"),
      ("https://a.b.c.net/x/?utm_a=1&utm_b=2", // all params tracking
        "https://a.b.c.net/x", "a.b.c.net", "c.net"),
      ("https://Host.Com", // no path at all → root
        "https://host.com/", "host.com", "host.com"),
      ("https://h.io/", // root path: trailing slash KEPT (root stays /)
        "https://h.io/", "h.io", "h.io"),
      ("https://h.io/x?id=1&q=2#s", // order of kept params preserved
        "https://h.io/x?id=1&q=2", "h.io", "h.io"))
    val df = cases.zipWithIndex
      .map { case ((raw, _, _, _), i) => (i, raw) }.toDF("i", "url")
    val got = TextOps.normalizeUrl(df, "url").collect()
      .map(r => r.getAs[Int]("i") ->
        (r.getAs[String]("url_norm"), r.getAs[String]("host"),
          r.getAs[String]("domain"))).toMap
    cases.zipWithIndex.foreach { case ((raw, n, h, d), i) =>
      assert(got(i) == ((n, h, d)), s"case $i: $raw")
    }
  }

  test("capPerDomain keeps exactly min(k, |domain|) rows per domain " +
    "in the declared order") {
    val docs = (1L to 60L).map(i => (i, s"dom${i % 3}.com", i * 10))
      .toDF("doc_id", "domain", "sz")
    val out = TextOps.capPerDomain(docs, "domain", 5,
      Seq(col("sz").desc, col("doc_id").asc))
    val byDom = out.collect().groupBy(_.getAs[String]("domain"))
    assert(byDom.keySet.size == 3)
    byDom.foreach { case (dom, rows) =>
      assert(rows.length == 5, s"$dom")
      // kept = the 5 largest sz of that domain
      val keptSz = rows.map(_.getAs[Long]("sz")).sorted.reverse
      val wantSz = (1L to 60L).filter(i => s"dom${i % 3}.com" == dom)
        .map(_ * 10).sorted.reverse.take(5)
      assert(keptSz.toSeq == wantSz, s"$dom kept wrong docs")
    }
  }

  test("vocabTopP: the nucleus is the minimal count-desc prefix " +
    "reaching p, exclusive-prefix admission (first token always in; " +
    "mass-p boundary token included)") {
    // lang L: counts a=6, b=2, c=1, d=1 (total 10). p=0.7 ⇒ keep while
    // cum_before*10 < total*7: a (0<70), b (60<70); c has cum_before 80.
    val docs = Seq(
      ("L", ("a " * 6 + "b " * 2 + "c " + "d ").trim),
      ("M", "z")) // single-token language: its whole mass is z
    .toDF("lang", "text")
    val out = TextOps.vocabTopP(docs, "lang", "text", 7, 10)
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[String]("token"), r.getAs[Long]("cnt"),
        r.getAs[Int]("rnk"))).toSet
    assert(out == Set(("L", "a", 6L, 1), ("L", "b", 2L, 2),
      ("M", "z", 1L, 1)))
  }

  test("WinnowFps native expression == the relational winnowing " +
    "formulation (r17 rewrite: identical (doc, pos, hash) selections " +
    "on the real corpus and on edge-shaped fixtures)") {
    val real = graft.Tables.t(spark, TestSpark.sf001, "documents")
    val edge = Seq(
      (1L, "a b c"),                 // exactly k tokens, sub-window
      (2L, "x x x x x x x x"),       // all-equal grams (tie breaking)
      (3L, ""),                      // empty
      (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, edge); (k, w) <- Seq((3, 4), (2, 3))) {
      val a = TextOps.winnowFingerprints(docs, "doc_id", "text", k, w)
        .collect().map(_.toSeq).toSet
      val b = TextOps.winnowFingerprintsRelational(
          docs, "doc_id", "text", k, w)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"winnow divergence at k=$k window=$w")
    }
  }
}
