package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.text.TextOps

/** BPE merge application: hand-derived goldens on the fixture merges,
  * the (rank, leftmost) one-occurrence-at-a-time order pinned with
  * adversarial merge tables, and equivalence against an independent
  * naive reimplementation over real corpus words. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(word: String,
      merges: Seq[(String, String)] = TextOps.bpeMergesFixture)
      : Seq[String] =
    Seq(word).toDF("w")
      .select(TextOps.bpeMerge(col("w"), merges).as("p"))
      .as[Seq[String]].head()

  test("fixture goldens — hand-derived, the known-tokenizer contract " +
    "(each verified by applying the ranked merges on paper)") {
    // "the": (t,h)r0 -> th,e; (th,e)r1 -> the
    assert(enc("the") == Seq("the"))
    // "nation": (o,n)r6 first (beats (a,t)r8, (t,i)r11), then (a,t)
    assert(enc("nation") == Seq("n", "at", "i", "on"))
    // "motion": (o,n)r6; (t,i)r11; (ti,on)r12 — nested merge
    assert(enc("motion") == Seq("m", "o", "tion"))
    // "other": (t,h)r0; (th,e)r1 — "the" assembles mid-word
    assert(enc("other") == Seq("o", "the", "r"))
    // "things": (t,h)r0; (i,n)r2; (in,g)r15
    assert(enc("things") == Seq("th", "ing", "s"))
    // "and": (a,n)r4; (an,d)r5
    assert(enc("and") == Seq("and"))
    // "running": (i,n)r2; (in,g)r15; no pair joins the n's
    assert(enc("running") == Seq("r", "u", "n", "n", "ing"))
    assert(enc("rain") == Seq("r", "a", "in"))
    // single char / no-merge words pass through
    assert(enc("a") == Seq("a"))
    assert(enc("xyz") == Seq("x", "y", "z"))
  }

  test("merge order is (rank, leftmost), one occurrence per step — " +
    "a later-created pair with a better rank preempts remaining " +
    "occurrences of the current pair") {
    // rank0=(ab,a): merging the leftmost (a,b) creates (ab,a), which
    // then outranks the second (a,b) occurrence. Batch-per-pass
    // semantics would yield [ab, ab]; the priority order yields
    // [aba, b] — this pins which algorithm both engines run.
    assert(enc("abab", Seq("ab" -> "a", "a" -> "b")) == Seq("aba", "b"))
    // same merges, opposite ranks: now (a,b) clears both occurrences
    // before (ab,a) ever exists
    assert(enc("abab", Seq("a" -> "b", "ab" -> "a")) == Seq("ab", "ab"))
    // leftmost tie-break on overlapping occurrences
    assert(enc("aaa", Seq("a" -> "a")) == Seq("aa", "a"))
    assert(enc("aaaa", Seq("a" -> "a", "aa" -> "aa")) == Seq("aaaa"))
  }

  /** Independent reimplementation (immutable-list style, deliberately
    * different from BpeEncode's in-place loop). */
  private def naive(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex
      .map { case ((a, b), r) => (a, b) -> r }.toMap
    var toks = word.map(_.toString).toVector
    var continue = true
    while (continue && toks.size > 1) {
      val cands = toks.zip(toks.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (cands.isEmpty) continue = false
      else {
        val (_, i) = cands.min
        toks = (toks.take(i) :+ (toks(i) + toks(i + 1))) ++
          toks.drop(i + 2)
      }
    }
    toks
  }

  test("matches the independent reimplementation over every word of " +
    "the sf0.001 corpus") {
    val words = graft.Tables.t(spark, TestSpark.sf0001, "documents")
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("w"))
      .distinct()
    val got = words
      .select(col("w"), concat_ws(" ", TextOps.bpeMerge(col("w")))
        .as("bpe"))
      .as[(String, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, bpe) =>
      assert(bpe == naive(w, TextOps.bpeMergesFixture).mkString(" "),
        s"mismatch on '$w'")
    }
  }

  test("token-seeded encode from the k-1 fixpoint equals char-seeded " +
    "encode under merges 0..k (the bpeLearn carry-forward contract), " +
    "including the rank-preemption fixtures") {
    val fixtures = Seq(
      ("abab", Seq("ab" -> "a", "a" -> "b")),
      ("abab", Seq("a" -> "b", "ab" -> "a")),
      ("aaa", Seq("a" -> "a")),
      ("aaaa", Seq("a" -> "a", "aa" -> "aa")),
      // a merge-k fusion re-enables an EARLIER-rank pair: (c,d) fuses
      // to "cd", making the rank-0 pair (cd, e) applicable
      ("acde", Seq("cd" -> "e", "c" -> "d")),
      ("lowering", Seq("l" -> "o", "lo" -> "w", "e" -> "r",
        "er" -> "i", "n" -> "g", "eri" -> "ng")))
    fixtures.foreach { case (word, merges) =>
      (0 to merges.size).foreach { k =>
        val charSeeded = Seq(word).toDF("w")
          .select(graft.functions.BpeEncode.of(col("w"),
            merges.take(k)).as("t"))
          .as[Seq[String]].head()
        val prevFix = Seq(word).toDF("w")
          .select(graft.functions.BpeEncode.of(col("w"),
            merges.take(math.max(0, k - 1))).as("t"))
          .as[Seq[String]].head()
        val tokenSeeded = Seq(Tuple1(prevFix)).toDF("t")
          .select(graft.functions.BpeEncode.ofTokens(col("t"),
            merges.take(k)).as("t"))
          .as[Seq[String]].head()
        assert(tokenSeeded == charSeeded,
          s"carry-forward drift on '$word' at k=$k: " +
            s"$tokenSeeded != $charSeeded")
      }
    }
  }

  test("bpeLearn (carried tokenization) equals a from-scratch naive " +
    "greedy trainer on an adversarial vocab") {
    val rows = Seq(
      ("abab", 5L), ("aaa", 4L), ("aaaa", 2L), ("banana", 3L),
      ("lowering", 2L), ("lowest", 2L), ("acde", 1L), ("cdcd", 3L))
    val words = rows.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w) }.toDF("word")
    def naiveLearn(vocab: Seq[(String, Long)], nMerges: Int,
        minPairCount: Long): Seq[(String, String, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var done = false
      while (!done && out.size < nMerges) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        vocab.foreach { case (w, n) =>
          val t = naive(w, out.toSeq.map(m => (m._1, m._2)))
          t.zip(t.tail).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + n
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.minBy {
            case ((a, b), c) => (-c, a, b)
          }
          if (c < minPairCount) done = true
          else out += ((a, b, c))
        }
      }
      out.toSeq
    }
    val got = TextOps.bpeLearn(words, "word", 10)
    val want = naiveLearn(rows, 10, 2L)
    assert(got == want, s"learn drift:\n got=$got\nwant=$want")
    // the small-M recompute path (default threshold) and the O(M)
    // carry-forward path (threshold forced to 0) must learn the SAME
    // merge table — the path split is a constant-factor trade only
    val carried = TextOps.bpeLearn(words, "word", 10,
      minPairCount = 2L, carryForwardThreshold = 0)
    assert(carried == got, "carry-forward path drifted from recompute")
  }

  test("bpeMergeCount: sums pieces across words, 0 for empty/null-ish " +
    "text, and plugs into tokenBudgetMix as its tokenCount") {
    val df = Seq((1L, "the nation!"), (2L, ""), (3L, "42 7"))
      .toDF("doc_id", "text")
    val counts = df
      .select(col("doc_id"), TextOps.bpeMergeCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    // "the"->1 piece, "nation"->4 pieces
    assert(counts == Map(1L -> 5L, 2L -> 0L, 3L -> 0L))

    val mixed = TextOps.tokenBudgetMix(
      df.withColumn("source", lit("s1")), "doc_id", "text", "source",
      _ => lit(4L), TextOps.bpeMergeCount(_))
    // hash order is id-pure; budget 4 admits docs until cum_before >= 4
    val admitted = mixed.select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toMap
    // every admitted doc carries its BPE count
    admitted.foreach { case (id, n) => assert(n == counts(id)) }
    assert(admitted.nonEmpty)
  }
}
