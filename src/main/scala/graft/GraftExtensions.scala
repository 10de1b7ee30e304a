package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer — the standard wiring for the
  * engine's native expressions:
  *
  * ```
  * spark.sql.extensions=graft.GraftExtensions
  * ```
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Injected functions: gc_content, dot_product, simhash64,
  * minhash_sig, token_ngrams, ngram_stats. (The LCA Aggregator registers per
  * session via `tax.Lca.register` — UDAFs go through the UDF registry,
  * not the extension function injector.)
  *
  * No planner rules or strategies are injected by design: SURVEY §4's
  * finding is that Catalyst's built-in optimizations cover the
  * reference's entire operator inventory — the engine extends the
  * EXPRESSION layer only, which keeps every plan inspectable and AQE
  * compatible.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "",
      "", "built-in")

  /** Arity guard: a wrong argument count must fail analysis with a
    * clear message — not IndexOutOfBounds (too few) or silently ignored
    * arguments producing plausible wrong results (too many). */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> ""))
    build(exprs)
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("gc_content"),
      info("gc_content", "gc_content(seq) - GC% of a sequence"),
      arity("gc_content", 1)(exprs => functions.GcContent(exprs.head))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - numeric-array dot product"),
      arity("dot_product", 2)(exprs =>
        functions.DotProduct(exprs(0), exprs(1)))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash sketch"),
      arity("simhash64", 1)(exprs => functions.SimHash64(exprs.head))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(norm_text) - 16-permutation MinHash signature"),
      arity("minhash_sig", 1)(exprs =>
        functions.MinHashSig(exprs.head, 16, 5))))
    e.injectFunction((FunctionIdentifier("token_ngrams"),
      info("token_ngrams",
        "token_ngrams(tokens) - distinct token trigrams"),
      arity("token_ngrams", 1)(exprs =>
        functions.TokenNgrams(exprs.head, 3))))
    e.injectFunction((FunctionIdentifier("ngram_stats"),
      info("ngram_stats",
        "ngram_stats(tokens) - (n_grams, top_count) bigram histogram " +
          "stats"),
      arity("ngram_stats", 1)(exprs =>
        functions.NgramStats(exprs.head, 2))))
    e.injectFunction((FunctionIdentifier("theta_sketch"),
      info("theta_sketch",
        "theta_sketch(key) - distinct-set theta sketch aggregate"),
      arity("theta_sketch", 1)(exprs =>
        functions.ThetaSketchAgg(exprs.head,
          functions.ThetaSketch.DefaultLgK))))
    e.injectFunction((FunctionIdentifier("theta_estimate"),
      info("theta_estimate",
        "theta_estimate(sketch) - rounded distinct estimate"),
      arity("theta_estimate", 1)(exprs =>
        functions.ThetaEstimate(exprs.head))))
    e.injectFunction((FunctionIdentifier("theta_union"),
      info("theta_union", "theta_union(a, b) - sketch set union"),
      arity("theta_union", 2)(exprs => functions.ThetaSetOp(
        exprs(0), exprs(1), functions.ThetaSetOp.UnionOp))))
    e.injectFunction((FunctionIdentifier("theta_intersect"),
      info("theta_intersect",
        "theta_intersect(a, b) - sketch set intersection"),
      arity("theta_intersect", 2)(exprs => functions.ThetaSetOp(
        exprs(0), exprs(1), functions.ThetaSetOp.IntersectOp))))
    e.injectFunction((FunctionIdentifier("theta_anotb"),
      info("theta_anotb",
        "theta_anotb(a, b) - sketch set difference (A and not B)"),
      arity("theta_anotb", 2)(exprs => functions.ThetaSetOp(
        exprs(0), exprs(1), functions.ThetaSetOp.AnotbOp))))
  }
}
