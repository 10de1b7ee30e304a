package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Declarative data-quality expectations — the contract a warehouse
  * load asserts before a batch is published (the dbt-tests /
  * Great-Expectations role; the generalization of the reference's
  * hard-coded E-code checks in `ops.Checks`): each rule compiles to
  * an aggregate, the suite returns one row per rule with its exact
  * violation count, and a gate turns "the load is clean" into an
  * oracle-checked table instead of a hope.
  *
  * Scale shape: all ROW-LOCAL rules (not-null / range / accepted
  * values) compile into ONE conditional-aggregation pass over the
  * table — one scan, one partial-agg, no shuffle beyond the final
  * 1-row reduce — then unpivot into rows. Only rules that genuinely
  * need a shuffle get one: `Unique` is a single groupBy on its key,
  * `ForeignKey` a single anti-join (broadcast when the dimension
  * fits, the j5 discipline). A 50-rule suite over a 100 TB table
  * costs one scan + one shuffle per multi-row rule, never one scan
  * per rule.
  */
object Expectations {

  sealed trait Rule { def id: String; def ruleType: String; def target: String }
  /** Column must be non-null. */
  final case class NotNull(id: String, column: String) extends Rule {
    def ruleType = "not_null"; def target = column
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(id: String, column: String, lo: Double,
      hi: Double) extends Rule {
    def ruleType = "range"; def target = column
  }
  /** Non-null values must be one of `values`. */
  final case class AcceptedValues(id: String, column: String,
      values: Seq[String]) extends Rule {
    def ruleType = "accepted_values"; def target = column
  }
  /** Key columns must be unique; violations = surplus rows. */
  final case class Unique(id: String, columns: Seq[String]) extends Rule {
    def ruleType = "unique"; def target = columns.mkString(",")
  }
  /** Non-null values must exist in the dimension column. */
  final case class ForeignKey(id: String, column: String,
      dim: DataFrame, dimColumn: String) extends Rule {
    def ruleType = "foreign_key"; def target = column
  }

  private def rowViolation(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case InRange(_, c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case AcceptedValues(_, c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case other =>
      throw new IllegalArgumentException(s"not a row rule: $other")
  }

  /** Run an expectation suite. One row per rule:
    * (rule_id, rule_type, target, n_violations, pass). */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    require(rules.map(_.id).distinct.size == rules.size,
      "rule ids must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val meta = rules.map(r => (r.id, r.ruleType, r.target))
      .toDF("rule_id", "rule_type", "target")
    val rowRules = rules.filter {
      case _: NotNull | _: InRange | _: AcceptedValues => true
      case _ => false
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      // one conditional-aggregation scan for every row-local rule
      val aggs = rowRules.map(r =>
        sum(when(rowViolation(r), 1L).otherwise(0L)).as(r.id))
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = rowRules
        .map(r => s"'${r.id}', `${r.id}`").mkString(", ")
      parts += one.select(expr(
        s"stack(${rowRules.size}, $stackArgs) AS (rule_id, n_violations)"))
    }
    rules.foreach {
      case Unique(id, cols0) =>
        parts += df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
          .agg(coalesce(sum(col("cnt") - 1), lit(0L))
            .as("n_violations"))
          .select(lit(id).as("rule_id"), col("n_violations"))
      case ForeignKey(id, c, dim, dc) =>
        parts += df.filter(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(id).as("rule_id"), col("n_violations"))
      case _ => ()
    }
    parts.reduce(_.unionByName(_))
      .join(meta, Seq("rule_id"))
      .select(col("rule_id"), col("rule_type"), col("target"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Gate: a six-rule suite over lineitem — four hold (count 0), two
    * genuinely fire (l_discount past 0.08 exists; l_returnflag 'R'
    * exists), so the gate exercises both verdicts, not just green. */
  private def qExpectations(s: SparkSession, d: String): DataFrame =
    evaluate(t(s, d, "lineitem"), Seq(
      NotNull("r1_notnull_shipdate", "l_shipdate"),
      InRange("r2_range_quantity", "l_quantity", 1.0, 50.0),
      InRange("r3_range_discount", "l_discount", 0.0, 0.08),
      AcceptedValues("r4_returnflag_domain", "l_returnflag",
        Seq("A", "N")),
      Unique("r5_unique_line", Seq("l_orderkey", "l_linenumber")),
      ForeignKey("r6_fk_orderkey", "l_orderkey",
        t(s, d, "orders"), "o_orderkey")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expectations" -> qExpectations _)

  val oracle: Map[String, String] = Map(
    "q_expectations" ->
      """WITH v AS (
           SELECT 'r1_notnull_shipdate' AS rule_id, 'not_null' AS rule_type,
             'l_shipdate' AS target,
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations
           FROM lineitem
           UNION ALL
           SELECT 'r2_range_quantity', 'range', 'l_quantity',
             CAST(sum(CASE WHEN l_quantity IS NOT NULL
               AND (l_quantity < 1.0 OR l_quantity > 50.0)
               THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'r3_range_discount', 'range', 'l_discount',
             CAST(sum(CASE WHEN l_discount IS NOT NULL
               AND (l_discount < 0.0 OR l_discount > 0.08)
               THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'r4_returnflag_domain', 'accepted_values', 'l_returnflag',
             CAST(sum(CASE WHEN l_returnflag IS NOT NULL
               AND l_returnflag NOT IN ('A', 'N')
               THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'r5_unique_line', 'unique', 'l_orderkey,l_linenumber',
             CAST(coalesce((SELECT sum(cnt - 1) FROM (
               SELECT count(*) AS cnt FROM lineitem
               GROUP BY l_orderkey, l_linenumber
               HAVING count(*) > 1)), 0) AS BIGINT)
           UNION ALL
           SELECT 'r6_fk_orderkey', 'foreign_key', 'l_orderkey',
             (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)))
         SELECT rule_id, rule_type, target, n_violations,
           n_violations = 0 AS pass
         FROM v""")
}
