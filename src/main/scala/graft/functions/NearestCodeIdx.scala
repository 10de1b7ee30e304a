package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-codeword code (argmin squared L2, ties → smaller code) of
  * a subvector against a FIXED per-subspace codebook embedded in the
  * expression — PQ encoding as a pure per-row computation.
  *
  * Why native (the NearestCentroidIdx rationale): the codebook at
  * every encode site is a pinned LocalRelation (mSub × kCodes rows by
  * construction), so the assignment needs neither the broadcast join
  * (row × kCodes fan-out) nor the argmin aggregate whose
  * min(struct(d2, code, s_emb)) buffer carried the subvector payload
  * out of the hash-aggregate fast path. One JVM loop per row; the
  * row keeps its own s_emb column, so nothing rides an aggregation
  * buffer at all.
  *
  * Arithmetic contract: d² via the sequential fold of `sqDist`
  * (acc += (x−y)·(x−y), i = 0..n−1); argmin by (d2 asc, code asc)
  * with java.lang.Double.compare (d² is never NaN). */
case class NearestCodeIdx(sub: Expression, sEmb: Expression,
    subs: Seq[Int], codes: Seq[Seq[Int]], cembs: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  require(subs.nonEmpty && subs.length == codes.length &&
    subs.length == cembs.length && codes.forall(_.nonEmpty),
    "nearest_code_idx: empty or ragged codebook")

  override def left: Expression = sub
  override def right: Expression = sEmb

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (sub.dataType, sEmb.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_code_idx needs (int, array<double>), got $other")
    }

  @transient private lazy val subIdx: java.util.HashMap[Int, Int] = {
    val m = new java.util.HashMap[Int, Int]()
    subs.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }
  @transient private lazy val codeA: Array[Array[Int]] =
    codes.map(_.toArray).toArray
  @transient private lazy val cembA: Array[Array[Array[Double]]] =
    cembs.map(_.map(_.toArray).toArray).toArray

  /** The per-row argmin loop — shared verbatim by the interpreted
    * eval and the generated code (codegen reference object), so both
    * paths are the same arithmetic. */
  def compute(s: Int, e: ArrayData): Int = {
    val si = subIdx.get(s)
    val a = e
    val n = a.numElements()
    val cw = cembA(si)
    val cd = codeA(si)
    var best = -1
    var bestD2 = 0.0
    var k = 0
    while (k < cd.length) {
      val c = cw(k)
      require(c.length == n,
        s"nearest_code_idx dimension mismatch: $n vs ${c.length}")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = a.getDouble(i) - c(i)
        acc += d * d
        i += 1
      }
      val cmp =
        if (best < 0) -1 else java.lang.Double.compare(acc, bestD2)
      if (cmp < 0 || (cmp == 0 && cd(k) < cd(best))) {
        best = k
        bestD2 = acc
      }
      k += 1
    }
    cd(best)
  }

  override def nullSafeEval(s: Any, e: Any): Any =
    compute(s.asInstanceOf[Int], e.asInstanceOf[ArrayData])

  /** Whole-stage codegen (r18, the NearestCentroidIdx rationale):
    * this expression runs once per corpus subvector row at every
    * encode site — the CodegenFallback form pushed the whole encode
    * span out of WholeStageCodegen. The generated code calls
    * `compute` on the expression instance via a codegen reference
    * object; the codebook stays a JVM array on the instance. */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCodeIdx", this,
      classOf[NearestCodeIdx].getName)
    nullSafeCodeGen(ctx, ev, (s, e) =>
      s"${ev.value} = $ref.compute($s, $e);")
  }

  override def nullable: Boolean = sub.nullable || sEmb.nullable

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): NearestCodeIdx = copy(sub = l, sEmb = r)
}
