package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of an already-normalized text as a native
  * expression: character k-shingles → murmur3 (seed 42, matching the
  * built-in `hash()`) → n permutation minima, all in one JVM loop per
  * row with no shuffle at all.
  *
  * Bit-identical to the relational `Dedup.minhashSignatures`
  * (posexplode + groupBy-of-mins) — asserted in MinHashSigSpec. The
  * relational form remains the reference formulation when signatures
  * must be built from pre-exploded shingle tables; for per-document
  * signatures this expression removes the explode (rows × length
  * blow-up) and the aggregate shuffle entirely.
  */
case class MinHashSig(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31-1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs STRING, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val len = s.numChars()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // same shingle positions as substr(i, k) for i in 1..max(1, len-k+1)
    val nShingles = math.max(1, len - (k - 1))
    var i = 0
    while (i < nShingles) {
      val sh = s.substringSQL(i + 1, k)
      val h = Murmur3HashFunction.hash(sh, StringType, 42L).toInt.toLong
      var j = 0
      while (j < numHashes) {
        val a = 2L * j + 1L
        val b = 7919L * j + 13L
        val perm = {
          val m = (h * a + b) % P
          if (m < 0) m + P else m
        }
        if (perm < mins(j)) mins(j) = perm
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  def register(spark: SparkSession, numHashes: Int = 16,
      k: Int = 5): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => { Arity.check("minhash_sig", 1, exprs)
        MinHashSig(exprs.head, numHashes, k) }, "built-in")
}
