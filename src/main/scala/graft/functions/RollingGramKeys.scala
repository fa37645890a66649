package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: all k-gram fingerprints of a token
  * array in ONE rolling pass — the gram key for substring-span dedup
  * ([[graft.ext.Dedup.substringSpans]]).
  *
  * Two-level Karp–Rabin, both levels mod 2^61−1:
  *  1. each token hashes once through the byte-level
  *     [[RollingHash]] fold (`h·257 + byte`) — O(total characters),
  *     each character touched exactly once;
  *  2. the gram key at position i is the base-[[RollingGramKeys.GramBase]]
  *     Horner fold of the k token hashes, maintained by the standard
  *     rolling update `g' = (g − th_out·B^(k−1))·B + th_in` — O(1)
  *     per position.
  *
  * This replaces the string-concat gram key (materialize the k-token
  * gram string, md5 it, take 60 bits): that form re-copies every
  * character k times (two concat passes measured 47–51 s of the 100×
  * span wall) where this one does O(chars + positions) arithmetic.
  * Pure deterministic arithmetic — no engine hash — so the DuckDB
  * oracle replays both levels exactly as HUGEINT folds (the
  * [[RollingHash]] discipline; the rolling update is congruent to
  * re-folding, so the oracle's per-position Horner reproduces the
  * rolling values bit-for-bit).
  *
  * Codegen calls [[computeKeys]] through a reference object — the
  * per-row work is the intrinsic two-level fold either way (the
  * [[PrefixByDf]] argument), staying inside whole-stage codegen.
  *
  * Null tokens (impossible from the tokenizer, guarded anyway) hash
  * as 0. Arrays shorter than k produce an empty key array.
  */
case class RollingGramKeys(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"rolling_gram_keys: gram size must be positive, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_gram_keys expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def computeKeys(a: ArrayData): ArrayData = {
    import RollingGramKeys.{addMod, mulMod, subMod, GramBase}
    val n = a.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var j = 0
    while (j < n) {
      th(j) =
        if (a.isNullAt(j)) 0L
        else RollingHash.hashBytes(a.getUTF8String(j).getBytes)
      j += 1
    }
    val out = new Array[Long](n - k + 1)
    var g = 0L
    var i = 0
    while (i < k) { g = addMod(mulMod(g, GramBase), th(i)); i += 1 }
    out(0) = g
    // B^(k-1) for the evict term
    var bk = 1L
    i = 0
    while (i < k - 1) { bk = mulMod(bk, GramBase); i += 1 }
    i = 1
    while (i <= n - k) {
      g = addMod(mulMod(subMod(g, mulMod(th(i - 1), bk)), GramBase),
        th(i + k - 1))
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeKeys(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("rollingGramKeys", this,
        classOf[RollingGramKeys].getName)
      s"${ev.value} = $ref.computeKeys($x);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingGramKeys = copy(child = newChild)
}

object RollingGramKeys {
  /** Combination base for the token-hash level — prime, and large
    * enough that adjacent-token transpositions never cancel. Rides
    * verbatim in the oracle SQL. */
  final val GramBase: Long = 1000003L

  private final val Mod: Long = RollingHash.Mod // 2^61 - 1

  /** (a·b) mod 2^61−1 for a, b in [0, 2^61): 128-bit product folded
    * twice. hi < 2^58 for these operands, so `hi << 3` never
    * overflows. */
  @inline private[functions] def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    r = (r & Mod) + (r >>> 61)
    if (r >= Mod) r -= Mod
    r
  }

  @inline private[functions] def addMod(a: Long, b: Long): Long = {
    var r = a + b // both < 2^61, no overflow
    if (r >= Mod) r -= Mod
    r
  }

  @inline private[functions] def subMod(a: Long, b: Long): Long = {
    var r = a - b
    if (r < 0) r += Mod
    r
  }

  def apply(toks: Column, k: Int): Column =
    GraftSqlBridge.column(
      RollingGramKeys(GraftSqlBridge.expression(toks), k))
}
