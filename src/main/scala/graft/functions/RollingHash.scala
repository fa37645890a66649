package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Karp–Rabin) rolling hash of a string column's UTF-8
  * bytes: `h = Σ h*B + byte (mod 2^61-1)` — the content-defined
  * fingerprint used for chunking/shingling documents at scale. A
  * native expression with codegen: one pass over the bytes, no
  * allocation, stays inside whole-stage codegen. Deterministic and
  * engine-version-independent (pure arithmetic, unlike xxhash64 whose
  * seed/implementation is engine-specific).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = RollingHash.step(h, bytes(i))
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
}

object RollingHash {
  final val Mod: Long = (1L << 61) - 1 // Mersenne prime 2^61-1
  final val Base: Long = 257L

  /** One Horner step mod 2^61-1 using 128-bit multiply. */
  @inline def step(h: Long, b: Byte): Long = {
    val hi = Math.multiplyHigh(h, Base)
    val lo = h * Base
    // fold 128-bit product into mod 2^61-1: (x mod 2^61) + (x >> 61)
    var r = (lo & Mod) + ((hi << 3) | (lo >>> 61)) + (b & 0xffL)
    if (r >= Mod) r -= Mod
    r
  }

  /** Loop form invoked from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = step(h, bytes(i)); i += 1 }
    h
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
}
