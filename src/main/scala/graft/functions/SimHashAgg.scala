package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash as ONE aggregate: folds md5 hex digests (one per token)
  * into a 64-slot vote buffer and emits the 64-bit signature whose
  * bit j is set when the weighted majority of token-hash bits j was
  * 1. Bit extraction matches `Dedup.simhashSignaturesMd5`: bit j =
  * bit (3 - j%4) of hex nibble j/4 of the digest's first 16 chars.
  *
  * Why custom: the declarative formulation needs 64 separate SUM
  * columns (64 aggregate buffer slots managed as independent
  * expressions, 64 CASE evaluations per row at codegen width limits);
  * this TypedImperativeAggregate keeps one int[64] buffer per group
  * and does the nibble loop in tight JVM code. Same partial/final
  * merge contract as any Spark aggregate, so it distributes and
  * map-side-combines exactly like SUM. SQL-callable as
  * `simhash_agg(md5(token))` via [[GraftExtensions]].
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_agg expects an md5 hex string, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  private def hexVal(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < 64 && (j >> 2) < hex.length) {
        val nib = hexVal(hex(j >> 2))
        if (nib >= 0) {
          val bit = (nib >> (3 - (j & 3))) & 1
          buf(j) += (if (bit == 1) 1 else -1)
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(256)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SimHashAgg = copy(child = cs.head)
}

object SimHashAgg {
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
