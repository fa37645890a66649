package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the SQ8 scalar-quantization tier
  * ([[graft.ext.ScalarQuant]]). The composable forms
  * (`transform` + `aggregate(zip_with(...))`) evaluate INTERPRETED
  * (the [[NearestCentroid]] failure mode — ~50 µs/eval), which put an
  * interpreted seam on the 20M-row scan: `sim_sq8_topk_20m` measured
  * 383 s before these, dominated by per-row HOF evaluation, not I/O.
  * Each expression here is one generated loop fused into whole-stage
  * codegen; the quantization arithmetic is OPERATION-IDENTICAL to
  * [[graft.ext.ScalarQuant.quantize]] (floor((x − mn)/(mx − mn)·255),
  * clamped — same IEEE ops in generated Java), so results are
  * bit-equal to the composable forms (asserted in ScalarQuantSpec)
  * and the DuckDB oracle replay.
  */
object Sq8 {

  /** Fused quantize + symmetric integer distance: Σ(codeᵈ − qcodeᵈ)²
    * directly from the float vector — codes never materialize. */
  def dist(v: Column, stats: Seq[(Double, Double)],
      qcodes: Seq[Int]): Column =
    GraftSqlBridge.column(Sq8Dist(GraftSqlBridge.expression(v),
      stats.map(_._1), stats.map(_._2), qcodes))

  /** Fused encode: the corpus codes array in one generated loop. */
  def encode(v: Column, stats: Seq[(Double, Double)]): Column =
    GraftSqlBridge.column(Sq8Encode(GraftSqlBridge.expression(v),
      stats.map(_._1), stats.map(_._2)))

  /** Integer distance over a STORED codes array (array<int>). */
  def codesDist(codes: Column, qcodes: Seq[Int]): Column =
    GraftSqlBridge.column(
      Sq8CodesDist(GraftSqlBridge.expression(codes), qcodes))

  /** Fused encode to PACKED bytes (one uint8 per dimension) — the
    * FAISS on-disk layout: 64 bytes per vector in a parquet BINARY
    * column, which decodes as one byte-array copy instead of a
    * per-element list materialization. */
  def encodeBytes(v: Column, stats: Seq[(Double, Double)]): Column =
    GraftSqlBridge.column(Sq8EncodeBytes(GraftSqlBridge.expression(v),
      stats.map(_._1), stats.map(_._2)))

  /** Integer distance over PACKED byte codes (binary column). */
  def bytesDist(codes: Column, qcodes: Seq[Int]): Column =
    GraftSqlBridge.column(
      Sq8BytesDist(GraftSqlBridge.expression(codes), qcodes))
}

case class Sq8Dist(child: Expression, mn: Seq[Double], mx: Seq[Double],
    qcodes: Seq[Int]) extends UnaryExpression {

  require(mn.size == mx.size && mn.size == qcodes.size,
    "sq8_dist: bounds/query dimension mismatch")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_dist expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val mnA: Array[Double] = mn.toArray
  @transient private lazy val mxA: Array[Double] = mx.toArray
  @transient private lazy val qA: Array[Int] = qcodes.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = mnA.length
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"sq8_dist: input vector has ${x.numElements()} elements, " +
          s"bounds dimension is $d")
    var acc = 0L
    var i = 0
    while (i < d) {
      val lo = mnA(i); val hi = mxA(i)
      val code =
        if (hi == lo) 0
        else math.max(0, math.min(255,
          math.floor((x.getDouble(i) - lo) / (hi - lo) * 255.0).toInt))
      val t = (code - qA(i)).toLong
      acc += t * t
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mnR = ctx.addReferenceObj("mn", mnA, "double[]")
      val mxR = ctx.addReferenceObj("mx", mxA, "double[]")
      val qR = ctx.addReferenceObj("q", qA, "int[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val code = ctx.freshName("code")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      s"""
         |final int $d = $mnR.length;
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "sq8_dist: input vector has " + $x.numElements() +
         |    " elements, bounds dimension is " + $d);
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $d; $i++) {
         |  final double $lo = $mnR[$i];
         |  final double $hi = $mxR[$i];
         |  final int $code = ($hi == $lo) ? 0 : Math.max(0, Math.min(255,
         |    (int) Math.floor(($x.getDouble($i) - $lo) / ($hi - $lo) * 255.0)));
         |  final long $t = (long) ($code - $qR[$i]);
         |  $acc += $t * $t;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8Dist = copy(child = newChild)
}

case class Sq8Encode(child: Expression, mn: Seq[Double], mx: Seq[Double])
    extends UnaryExpression {

  require(mn.size == mx.size, "sq8_encode: bounds dimension mismatch")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_encode expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val mnA: Array[Double] = mn.toArray
  @transient private lazy val mxA: Array[Double] = mx.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = mnA.length
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"sq8_encode: input vector has ${x.numElements()} elements, " +
          s"bounds dimension is $d")
    val out = new Array[Int](d)
    var i = 0
    while (i < d) {
      val lo = mnA(i); val hi = mxA(i)
      out(i) =
        if (hi == lo) 0
        else math.max(0, math.min(255,
          math.floor((x.getDouble(i) - lo) / (hi - lo) * 255.0).toInt))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mnR = ctx.addReferenceObj("mn", mnA, "double[]")
      val mxR = ctx.addReferenceObj("mx", mxA, "double[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val out = ctx.freshName("out")
      s"""
         |final int $d = $mnR.length;
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "sq8_encode: input vector has " + $x.numElements() +
         |    " elements, bounds dimension is " + $d);
         |}
         |final int[] $out = new int[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  final double $lo = $mnR[$i];
         |  final double $hi = $mxR[$i];
         |  $out[$i] = ($hi == $lo) ? 0 : Math.max(0, Math.min(255,
         |    (int) Math.floor(($x.getDouble($i) - $lo) / ($hi - $lo) * 255.0)));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8Encode = copy(child = newChild)
}

case class Sq8CodesDist(child: Expression, qcodes: Seq[Int])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_codes_dist expects array<int>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val qA: Array[Int] = qcodes.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = qA.length
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"sq8_codes_dist: codes array has ${x.numElements()} elements, " +
          s"query dimension is $d")
    var acc = 0L
    var i = 0
    while (i < d) {
      val t = (x.getInt(i) - qA(i)).toLong
      acc += t * t
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val qR = ctx.addReferenceObj("q", qA, "int[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      s"""
         |final int $d = $qR.length;
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "sq8_codes_dist: codes array has " + $x.numElements() +
         |    " elements, query dimension is " + $d);
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $d; $i++) {
         |  final long $t = (long) ($x.getInt($i) - $qR[$i]);
         |  $acc += $t * $t;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8CodesDist = copy(child = newChild)
}

case class Sq8EncodeBytes(child: Expression, mn: Seq[Double], mx: Seq[Double])
    extends UnaryExpression {

  require(mn.size == mx.size, "sq8_encode_bytes: bounds dimension mismatch")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_encode_bytes expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = child.nullable

  @transient private lazy val mnA: Array[Double] = mn.toArray
  @transient private lazy val mxA: Array[Double] = mx.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = mnA.length
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"sq8_encode_bytes: input vector has ${x.numElements()} elements, " +
          s"bounds dimension is $d")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val lo = mnA(i); val hi = mxA(i)
      val code =
        if (hi == lo) 0
        else math.max(0, math.min(255,
          math.floor((x.getDouble(i) - lo) / (hi - lo) * 255.0).toInt))
      out(i) = code.toByte // 0..255 stored as the unsigned byte pattern
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mnR = ctx.addReferenceObj("mn", mnA, "double[]")
      val mxR = ctx.addReferenceObj("mx", mxA, "double[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val code = ctx.freshName("code")
      val out = ctx.freshName("out")
      s"""
         |final int $d = $mnR.length;
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "sq8_encode_bytes: input vector has " + $x.numElements() +
         |    " elements, bounds dimension is " + $d);
         |}
         |final byte[] $out = new byte[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  final double $lo = $mnR[$i];
         |  final double $hi = $mxR[$i];
         |  final int $code = ($hi == $lo) ? 0 : Math.max(0, Math.min(255,
         |    (int) Math.floor(($x.getDouble($i) - $lo) / ($hi - $lo) * 255.0)));
         |  $out[$i] = (byte) $code;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8EncodeBytes = copy(child = newChild)
}

case class Sq8BytesDist(child: Expression, qcodes: Seq[Int])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_bytes_dist expects binary, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val qA: Array[Int] = qcodes.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val d = qA.length
    if (x.length < d)
      throw new IllegalArgumentException(
        s"sq8_bytes_dist: codes blob has ${x.length} bytes, " +
          s"query dimension is $d")
    var acc = 0L
    var i = 0
    while (i < d) {
      val t = ((x(i) & 0xFF) - qA(i)).toLong
      acc += t * t
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val qR = ctx.addReferenceObj("q", qA, "int[]")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      s"""
         |final int $d = $qR.length;
         |if ($x.length < $d) {
         |  throw new IllegalArgumentException(
         |    "sq8_bytes_dist: codes blob has " + $x.length +
         |    " bytes, query dimension is " + $d);
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $d; $i++) {
         |  final long $t = (long) (($x[$i] & 0xFF) - $qR[$i]);
         |  $acc += $t * $t;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Sq8BytesDist = copy(child = newChild)
}
