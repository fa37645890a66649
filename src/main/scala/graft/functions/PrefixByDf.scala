package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: PPJoin prefix selection against a
  * BROADCAST document-frequency dictionary
  * ([[graft.ext.Dedup.ngramJaccardPrefixPairs]]).
  *
  * Input: a document's shingle array. Output: the ⌈(1−t)·|S|⌉+1
  * RAREST shingles under the global (df, shingle) ordering — the
  * prefix whose emptiness of overlap certifies Jaccard < t (Xiao et
  * al., PPJoin), under ANY consistent global token ordering, which is
  * why the ordering's tie-break detail cannot affect the verified
  * result set, only the candidate count.
  *
  * Why this shape: the first formulation joined the corpus-sized
  * inverted index against the df table and ranked per doc with a
  * row_number window — the join + per-partition SORT of the whole
  * index spilled past disk and ABORTED at 100× (PLANS.md round-11).
  * Here the df dictionary rides as a TRUE Spark broadcast — NOT a
  * plan reference object: task binaries deserialize PER TASK, so a
  * multi-million-entry dictionary as a reference object multiplies
  * by the task concurrency (32 × ~2 GB OOMed a 24 GB JVM at 100×;
  * the NearestCentroid codebook pattern is only right for
  * kilobyte-scale state), while a Broadcast handle resolves through
  * `.value` to ONE shared map per executor JVM. Prefix selection is
  * then one per-document sort of |S| elements inside the scan
  * projection: NO df-join, NO corpus-wide window, nothing shuffles
  * until the prefix inverted index — which is strictly smaller than
  * the full one the inverted path joins.
  *
  * Codegen: the generated code calls [[computePrefix]] through a
  * reference object — the per-row work is an intrinsic O(|S| log |S|)
  * sort either way, so unlike the interpreted-HOF failure mode
  * ([[NearestCentroid]] scaladoc) there is no per-ELEMENT evaluator
  * overhead to fuse away; the call stays inside whole-stage codegen.
  *
  * Absent shingles (possible under an incremental df snapshot) rank
  * as df = 0 — rarest, which keeps the filter conservative: a prefix
  * can only GAIN members, never lose a qualifying pair.
  */
case class PrefixByDf(child: Expression,
    dfBc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UTF8String, Long]],
    threshold: Double) extends UnaryExpression {

  require(threshold > 0.0 && threshold <= 1.0,
    s"prefix_by_df: threshold $threshold outside (0, 1]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"prefix_by_df expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // one .value resolution per eval: the per-JVM shared map
  private def dfMap: java.util.HashMap[UTF8String, Long] = dfBc.value

  def computePrefix(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val p = n - math.ceil(threshold * n).toInt + 1
    val keyed = new Array[(Long, UTF8String)](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val df = dfMap.getOrDefault(s, 0L)
        keyed(m) = (df, s)
        m += 1
      }
      i += 1
    }
    val sorted = java.util.Arrays.copyOf(keyed, m)
    java.util.Arrays.sort(sorted,
      new java.util.Comparator[(Long, UTF8String)] {
        override def compare(x: (Long, UTF8String),
            y: (Long, UTF8String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c else x._2.compareTo(y._2)
        }
      })
    val keep = math.min(p, m)
    val out = new Array[Any](math.max(keep, 0))
    var j = 0
    while (j < keep) {
      // copy out of the scan's reusable buffer
      out(j) = sorted(j)._2.clone()
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computePrefix(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("prefixByDf", this,
        classOf[PrefixByDf].getName)
      s"${ev.value} = $ref.computePrefix($x);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PrefixByDf = copy(child = newChild)
}

object PrefixByDf {
  /** Build + broadcast the dictionary (UTF8String keys — lookups hit
    * the scan's native representation, no per-row String decode),
    * then wrap the expression around the handle. */
  def apply(spark: org.apache.spark.sql.SparkSession, sh: Column,
      dfEntries: Seq[(String, Long)], threshold: Double): Column = {
    val m = new java.util.HashMap[UTF8String, Long](dfEntries.size * 2)
    dfEntries.foreach { case (s, c) => m.put(UTF8String.fromString(s), c) }
    GraftSqlBridge.column(PrefixByDf(
      GraftSqlBridge.expression(sh), spark.sparkContext.broadcast(m),
      threshold))
  }
}
