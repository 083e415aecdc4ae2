package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a string column — the
  * pre-filter primitive behind bloom-pruned decontamination
  * (graft.operators.Dedup.contaminationBloom): the filter is built once
  * from the SMALL side (e.g. a benchmark's distinct n-grams) and probed
  * inside the narrow scan of the LARGE side, so non-matching rows die
  * before any shuffle. Probes `mightContainBinary` on the UTF-8 bytes —
  * exactly what `BloomFilter.putString` hashes — with no per-row String
  * allocation and no UDF boxing.
  *
  * The filter travels as a BROADCAST variable, not inside the
  * serialized expression: an `fpp=0.1%` filter over 1M items is
  * ~1.7 MB, and task closures ship per task while a broadcast is
  * fetched once per executor — the difference between MBs × tasks and
  * MBs × executors on a real cluster.
  * Guarantee: no false negatives — every true member passes — so an
  * exact join downstream restores exact semantics.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    val filterCls = classOf[BloomFilter].getName
    // resolve the broadcast once per operator instance, not per row
    val filterRef = ctx.addMutableState(filterCls, "bloomFilter",
      v => s"$v = ($filterCls) $bc.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filterRef.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(c), bloom))
}
