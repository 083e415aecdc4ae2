package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length strings (e.g. the 64-char
  * SimHash bit strings from graft.operators.Dedup.simhash) — a native
  * codegen'd Catalyst expression: the comparison loop is emitted
  * directly into whole-stage codegen (no UDF boxing, no lambda
  * allocation per row). Returns null when the lengths differ.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression
    with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length) null
    else {
      var i = 0; var d = 0
      while (i < a.length) { if (a(i) != b(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ba = ctx.freshName("ba")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $ba = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |if ($ba.length != $bb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $ba.length; $i++) {
         |    if ($ba[$i] != $bb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def hamming(a: Column, b: Column): Column =
    GraftShims.column(HammingDistance(GraftShims.expression(a), GraftShims.expression(b)))
}
