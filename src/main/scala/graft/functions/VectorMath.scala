package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Allocation-free folds over two double arrays — native codegen'd
  * Catalyst expressions for the distance kernels under every k-means /
  * IVF / semdedup pass. The `zip_with` + `aggregate` composition they
  * replace materializes a fresh intermediate array PER CANDIDATE PAIR
  * (an N·cells assignment pass at ×100 / 800 cells allocates ~160M
  * 64-element arrays before folding them away); these emit one scalar
  * loop straight into whole-stage codegen.
  *
  * Arithmetic is IEEE-identical to the composition they replace: the
  * fold visits indices ascending and accumulates with the same +/−/×
  * sequence, so every rounded distance (and therefore every
  * oracle-hashed assignment) is bit-equal. Unequal-length inputs and
  * NULL elements both return NULL — the same poisoning the zip_with
  * form produced, so a corrupt vector stays visibly degenerate
  * (NULL-scored, ranked last) instead of getting a finite wrong score.
  */
abstract class VectorFold extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Scala fold body: combine one (a(i), b(i)) pair into the sum. */
  protected def combine(x: Double, y: Double): Double

  /** Java fold body for codegen: a statement accumulating into `s`
    * from element expressions `x` and `y` (each referenced once).
    */
  protected def combineJava(s: String, x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        // a null ELEMENT poisons the fold to NULL — exactly what the
        // zip_with composition did: a corrupt vector must score NULL
        // (visibly degenerate, ranked last), never a finite wrong value
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += combine(a.getDouble(i), b.getDouble(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${combineJava(s, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** Σᵢ (aᵢ − bᵢ)² — the squared-L2 kernel of Lloyd's assignment. */
case class L2SqDistance(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "l2sq_distance"
  override protected def combine(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def combineJava(s: String, x: String, y: String): String =
    s"{ double __d = ($x) - ($y); $s += __d * __d; }"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDistance =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ aᵢ·bᵢ — the inner-product kernel under every cosine. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_product"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineJava(s: String, x: String, y: String): String =
    s"$s += ($x) * ($y);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorMath {
  def l2sq(a: Column, b: Column): Column =
    GraftShims.column(L2SqDistance(GraftShims.expression(a), GraftShims.expression(b)))
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}
