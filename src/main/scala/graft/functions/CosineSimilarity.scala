package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two `array<float>` columns as a NATIVE Catalyst
  * expression with `doGenCode` — the tier above a Scala UDF in the
  * extension preference order: it participates in whole-stage codegen (no
  * UDF closure serialization, no per-row encoder round-trip; null handling
  * is the framework's nullSafeCodeGen), and `ArrayData.toFloatArray()` is
  * a single primitive memcpy from Tungsten format.
  *
  * Semantics are identical to the previous UDF kernel (and the DuckDB
  * oracle's `list_reduce` fold): accumulate in double over index order up
  * to the shorter length, `dot / sqrt(na * nb)`. The shared JVM kernel is
  * [[CosineKernel.compute]] — the generated code and the interpreted
  * `eval` call the same method, so the two paths cannot diverge.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // ExpectsInputTypes is off-limits outside Spark (AbstractDataType is
  // private[sql]); the equivalent manual check keeps analysis-time errors.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}"
      )
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.compute(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray()
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = graft.functions.CosineKernel.compute($a.toFloatArray(), $b.toFloatArray());"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The scalar kernel, on a plain class so Janino-generated code can call it
  * as a static method without Scala-object MODULE$ indirection.
  */
object CosineKernel {
  def compute(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    val n   = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }
}
