package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) accumulation for product-quantized vectors
  * as a NATIVE Catalyst expression with `doGenCode` — the hot inner loop
  * of PQ serving, kept inside whole-stage codegen like
  * [[CosineSimilarity]] (same preference-order argument: no UDF closure,
  * no encoder round-trip, binary passes through raw and `toFloatArray` is a primitive
  * memcpy from Tungsten format).
  *
  * Inputs: `codes` — a corpus row's PQ code word (`binary`, one BYTE per
  * subspace — k ≤ 256 by construction, and the byte layout is the ×32
  * claim: 8–16 bytes per vector instead of 256); `lut` — the QUERY's
  * precomputed lookup
  * table (`array<float>`, m·k flat: `lut[sub·k + j]` = dot(query_sub,
  * codebook_sub[j])). Output: Σ_sub lut[sub·k + codes[sub]] — the
  * approximate dot(query, decode(codes)), the table-lookup form that
  * replaces a d-multiply scan with m lookups (the whole point of ADC:
  * 8 loads instead of 64 fused multiplies per pair, and the corpus side
  * reads m bytes instead of d floats). k derives per row as
  * lut.length / codes.length — no separate parameter to drift out of
  * sync with the model.
  *
  * The shared kernel is [[PqAdcKernel.compute]]; generated and
  * interpreted paths call the same method and cannot diverge.
  */
case class PqAdcDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary codes, array<float> lut), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcKernel.compute(
      codes.asInstanceOf[Array[Byte]],
      lut.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (c, l) => s"${ev.value} = graft.functions.PqAdcKernel.compute($c, $l.toFloatArray());"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain-class kernel so Janino code calls a static method (no Scala
  * MODULE$ indirection). Out-of-range codes contribute 0.0 — a malformed
  * row degrades its own score instead of throwing inside generated code.
  */
object PqAdcKernel {
  def compute(codes: Array[Byte], lut: Array[Float]): Double = {
    val m = codes.length
    if (m == 0) return 0.0
    val k = lut.length / m
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val code = codes(sub) & 0xFF // bytes are unsigned code indexes
      if (code < k) acc += lut(sub * k + code)
      sub += 1
    }
    acc
  }
}
