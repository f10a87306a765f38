package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The anonymizer scalar family (X1–X14's parameterless members) as a
  * NATIVE Catalyst expression — the codegen upgrade SURVEY §2.8 names as
  * optional for the hot path. One expression class covers all kinds: the
  * kind name resolves to a kernel id AT PLAN TIME, and the generated code
  * calls `ScrubKernel.call(id, value)` through a static forwarder (same
  * pattern as [[CosineSimilarity]] / [[CosineKernel]]), so the scrub stays
  * inside whole-stage codegen with no UDF closure serialization, no
  * per-row encoder round trip, and framework-generated null handling.
  *
  * Semantics are EXACTLY the UDF forms': the kernel array holds the very
  * same [[Anonymizer]] singletons the UDFs wrap, so the two paths cannot
  * diverge (the MD5 contract of reference Anonymizer.scala:27-43 is one
  * implementation either way). Null input → null output (framework
  * null-intolerance == the reference's null passthrough); "" passes
  * through inside each scrubber.
  */
case class Scrub(child: Expression, kind: String) extends UnaryExpression {

  // Fails fast at construction on an unknown kind (plan time, not run time).
  private val kernelId: Int = ScrubKernel.idOf(kind)

  override def dataType: DataType = StringType
  override def prettyName: String = s"anon_$kind"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ScrubKernel.call(kernelId, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.ScrubKernel.call($kernelId, $c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel registry on a top-level object so Janino-generated code can call
  * the static forwarder `ScrubKernel.call(int, UTF8String)` directly.
  */
object ScrubKernel {

  /** Frozen (name, kernel) table — ids are positional, resolved at plan
    * time and embedded as integer literals in generated code.
    */
  val kinds: IndexedSeq[(String, String => String)] = Vector(
    "first_name"        -> Anonymizer.FirstName,
    "male_first_name"   -> Anonymizer.MaleFirstName,
    "female_first_name" -> Anonymizer.FemaleFirstName,
    "last_name"         -> Anonymizer.LastName,
    "full_name"         -> Anonymizer.FullName,
    "state"             -> Anonymizer.State,
    "state_abbr"        -> Anonymizer.StateAbbr,
    "country"           -> Anonymizer.Country,
    "email"             -> Anonymizer.Email,
    "phone"             -> Anonymizer.PhoneNumber,
    "street_address"    -> Anonymizer.StreetAddress,
    "city"              -> Anonymizer.City,
    "zip"               -> Anonymizer.ZipCode,
    "redact"            -> Anonymizer.Redact,
    "lorem"             -> Anonymizer.LoremText
  )

  private val byName: Map[String, Int]     = kinds.map(_._1).zipWithIndex.toMap
  private val fns: Array[String => String] = kinds.map(_._2).toArray

  def idOf(kind: String): Int =
    byName.getOrElse(
      kind,
      throw new IllegalArgumentException(
        s"unknown scrub kind '$kind' (known: ${kinds.map(_._1).mkString(", ")})"))

  /** Reverse lookup by kernel IDENTITY — lets the spec DSL recognize that a
    * `mapString(Anonymizer.Email)` transform is native-expressible and skip
    * the UDF wrapper (an opaque user closure still takes the UDF path).
    */
  def kindOf(f: String => String): Option[String] =
    kinds.collectFirst { case (name, k) if k eq f => name }

  def call(id: Int, s: UTF8String): UTF8String =
    UTF8String.fromString(fns(id)(s.toString))
}
