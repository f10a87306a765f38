package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The anonymizer scalar family (X1–X14) as a NATIVE Catalyst expression —
  * the codegen upgrade SURVEY §2.8 names as optional for the hot path. One
  * expression class covers all kinds: the kind name (plus any int
  * parameters — `partial_redact(showFirst, showLast)` is the family's one
  * parameterized member, reference Anonymizer.scala:154-165) resolves to a
  * kernel id AT PLAN TIME, and the generated code calls
  * `ScrubKernel.call(id, value)` / `ScrubKernel.callPartialRedact(a, b,
  * value)` through a static forwarder (same pattern as [[CosineSimilarity]]
  * / [[CosineKernel]]), so the scrub stays inside whole-stage codegen with
  * no UDF closure serialization, no per-row encoder round trip, and
  * framework-generated null handling.
  *
  * Semantics are EXACTLY the UDF forms': the kernel array holds the very
  * same [[Anonymizer]] singletons the UDFs wrap, so the two paths cannot
  * diverge (the MD5 contract of reference Anonymizer.scala:27-43 is one
  * implementation either way). Null input → null output (framework
  * null-intolerance == the reference's null passthrough); "" passes
  * through inside each scrubber. Input typing also matches the UDF tier:
  * every construction surface builds through [[Scrub.ofAny]], which wraps
  * the child in an explicit string [[Cast]] (the analogue of the implicit
  * cast `ScalaUDF` inserts; `SimplifyCasts` folds the no-op string→string
  * case) — so `anon_zip(42)` analyzes identically whether the name
  * resolved to the UDF registration or to this expression through
  * `GraftExtensions`. Spark's own `ImplicitCastInputTypes` is
  * `private[sql]`-typed and unavailable to a library expression.
  */
case class Scrub(child: Expression, kind: String, params: Seq[Int] = Nil)
    extends UnaryExpression {

  // Fails fast at construction on an unknown kind or a parameter-arity
  // mismatch (plan time, not run time).
  private val kernelId: Int = ScrubKernel.idOf(kind, params)

  override def dataType: DataType = StringType
  override def prettyName: String = s"anon_$kind"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${other.simpleString} — build via Scrub.ofAny for the implicit cast")
  }

  override def nullSafeEval(v: Any): Any =
    if (kind == ScrubKernel.PartialRedactKind)
      ScrubKernel.callPartialRedact(params.head, params(1), v.asInstanceOf[UTF8String])
    else ScrubKernel.call(kernelId, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (kind == ScrubKernel.PartialRedactKind)
        s"${ev.value} = graft.functions.ScrubKernel.callPartialRedact(${params.head}, ${params(1)}, $c);"
      else
        s"${ev.value} = graft.functions.ScrubKernel.call($kernelId, $c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Scrub {

  /** Cast-tolerant constructor — mirrors the UDF tier's implicit input
    * cast so both registration tiers accept the same inputs. The extra
    * string→string cast on already-string children is folded away by the
    * optimizer's `SimplifyCasts`.
    */
  def ofAny(child: Expression, kind: String, params: Seq[Int] = Nil): Scrub =
    Scrub(Cast(child, StringType), kind, params)
}

/** Kernel registry on a top-level object so Janino-generated code can call
  * the static forwarders `ScrubKernel.call(int, UTF8String)` /
  * `ScrubKernel.callPartialRedact(int, int, UTF8String)` directly.
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

  /** The family's one parameterized kind: `Scrub(c, "partial_redact",
    * Seq(showFirst, showLast))`. Its parameters are plan-time constants
    * embedded as int literals in generated code, so the per-row call is a
    * static three-arg forwarder — no per-kind instance lookup.
    */
  val PartialRedactKind = "partial_redact"

  private val byName: Map[String, Int]     = kinds.map(_._1).zipWithIndex.toMap
  private val fns: Array[String => String] = kinds.map(_._2).toArray

  def idOf(kind: String): Int = idOf(kind, Nil)

  def idOf(kind: String, params: Seq[Int]): Int =
    if (kind == PartialRedactKind) {
      require(params.length == 2,
        s"$PartialRedactKind takes exactly (showFirst, showLast), got $params")
      require(params.forall(_ >= 0), s"$PartialRedactKind edges must be >= 0, got $params")
      -1 // dispatched by kind, not id
    } else {
      require(params.isEmpty, s"scrub kind '$kind' takes no parameters, got $params")
      byName.getOrElse(
        kind,
        throw new IllegalArgumentException(
          s"unknown scrub kind '$kind' (known: ${(kinds.map(_._1) :+ PartialRedactKind).mkString(", ")})"))
    }

  /** Reverse lookup by kernel IDENTITY — lets the spec DSL recognize that a
    * `mapString(Anonymizer.Email)` transform is native-expressible and skip
    * the UDF wrapper (an opaque user closure still takes the UDF path).
    * [[Anonymizer.PartialRedact]] instances are recognized structurally by
    * the DSL instead (case-class match carrying the two edge widths).
    */
  def kindOf(f: String => String): Option[String] =
    kinds.collectFirst { case (name, k) if k eq f => name }

  def call(id: Int, s: UTF8String): UTF8String =
    UTF8String.fromString(fns(id)(s.toString))

  def callPartialRedact(showFirst: Int, showLast: Int, s: UTF8String): UTF8String = {
    // Inline redaction on the decoded string — allocation-equivalent to
    // the case-class apply but with the edges as constants (no per-row
    // Anonymizer instance).
    val in = s.toString
    if (in.isEmpty) return s
    val n = in.length
    val out =
      if (n <= showFirst + showLast) "*" * n
      else in.substring(0, showFirst) + ("*" * (n - showFirst - showLast)) + in.substring(n - showLast)
    UTF8String.fromString(out)
  }
}
