package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.graft.ColumnBridge

/** Spark-facing Column surface for the anonymizer + lens libraries.
  *
  * The parameterless scrubbers are NATIVE Catalyst expressions since round
  * 9 ([[Scrub]] — whole-stage codegen, no UDF closure), applied through
  * [[NativeScrub]] so call sites keep the `firstName(col)` shape.
  * Parameterized/lens-composed transforms stay deterministic UDFs (the
  * MD5 contract makes every path deterministic, so Catalyst is free to
  * collapse duplicate applications). Null inputs flow through unchanged on
  * both paths, matching the reference's `preserveNullOrEmpty`.
  */
object GraftFunctions {

  /** `Column => Column` wrapper building the codegen'd [[Scrub]] expression. */
  final class NativeScrub private[functions] (val kind: String) extends (Column => Column)
      with Serializable {
    override def apply(c: Column): Column =
      ColumnBridge.column(Scrub.ofAny(ColumnBridge.expression(c), kind))
  }

  val firstName: NativeScrub       = new NativeScrub("first_name")
  val maleFirstName: NativeScrub   = new NativeScrub("male_first_name")
  val femaleFirstName: NativeScrub = new NativeScrub("female_first_name")
  val lastName: NativeScrub        = new NativeScrub("last_name")
  val fullName: NativeScrub        = new NativeScrub("full_name")
  val state: NativeScrub           = new NativeScrub("state")
  val stateAbbr: NativeScrub       = new NativeScrub("state_abbr")
  val country: NativeScrub         = new NativeScrub("country")
  val email: NativeScrub           = new NativeScrub("email")
  val phoneNumber: NativeScrub     = new NativeScrub("phone")
  val streetAddress: NativeScrub   = new NativeScrub("street_address")
  val city: NativeScrub            = new NativeScrub("city")
  val zipCode: NativeScrub         = new NativeScrub("zip")
  val redact: NativeScrub          = new NativeScrub("redact")
  val loremText: NativeScrub       = new NativeScrub("lorem")

  /** Native since round 10 — the edge widths embed as plan-time int
    * literals in the codegen'd [[Scrub]], closing the last UDF-only
    * scrubber (reference Anonymizer.scala:154-165).
    *
    * SOURCE-BREAKING change vs earlier rounds: the return type moved from
    * `UserDefinedFunction` to `Column => Column` (application sites —
    * `partialRedact(1, 3)(col)` — compile unchanged, but callers that
    * stored the UDF or used its members must migrate; the UDF form
    * survives as [[partialRedactUdf]]).
    */
  def partialRedact(showFirst: Int = 2, showLast: Int = 2): Column => Column =
    c => ColumnBridge.column(
      Scrub.ofAny(ColumnBridge.expression(c), ScrubKernel.PartialRedactKind, Seq(showFirst, showLast)))

  /** The pre-round-10 UDF form of [[partialRedact]], kept for callers that
    * need a [[UserDefinedFunction]] (`.withName`, `asNondeterministic`,
    * storing in UDF-typed registries). Same values; skips codegen.
    */
  @deprecated("use partialRedact (native codegen expression)", "round 10")
  def partialRedactUdf(showFirst: Int = 2, showLast: Int = 2): UserDefinedFunction =
    udf(Anonymizer.PartialRedact(showFirst, showLast)(_: String))

  /** Lift any lens-focused string transform into a UDF. */
  def lensUdf(lens: Lens, f: String => String): UserDefinedFunction =
    udf(lens.modify(f)(_: String))

  /** Register the library under `anon_*` SQL names on a session. UDF
    * wrappers by necessity (`spark.udf` has no expression tier); sessions
    * built `.withExtensions(new GraftExtensions)` resolve the same names
    * to the native [[Scrub]] expression instead.
    */
  def registerAll(spark: SparkSession): Unit = {
    ScrubKernel.kinds.foreach { case (kind, fn) =>
      spark.udf.register(s"anon_$kind", udf(fn(_: String)))
    }
    // Parity with the extension tier's 3-arg anon_partial_redact (there the
    // edges must be int literals; the UDF accepts any int expression).
    spark.udf.register(
      s"anon_${ScrubKernel.PartialRedactKind}",
      udf((s: String, a: Int, b: Int) => Anonymizer.PartialRedact(a, b)(s)))
  }
}
