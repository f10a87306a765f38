package graft

import graft.functions.{CosineSimilarity, PqAdcDot, Scrub, ScrubKernel}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the `SparkSessionExtensions` tier of
  * the extension ladder (above UDF registration): native expressions are
  * injected into the FunctionRegistry at session build, so SQL text can
  * call them (`SELECT graft_cosine(a, b)`) and they resolve to the
  * codegen'd Catalyst expression, not a UDF wrapper.
  *
  * Wire it either way Spark supports:
  *   - `SparkSession.builder().withExtensions(new GraftExtensions)`
  *   - `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  *     no code change — how a platform team would ship this library)
  *
  * The `anon_*` string functions inject as native [[Scrub]] expressions
  * (codegen'd since round 9); [[graft.functions.GraftFunctions.registerAll]]
  * remains the UDF-tier fallback for sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(extensions.injectFunction)
}

object GraftExtensions {

  /** Injected native functions: (identifier, catalog info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName,
        null,
        "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float vectors, accumulated in double over index order",
        ""
      ),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_cosine expects 2 arguments, got ${children.size}")
        CosineSimilarity(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_pq_adc_dot"),
      new ExpressionInfo(
        classOf[PqAdcDot].getCanonicalName,
        null,
        "graft_pq_adc_dot",
        "graft_pq_adc_dot(codes, lut) - PQ asymmetric-distance dot: codes is a binary code word (one unsigned byte per subspace), lut the query's flat m*k float table; returns sum(lut[sub*k + codes[sub]])",
        ""
      ),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_pq_adc_dot expects 2 arguments, got ${children.size}")
        PqAdcDot(children.head, children(1))
      }
    )
  ) ++ ScrubKernel.kinds.map { case (kind, _) =>
    val name = s"anon_$kind"
    (
      FunctionIdentifier(name),
      new ExpressionInfo(
        classOf[Scrub].getCanonicalName,
        null,
        name,
        s"$name(s) - deterministic MD5-keyed $kind scrub; null and '' pass through",
        ""
      ),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"$name expects 1 argument, got ${children.size}")
        Scrub.ofAny(children.head, kind)
      }
    )
  } :+ {
    // The family's one parameterized member: edge widths must be integer
    // literals (they embed as plan-time constants in the generated code,
    // exactly like the kind's kernel id). Same name + arity as the UDF
    // tier registers, so both tiers resolve identically.
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.types.IntegerType
    val name = s"anon_${ScrubKernel.PartialRedactKind}"
    (
      FunctionIdentifier(name),
      new ExpressionInfo(
        classOf[Scrub].getCanonicalName,
        null,
        name,
        s"$name(s, showFirst, showLast) - stars the middle, keeps the int-literal edge widths; null and '' pass through",
        ""
      ),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"$name expects 3 arguments, got ${children.size}")
        def edge(e: Expression, which: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"$name $which edge must be an INT literal, got $other")
        }
        Scrub.ofAny(children.head, ScrubKernel.PartialRedactKind,
          Seq(edge(children(1), "showFirst"), edge(children(2), "showLast")))
      }
    )
  }
}
