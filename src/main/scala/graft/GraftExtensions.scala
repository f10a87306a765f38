package graft

import graft.functions.{CosineSimilarity, Scrub, ScrubKernel}
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
        Scrub(children.head, kind)
      }
    )
  }
}
