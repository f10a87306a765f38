package graft

import graft.functions.CosineSimilarity
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
  * The `anon_*` string functions stay session-registered UDFs
  * ([[graft.functions.GraftFunctions.registerAll]]) — they are opaque
  * String => String kernels with no codegen body to inject.
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
  )
}
