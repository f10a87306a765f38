package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation for ingest — the dbt-test/Great-Expectations
  * shape: declarative row-level rules evaluated as ONE aggregation pass
  * (each rule is a conditional sum over the same scan — N rules cost one
  * job, not N), plus referential-integrity checks as anti-join counts.
  * The output is a per-rule report (`rule`, `n_rows`, `n_fail`), not an
  * exception: pipelines gate on `n_fail = 0` or a tolerated rate, and the
  * report itself is the artifact that lands next to the data.
  *
  * NULL semantics: a row where the predicate evaluates NULL (e.g. a null
  * operand in a comparison) counts as FAILED — an unknown is not a pass;
  * rules that tolerate nulls say so explicitly (`c.isNull || ...`).
  */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  /** Evaluate all `rules` over `df` in one aggregation. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    // coalesce(sum, 0): on an empty input sum() aggregates to NULL — an
    // empty table is a legitimate contract-check input and must report
    // n_rows=0 / n_fail=0, not NPE on getLong.
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r =>
        coalesce(sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"__f_${r.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val vals = row.head()
    val total = vals.getLong(0)
    rules.zipWithIndex
      .map { case (r, i) => (r.name, total, vals.getLong(i + 1)) }
      .toDF("rule", "n_rows", "n_fail")
  }

  /** Referential integrity as a report row: child rows whose key tuple has
    * no parent (left anti join — the count a FK constraint would enforce).
    * Composes with [[validate]] by unionByName.
    */
  def validateFk(
      name: String,
      child: DataFrame,
      parent: DataFrame,
      keys: Seq[(String, String)]
  ): DataFrame = {
    require(keys.nonEmpty, "no key columns")
    val cond = keys.map { case (ck, pk) => child(ck) === parent(pk) }.reduce(_ && _)
    val spark = child.sparkSession
    import spark.implicits._
    val total   = child.count()
    val orphans = child.join(parent, cond, "left_anti").count()
    Seq((name, total, orphans)).toDF("rule", "n_rows", "n_fail")
  }
}
