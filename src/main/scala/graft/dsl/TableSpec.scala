package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

import scala.language.dynamics

/** Per-table copy/transform specification — the "plan IR" of the DSL.
  *
  * Mirrors the reference surface (simple-anonymizer/src/scala/simpleanonymizer/
  * TableSpec.scala:18-82): a projection with per-column transformations, an
  * AND-tree of WHERE clauses, an optional top-N limit, a batch size and an
  * upsert strategy (the latter two only meaningful for JDBC sinks).
  * Compilation targets a declarative DataFrame pipeline so Catalyst gets
  * predicate pushdown / column pruning for free.
  */
case class TableSpec(
    columns: Seq[OutputColumn],
    whereClause: Option[TableSpec.WhereClause] = None,
    limit: Option[Int] = None,
    batchSize: Int = 5000,
    onConflict: Option[graft.sinks.OnConflict] = None
) {
  private[graft] val columnNames: Seq[String] = columns.map(_.name)

  private[graft] def validateCovers(expectedColumns: Set[String]): Either[Set[String], Unit] = {
    val missing = expectedColumns -- columnNames
    if (missing.isEmpty) Right(()) else Left(missing)
  }

  /** Add a WHERE clause (Spark SQL expression string). Multiple calls AND —
    * reference TableSpec.scala:33-34.
    */
  def where(whereClause: String): TableSpec =
    copy(whereClause = TableSpec.WhereClause.combine(this.whereClause, Some(TableSpec.WhereClause.Single(whereClause))))

  /** Limit rows; iff an `id` column is in the spec the limit is most-recent-N
    * (ORDER BY id DESC) — reference TableSpec.scala:37 + CopyAction.scala:77-83.
    * Spark plans this as TakeOrderedAndProject (top-k, no global sort).
    */
  def withLimit(n: Int): TableSpec = copy(limit = Some(n))

  /** INSERT batch size for JDBC sinks — reference TableSpec.scala:22 (default 5000). */
  def withBatchSize(n: Int): TableSpec = copy(batchSize = n)

  /** Upsert strategy for JDBC sinks — reference TableSpec.scala:43. */
  def onConflict(strategy: graft.sinks.OnConflict): TableSpec = copy(onConflict = Some(strategy))

  /** Compile this spec against a source frame: WHERE → (optional top-N) →
    * projection with transforms. Filters run BEFORE transforms, matching the
    * reference's source-side SELECT (CopyAction.scala:77-84) — and letting
    * Catalyst push them into the scan.
    */
  def compile(df: DataFrame): DataFrame = {
    val filtered = whereClause.map(w => df.where(w.toCondition)).getOrElse(df)
    val limited = limit match {
      case Some(n) if columnNames.contains("id") => filtered.orderBy(col("id").desc).limit(n)
      case Some(n)                               => filtered.limit(n)
      case None                                  => filtered
    }
    limited.select(columns.map(_.toColumn(df)): _*)
  }
}

object TableSpec {

  /** AND-tree of predicate expressions — reference TableSpec.scala:47-70.
    * Leaves are Spark SQL strings or prebuilt Columns (the planner's
    * semi-join rewrites produce Columns).
    */
  sealed trait WhereClause {
    def toCondition: Column
    def and(other: WhereClause): WhereClause = WhereClause.And(this, other)
    final def and(other: String): WhereClause = and(WhereClause.Single(other))
  }

  object WhereClause {
    /** A raw SQL predicate string, parsed by Spark's expression parser. */
    case class Single(sql: String) extends WhereClause {
      override def toCondition: Column = expr(sql)
    }

    /** A predicate already built as a Catalyst Column. */
    case class Cond(condition: Column) extends WhereClause {
      override def toCondition: Column = condition
    }

    case class And(left: WhereClause, right: WhereClause) extends WhereClause {
      override def toCondition: Column = left.toCondition && right.toCondition
    }

    def combine(a: Option[WhereClause], b: Option[WhereClause]): Option[WhereClause] = (a, b) match {
      case (None, None)       => None
      case (None, some)       => some
      case (some, None)       => some
      case (Some(x), Some(y)) => Some(x.and(y))
    }
  }

  /** Dynamic row accessor: `row.first_name` → SourceColumn("first_name") —
    * reference TableSpec.scala:73-75.
    */
  final class Row extends Dynamic {
    def selectDynamic(name: String): OutputColumn.SourceColumn = OutputColumn.SourceColumn(name)
  }

  /** Entry point: `TableSpec.select { row => Seq(...) }` — reference TableSpec.scala:78-81. */
  def select(f: Row => Seq[OutputColumn]): TableSpec = TableSpec(columns = f(new Row))
}
