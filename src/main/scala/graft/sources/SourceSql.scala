package graft.sources

import graft.plans.LogicalFK
import graft.sinks.Ident

/** Source-dialect (PostgreSQL) WHERE-text rendering of the engine's
  * filter propagation — the pushdown twin of the DataFrame planner in
  * [[graft.plans.FilterPropagation]].
  *
  * The planner applies propagated filters as semi-joins AFTER the scan;
  * against a live warehouse that means transferring the unfiltered table
  * first. These builders render the SAME predicates as SQL text for
  * [[JdbcCatalog.readTable]]'s `where` parameter, so the warehouse
  * filters at its own scan and only qualifying rows cross the wire.
  *
  * The emitted text is pinned BYTE-EQUAL to the reference engine's
  * published expected strings (its test goldens) in
  * `ReferenceSqlParitySpec` — the offline defense against dialect typos
  * that this environment cannot catch with a live PostgreSQL. Reference:
  * simple-anonymizer/src/scala/simpleanonymizer/FilterPropagation.scala:18-52,
  * tests/src/scala/simpleanonymizer/FilterPropagationTest.scala:37,82-107.
  */
object SourceSql {

  /** An AND-list of predicate strings. One clause renders bare; several
    * render individually parenthesized and ANDed — exactly the reference's
    * `WhereClause.Single` / `WhereClause.Multiple` rendering
    * (reference TableSpec.scala:47-70).
    */
  final case class Pred(head: String, tail: Seq[String] = Nil) {
    def clauses: Seq[String] = head +: tail
    def sql: String =
      if (tail.isEmpty) head else clauses.map("(" + _ + ")").mkString(" AND ")
    def and(other: Pred): Pred = Pred(head, tail ++ other.clauses)
  }

  object Pred {
    def combine(a: Option[Pred], b: Option[Pred]): Option[Pred] = (a, b) match {
      case (None, None)       => None
      case (None, some)       => some
      case (some, None)       => some
      case (Some(x), Some(y)) => Some(x.and(y))
    }
  }

  /** `col IN (...)` for single keys, `(c1, c2) IN (...)` for composite. */
  private def inSubquery(cols: Seq[String], subquery: String): String = {
    val lhs = if (cols.size == 1) cols.head else cols.mkString("(", ", ", ")")
    s"$lhs IN ($subquery)"
  }

  /** Cross-table propagation step: restrict the child to rows whose FK
    * points at a parent row passing `parentPred`.
    */
  def fkInSubquery(fk: LogicalFK, parentPred: Pred, qualify: String => String = Ident.quote): Pred = {
    val fkCols = fk.fkColumns.map(Ident.quote)
    val pkCols = fk.pkColumns.map(Ident.quote)
    val sub    = s"SELECT ${pkCols.mkString(", ")} FROM ${qualify(fk.parentTable)} WHERE ${parentPred.sql}"
    Pred(inSubquery(fkCols, sub))
  }

  /** Self-referencing FK: transitive closure of rows reachable from
    * fk-null roots through the self-ref chain, restricted to `basePred` at
    * every hop — rendered as a recursive CTE inside an IN predicate, with
    * an IS NULL escape for the roots themselves. The SQL twin of
    * [[graft.plans.SelfRefClosure.filterReachable]].
    */
  def selfRefClosure(fk: LogicalFK, basePred: Pred, qualify: String => String = Ident.quote): Pred = {
    val table     = qualify(fk.childTable)
    val fkCols    = fk.fkColumns.map(Ident.quote)
    val pkCols    = fk.pkColumns.map(Ident.quote)
    val cteName   = s"_reachable_${fk.childTable}"
    val cteCols   = fk.pkColumns.map(c => Ident.quote(s"_r_$c"))
    val colList   = cteCols.mkString(", ")
    val nullCheck = fkCols.map(c => s"$c IS NULL").mkString(" AND ")
    val joinCond  = fkCols.zip(cteCols).map { case (fc, cc) => s"t.$fc = r.$cc" }.mkString(" AND ")
    val base      = s"SELECT ${pkCols.mkString(", ")} FROM $table WHERE (${basePred.sql}) AND $nullCheck"
    val step      = s"SELECT ${pkCols.map(c => s"t.$c").mkString(", ")} FROM $table t JOIN $cteName r ON $joinCond WHERE (${basePred.sql})"
    val cte       = s"WITH RECURSIVE $cteName($colList) AS ($base UNION $step) SELECT $colList FROM $cteName"
    Pred(s"($nullCheck OR ${inSubquery(fkCols, cte)})")
  }

  /** Propagate explicit filters through the FK graph as WHERE text, one
    * pass over `tables` in topological order (parents first) — same walk
    * as the DataFrame planner ([[graft.plans.FilterPropagation
    * .computeFilteredTables]]): each table's cross-ref FKs contribute an
    * IN-subquery against the parent's EFFECTIVE (explicit + propagated)
    * filter; each self-ref FK contributes a recursive-CTE closure over the
    * table's own base filter. Returns only the PROPAGATED clauses —
    * explicit filters participate but are not repeated (callers AND them
    * back themselves), matching the reference contract.
    */
  /** [[propagate]] for sources WITHOUT recursive-CTE support (Derby and
    * several warehouses): cross-ref IN-subqueries still render and push,
    * but a self-ref closure cannot be expressed as one WHERE there — so
    * instead of emitting SQL the source will reject, each affected table
    * comes back in the second map with its self-ref FKs, and the caller
    * runs the ENGINE-side iterative closure
    * ([[graft.plans.SelfRefClosure.filterReachable]]) on the
    * already-pushed-down read: the warehouse still filters the explicit +
    * cross-ref predicates before rows cross the wire, and only the
    * reachability fixpoint (whose frontier is the filtered subset, not
    * the table) runs in Spark. Same split the DataFrame planner uses —
    * pushdown degrades per-CLAUSE, never per-table.
    *
    * SOUNDNESS: when an ANCESTOR table needed an engine-side closure, a
    * descendant's pushed IN-subquery references the ancestor's explicit +
    * cross-ref filter only — a SUPERSET of its true subset. The pushed
    * text is therefore always a sound over-approximation (never drops a
    * qualifying row); the engine's semi-join plan stays authoritative for
    * exactness, exactly as with every other pushdown.
    *
    * @return (pushable WHERE text per table, self-ref FKs needing the
    *         engine-side closure per table)
    */
  def propagatePushable(
      tables: Seq[String],
      fks: Seq[LogicalFK],
      qualify: String => String = Ident.quote
  )(explicit: String => Option[Pred]): (Map[String, Pred], Map[String, Seq[LogicalFK]]) = {
    val byChild = fks.groupBy(_.childTable).withDefaultValue(Seq.empty)
    tables.foldLeft((Map.empty[String, Pred], Map.empty[String, Seq[LogicalFK]])) {
      case ((acc, closures), table) =>
        val (selfRef, crossRef) = byChild(table).partition(_.isSelfRef)
        val crossPred = crossRef.foldLeft(Option.empty[Pred]) { (p, fk) =>
          val parentEffective = Pred.combine(explicit(fk.parentTable), acc.get(fk.parentTable))
          Pred.combine(p, parentEffective.map(pe => fkInSubquery(fk, pe, qualify)))
        }
        val basePred = Pred.combine(explicit(table), crossPred)
        val needsClosure = if (basePred.nonEmpty && selfRef.nonEmpty) closures + (table -> selfRef) else closures
        (acc ++ crossPred.map(table -> _), needsClosure)
    }
  }

  def propagate(
      tables: Seq[String],
      fks: Seq[LogicalFK],
      qualify: String => String = Ident.quote
  )(explicit: String => Option[Pred]): Map[String, Pred] = {
    val byChild = fks.groupBy(_.childTable).withDefaultValue(Seq.empty)
    tables.foldLeft(Map.empty[String, Pred]) { (acc, table) =>
      val (selfRef, crossRef) = byChild(table).partition(_.isSelfRef)
      val crossPred = crossRef.foldLeft(Option.empty[Pred]) { (p, fk) =>
        val parentEffective = Pred.combine(explicit(fk.parentTable), acc.get(fk.parentTable))
        Pred.combine(p, parentEffective.map(pe => fkInSubquery(fk, pe, qualify)))
      }
      val basePred = Pred.combine(explicit(table), crossPred)
      val withSelf = selfRef.foldLeft(crossPred) { (p, fk) =>
        Pred.combine(p, basePred.map(selfRefClosure(fk, _, qualify)))
      }
      acc ++ withSelf.map(table -> _)
    }
  }
}
