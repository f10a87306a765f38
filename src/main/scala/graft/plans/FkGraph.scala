package graft.plans

import org.slf4j.LoggerFactory

import scala.annotation.tailrec

/** A logical (composite-merged) foreign key edge of the schema graph —
  * analogue of the reference's `LogicalFK`
  * (simple-anonymizer/src/scala/simpleanonymizer/DbContext.scala:127-142).
  *
  * @param columns pairs of (child fk column, parent pk column), in key order.
  */
case class LogicalFK(
    name: String,
    childTable: String,
    parentTable: String,
    columns: Seq[(String, String)]
) {
  def isSelfRef: Boolean = childTable == parentTable
  def fkColumns: Seq[String] = columns.map(_._1)
  def pkColumns: Seq[String] = columns.map(_._2)
}

/** Schema + key manifest for a catalog of tables. For JDBC sources this is
  * fetched from database metadata; for lake sources it's supplied by the
  * caller (immutable files carry no FK catalog).
  */
case class SchemaManifest(
    tables: Seq[String],
    pks: Map[String, Seq[String]] = Map.empty,
    fks: Seq[LogicalFK] = Nil
) {
  /** All FK columns per child table — analogue of DbContext.fkColumnsByTable. */
  lazy val fkColumnsByTable: Map[String, Set[String]] =
    fks.groupBy(_.childTable).view.mapValues(_.flatMap(_.fkColumns).toSet).toMap
}

/** FK-topological table leveling — semantics mirrored from the reference
  * (simple-anonymizer/src/scala/simpleanonymizer/TableSorter.scala:29-101):
  * level 0 = no dependencies; level N depends only on levels < N; self-refs
  * ignored; unresolvable (cyclic) tables are dropped with a warning; tables
  * sort alphabetically within a level for determinism.
  *
  * Driver-side planning only — the level order gates FK-constrained sink
  * writes; for lake sinks it is merely a scheduling hint.
  */
object TableSorter {
  private val logger = LoggerFactory.getLogger(getClass)

  def computeTableLevels(tables: Seq[String], fks: Seq[LogicalFK]): Map[String, Int] = {
    val tableSet = tables.toSet
    val dependencies: Map[String, Set[String]] =
      tables.map { table =>
        table -> fks
          .filter(fk => fk.childTable == table && fk.parentTable != table && tableSet.contains(fk.parentTable))
          .map(_.parentTable)
          .toSet
      }.toMap

    @tailrec
    def assignLevels(levels: Map[String, Int]): Map[String, Int] = {
      val unassigned = tables.filterNot(levels.contains)
      if (unassigned.isEmpty) levels
      else {
        val newlyAssigned = unassigned.flatMap { table =>
          val deps = dependencies(table)
          if (deps.isEmpty) Some(table -> 0)
          else if (deps.forall(levels.contains)) Some(table -> (deps.map(levels).max + 1))
          else None
        }
        if (newlyAssigned.isEmpty) {
          logger.warn(
            "Circular dependencies detected for tables: {}. These tables will not be copied.",
            unassigned.mkString(", ")
          )
          levels
        } else assignLevels(levels ++ newlyAssigned)
      }
    }

    assignLevels(Map.empty)
  }

  def groupTablesByLevel(tableLevels: Map[String, Int]): Seq[Seq[String]] =
    if (tableLevels.isEmpty) Seq.empty
    else
      (0 to tableLevels.values.max).map { level =>
        tableLevels.collect { case (table, `level`) => table }.toSeq.sorted
      }

  /** Tables grouped by dependency level, alphabetical within a level. */
  def apply(tables: Seq[String], fks: Seq[LogicalFK]): Seq[Seq[String]] =
    groupTablesByLevel(computeTableLevels(tables, fks))
}
