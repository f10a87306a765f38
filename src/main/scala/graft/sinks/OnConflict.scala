package graft.sinks

/** Upsert behavior for JDBC sinks — mirrors the reference ADT
  * (simple-anonymizer/src/scala/simpleanonymizer/OnConflict.scala:7-44).
  * Only meaningful when writing to a database; parquet/lake sinks ignore it.
  */
case class OnConflict(target: OnConflict.ConflictTarget, action: OnConflict.Action)

object OnConflict {
  sealed trait Action
  object Action {

    /** ON CONFLICT DO NOTHING — skip conflicting rows without error. */
    case object DoNothing extends Action

    /** ON CONFLICT DO UPDATE — update conflicting rows.
      * @param updateColumns columns to update; None → all non-target columns.
      */
    case class DoUpdate(updateColumns: Option[Set[String]] = None) extends Action
  }

  sealed trait ConflictTarget
  object ConflictTarget {

    /** Primary-key columns (resolved from catalog metadata at write time). */
    case object PrimaryKey extends ConflictTarget

    /** Explicit conflict-target column list. */
    case class Columns(columns: Seq[String]) extends ConflictTarget

    /** A named unique constraint. */
    case class Constraint(name: String) extends ConflictTarget
  }

  def doNothing: OnConflict = OnConflict(ConflictTarget.PrimaryKey, Action.DoNothing)

  // head +: tail varargs: `doNothing()` with empty parens must not resolve
  // to Columns(Nil) — that renders invalid SQL `ON CONFLICT () ...` at write
  // time instead of the PrimaryKey target the no-paren form gives.
  def doNothing(targetColumn: String, moreColumns: String*): OnConflict =
    OnConflict(ConflictTarget.Columns(targetColumn +: moreColumns), Action.DoNothing)
  def doUpdate: OnConflict = OnConflict(ConflictTarget.PrimaryKey, Action.DoUpdate())
  def doUpdate(targetColumn: String, moreColumns: String*): OnConflict =
    OnConflict(ConflictTarget.Columns(targetColumn +: moreColumns), Action.DoUpdate())
  def doUpdate(targetColumns: Seq[String], updateColumns: Set[String]): OnConflict =
    OnConflict(ConflictTarget.Columns(targetColumns), Action.DoUpdate(Some(updateColumns)))
}
