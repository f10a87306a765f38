package graft.sinks

import org.slf4j.LoggerFactory

import java.sql.{Connection, DatabaseMetaData}
import scala.collection.mutable

/** A deferrable FK constraint on the TARGET database, carrying its original
  * deferrability state so it can be restored after the write.
  */
case class DeferrableConstraint(
    schema: String,
    table: String,
    name: String,
    deferrable: Boolean,
    initiallyDeferred: Boolean
)

/** Brackets a write with constraint deferral — the orchestration the
  * reference performs around each self-referencing table copy
  * (simple-anonymizer/src/scala/simpleanonymizer/ConstraintDeferrer.scala:23-88,
  * invoked from TableCopier.scala:66-68). Rows of a hierarchy arrive in
  * arbitrary partition order, so a child can land before its parent; with
  * the FK deferred, PostgreSQL checks at COMMIT instead of per row.
  *
  * Contract (matching the reference):
  *   - an empty constraint list runs the body with zero ALTER round-trips;
  *   - failing to DEFER is fatal (surfaced with the PostgreSQL 9.4+ hint —
  *     `ALTER TABLE .. ALTER CONSTRAINT` does not exist before that);
  *   - failing to RESTORE is logged and swallowed — it must never mask the
  *     body's own outcome (the copy already succeeded or failed on its own).
  *
  * SQL execution is injected (`execSql`) so the lifecycle is unit-testable
  * without a PostgreSQL instance; [[ConstraintDeferrer.onConnection]] binds
  * it to a live JDBC connection.
  */
class ConstraintDeferrer(execSql: String => Unit) {
  private val logger = LoggerFactory.getLogger(getClass)

  def withDeferred[T](constraints: Seq[DeferrableConstraint])(body: => T): T = {
    val distinct = constraints.distinct
    if (distinct.isEmpty) body
    else {
      logger.info(
        "Deferring constraints for {}: {}",
        distinct.map(_.table).distinct.mkString(", "),
        distinct.map(_.name).mkString(", ")
      )
      try distinct.foreach(c => execSql(SinkSql.deferConstraint(c.schema, c.table, c.name)))
      catch {
        case e: Exception =>
          throw new RuntimeException(
            s"Failed to make constraints deferrable on ${distinct.map(_.table).distinct.mkString(", ")}. " +
              "ALTER TABLE ... ALTER CONSTRAINT requires PostgreSQL 9.4+.",
            e
          )
      }
      try body
      finally distinct.foreach { c =>
        try execSql(SinkSql.restoreConstraint(c.schema, c.table, c.name, c.deferrable, c.initiallyDeferred))
        catch { case e: Exception => logger.warn(s"Failed to restore constraint ${c.name}", e) }
      }
    }
  }
}

object ConstraintDeferrer {

  /** Bind the ALTER lifecycle to a live connection (one statement per ALTER). */
  def onConnection(conn: Connection): ConstraintDeferrer =
    new ConstraintDeferrer(sql => {
      val st = conn.createStatement()
      try st.executeUpdate(sql)
      finally st.close()
    })

  /** Discover `table`'s SELF-REFERENCING FK constraints (the ones a
    * partition-ordered write can transiently violate) from JDBC metadata,
    * including each constraint's current deferrability so restore is exact.
    */
  def selfRefConstraints(conn: Connection, schema: String, table: String): Seq[DeferrableConstraint] = {
    val seen = mutable.LinkedHashSet.empty[DeferrableConstraint]
    val rs   = conn.getMetaData.getImportedKeys(null, schema, table)
    try while (rs.next()) {
      val parent = rs.getString("PKTABLE_NAME")
      val name   = rs.getString("FK_NAME")
      if (parent == table && name != null) {
        val d = rs.getShort("DEFERRABILITY")
        seen += DeferrableConstraint(
          schema,
          table,
          name,
          deferrable = d != DatabaseMetaData.importedKeyNotDeferrable,
          initiallyDeferred = d == DatabaseMetaData.importedKeyInitiallyDeferred
        )
      }
    } finally rs.close()
    seen.toSeq
  }
}
