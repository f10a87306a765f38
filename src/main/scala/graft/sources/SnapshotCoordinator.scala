package graft.sources

import org.slf4j.LoggerFactory

import java.sql.Connection

/** Exports a point-in-time snapshot of a live source database and keeps it
  * valid for the duration of a multi-table read — the coordinator half of
  * reference G6 (simple-anonymizer/src/scala/simpleanonymizer/
  * DbCopier.scala:130-160). [[JdbcCatalog.withSnapshot]] is the worker
  * half: it imports the exported id into every partition read's session.
  *
  * Mechanics (PostgreSQL): a dedicated connection opens a REPEATABLE READ
  * transaction and runs `SELECT pg_export_snapshot()`. The returned id is
  * importable by other sessions (`SET TRANSACTION SNAPSHOT '<id>'`) only
  * while this coordinator transaction stays open — so the coordinator must
  * be closed AFTER the copy completes, never before. `export` hands back an
  * AutoCloseable holding the connection; `withSnapshot` brackets it.
  *
  * The export statement is injectable so the lifecycle (held transaction,
  * isolation level, cleanup on failure) is testable against embedded
  * databases that lack `pg_export_snapshot`.
  */
final class SnapshotCoordinator private (conn: Connection, val snapshotId: String) extends AutoCloseable {
  private val logger = LoggerFactory.getLogger(getClass)

  /** Ends the coordinator transaction, invalidating the snapshot for any
    * session that has not yet imported it. Never throws.
    */
  override def close(): Unit = {
    try conn.rollback()
    catch { case e: Exception => logger.warn("Snapshot coordinator rollback failed", e) }
    try conn.close()
    catch { case e: Exception => logger.warn("Snapshot coordinator close failed", e) }
  }
}

object SnapshotCoordinator {
  private val logger = LoggerFactory.getLogger(getClass)

  /** PostgreSQL's snapshot-export call. */
  val PgExportSnapshotSql = "SELECT pg_export_snapshot()"

  /** Open the coordinator transaction and export a snapshot id. The caller
    * owns the returned coordinator and must `close()` it after all reads
    * that import the snapshot have finished.
    */
  def export(connect: () => Connection, exportSql: String = PgExportSnapshotSql): SnapshotCoordinator = {
    val conn = connect()
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(Connection.TRANSACTION_REPEATABLE_READ)
      val st = conn.createStatement()
      val id =
        try {
          val rs = st.executeQuery(exportSql)
          try { rs.next(); rs.getString(1) }
          finally rs.close()
        } finally st.close()
      logger.info("Exported snapshot: {}", id)
      new SnapshotCoordinator(conn, id)
    } catch {
      case e: Exception =>
        try conn.close()
        catch { case _: Exception => () }
        throw e
    }
  }

  /** Bracket form: export, run `body` with the snapshot id (e.g. build a
    * [[JdbcCatalog.withSnapshot]] property set and read every table), then
    * close the coordinator whatever the outcome.
    */
  def withSnapshot[T](connect: () => Connection, exportSql: String = PgExportSnapshotSql)(body: String => T): T = {
    val coordinator = export(connect, exportSql)
    try body(coordinator.snapshotId)
    finally coordinator.close()
  }
}
