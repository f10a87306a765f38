package graft.sources

import graft.plans.{LogicalFK, SchemaManifest}
import graft.sinks.Ident
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Connection
import java.util.Properties
import scala.collection.mutable

/** JDBC source support: schema/key discovery from database metadata and
  * partitioned table reads — the analogue of the reference's `DbContext`
  * catalog layer (simple-anonymizer/src/scala/simpleanonymizer/
  * DbContext.scala:19-142), feeding the same planner.
  *
  * Scale note: the reference reads each table on a single server-side
  * cursor (CopyAction.scala:135-142 — intra-table parallelism 1). Here a
  * numeric `PartitionSpec` maps to Spark's partitioned JDBC scan
  * (`partitionColumn/lowerBound/upperBound/numPartitions`), so one table
  * is read by N concurrent range queries.
  *
  * Snapshot consistency (reference G6, `pg_export_snapshot`): immutable
  * lake sources need nothing; for live databases, open the coordinator
  * transaction externally and pass `sessionInitStatement` (e.g.
  * `SET TRANSACTION SNAPSHOT '...'`) via `connectionProperties` so every
  * partition read joins the same snapshot.
  */
object JdbcCatalog {

  /** Numeric-range partitioning for a table scan. */
  case class PartitionSpec(column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

  /** A sequence backing a table column (SERIAL / IDENTITY), discovered so
    * post-copy [[graft.sinks.SinkSql.sequenceReset]] can realign it with
    * the copied data (reference DbContext.scala:81-101 + TableCopier
    * setval semantics).
    */
  case class SequenceInfo(table: String, column: String, sequence: String)

  /** PostgreSQL discovery query for sequence-backed columns. Uses the
    * documented `pg_get_serial_sequence` accessor over
    * `information_schema.columns` (covers SERIAL's `nextval(...)` defaults
    * and `GENERATED AS IDENTITY`); the schema binds to every `?`. Returns
    * (table, column, qualified sequence name).
    */
  val PgSequenceDiscoverySql: String =
    """SELECT c.table_name, c.column_name,
      |  pg_get_serial_sequence(quote_ident(c.table_schema) || '.' || quote_ident(c.table_name), c.column_name) AS seq_name
      |FROM information_schema.columns c
      |WHERE c.table_schema = ?
      |  AND (c.column_default LIKE 'nextval(%' OR c.is_identity = 'YES')""".stripMargin

  /** Run a sequence-discovery query (the PG one by default; injectable for
    * other dialects/tests). Every `?` placeholder is bound to `schema`;
    * rows with a NULL sequence name are dropped.
    */
  def discoverSequences(
      conn: Connection,
      schema: String,
      query: String = PgSequenceDiscoverySql
  ): Seq[SequenceInfo] = {
    val stmt = conn.prepareStatement(query)
    try {
      (1 to stmt.getParameterMetaData.getParameterCount).foreach(stmt.setString(_, schema))
      val rs  = stmt.executeQuery()
      val out = mutable.ArrayBuffer.empty[SequenceInfo]
      try while (rs.next()) {
        val seq = rs.getString(3)
        if (seq != null) out += SequenceInfo(rs.getString(1), rs.getString(2), seq)
      } finally rs.close()
      out.toSeq
    } finally stmt.close()
  }

  /** Connection properties that pin every partition read to a previously
    * exported PostgreSQL snapshot (reference G6: the coordinator runs
    * `SELECT pg_export_snapshot()` in an open REPEATABLE READ transaction;
    * each worker session imports it before reading — reference
    * DbCopier.scala:130-145 / CopyAction.scala:131-139).
    */
  def withSnapshot(base: Properties, snapshotId: String): Properties = {
    val p = new Properties()
    p.putAll(base)
    p.setProperty(
      "sessionInitStatement",
      s"BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; SET TRANSACTION SNAPSHOT '${snapshotId.replace("'", "''")}'"
    )
    p
  }

  /** @param where optional SOURCE-dialect predicate text pushed into the
    *   scan as a derived-table subquery — the warehouse filters before a
    *   single row crosses the wire (at 100-TB sources, shipping the table
    *   to Spark and filtering there wastes the whole transfer). Use
    *   [[SourceSql]] to render the engine's propagated filters in the
    *   reference's PostgreSQL dialect.
    */
  def readTable(
      spark: SparkSession,
      url: String,
      connectionProperties: Properties,
      schema: String,
      table: String,
      partitioning: Option[PartitionSpec] = None,
      where: Option[String] = None
  ): DataFrame = {
    val qualified = Ident.quoteQualified(schema, table)
    val relation  = where.fold(qualified)(w => s"(SELECT * FROM $qualified WHERE $w) AS g_src")
    partitioning match {
      case Some(p) =>
        spark.read.jdbc(url, relation, p.column, p.lowerBound, p.upperBound, p.numPartitions, connectionProperties)
      case None =>
        spark.read.jdbc(url, relation, connectionProperties)
    }
  }

  /** Discover tables, primary keys, and logical (composite-grouped)
    * foreign keys from `DatabaseMetaData` — reference DbContext grouping
    * semantics: FK rows sharing a constraint name merge into one
    * [[LogicalFK]] with columns in KEY_SEQ order (DbContext.scala:127-142).
    */
  def manifestFromMetadata(conn: Connection, schema: String): SchemaManifest = {
    val md     = conn.getMetaData
    val tables = mutable.ArrayBuffer.empty[String]
    val rsT    = md.getTables(null, schema, "%", Array("TABLE"))
    try while (rsT.next()) tables += rsT.getString("TABLE_NAME")
    finally rsT.close()

    val pks = tables.map { t =>
      val cols = mutable.ArrayBuffer.empty[(Short, String)]
      val rs   = md.getPrimaryKeys(null, schema, t)
      try while (rs.next()) cols += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
      finally rs.close()
      t -> cols.sortBy(_._1).map(_._2).toSeq
    }.filter(_._2.nonEmpty).toMap

    val fks = tables.flatMap { t =>
      case class FkRow(name: String, pkTable: String, seq: Short, fkCol: String, pkCol: String)
      val rows = mutable.ArrayBuffer.empty[FkRow]
      val rs   = md.getImportedKeys(null, schema, t)
      try while (rs.next()) rows += FkRow(
        rs.getString("FK_NAME"),
        rs.getString("PKTABLE_NAME"),
        rs.getShort("KEY_SEQ"),
        rs.getString("FKCOLUMN_NAME"),
        rs.getString("PKCOLUMN_NAME")
      )
      finally rs.close()
      rows
        .groupBy(r => (r.name, r.pkTable))
        .toSeq
        .sortBy(_._1._1)
        .map { case ((name, pkTable), rs) =>
          LogicalFK(name, t, pkTable, rs.sortBy(_.seq).map(r => r.fkCol -> r.pkCol).toSeq)
        }
    }.toSeq

    SchemaManifest(tables.toSeq.sorted, pks, fks)
  }

  /** Full catalog: one (optionally partitioned) frame per manifest table. */
  def catalog(
      spark: SparkSession,
      url: String,
      connectionProperties: Properties,
      schema: String,
      manifest: SchemaManifest,
      partitioning: Map[String, PartitionSpec] = Map.empty
  ): Map[String, DataFrame] =
    manifest.tables
      .map(t => t -> readTable(spark, url, connectionProperties, schema, t, partitioning.get(t)))
      .toMap
}
