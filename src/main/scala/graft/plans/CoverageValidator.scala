package graft.plans

import graft.dsl.TableSpec
import org.slf4j.LoggerFactory

/** Validates that every non-skipped table has a spec and that every table
  * column is covered after PK/FK passthrough merge. Failure messages embed
  * copy-pastable DSL snippets — behavior mirrored from the reference
  * (simple-anonymizer/src/scala/simpleanonymizer/CoverageValidator.scala:28-108),
  * synchronously (no Future plumbing needed driver-side).
  */
object CoverageValidator {
  private val logger = LoggerFactory.getLogger(getClass)

  /** Columns needing explicit handling in a spec: everything but PK/FK
    * columns (those pass through automatically).
    */
  def getDataColumns(tableName: String, manifest: SchemaManifest, schemas: Map[String, Seq[String]]): Seq[String] = {
    val columns = schemas.getOrElse(tableName, Seq.empty)
    val pkCols  = manifest.pks.getOrElse(tableName, Seq.empty).toSet
    val fkCols  = manifest.fkColumnsByTable.getOrElse(tableName, Set.empty)
    columns.filterNot(c => pkCols.contains(c) || fkCols.contains(c))
  }

  private def ensureAllColumns(tableSpecs: Map[String, TableSpec], schemas: Map[String, Seq[String]]): Unit = {
    val failures = tableSpecs.toSeq
      .map { case (tableName, spec) =>
        tableName -> spec.validateCovers(schemas.getOrElse(tableName, Seq.empty).toSet)
      }
      .collect { case (tableName, Left(missing)) => (tableName, missing) }
    if (failures.nonEmpty) {
      val failureMessages = failures.map { case (tableName, missing) =>
        s"""Table '$tableName' has ${missing.size} unhandled column(s); add the bindings:
           |      ${generateColumnSnippets(missing)}""".stripMargin
      }
      throw new IllegalArgumentException(
        s"""Specs for ${failures.size} table(s) leave source columns unhandled.
           |
           |${failureMessages.mkString("\n\n")}
           |""".stripMargin
      )
    }
  }

  private def ensureAllTables(
      tableNames: Seq[String],
      skippedTables: Set[String],
      copiedTables: Set[String],
      manifest: SchemaManifest,
      schemas: Map[String, Seq[String]]
  ): Unit = {
    val missingTables = tableNames.filterNot(skippedTables.contains).filterNot(copiedTables.contains)
    if (missingTables.nonEmpty) {
      val snippets =
        missingTables.map(t => generateTableSnippet(t, getDataColumns(t, manifest, schemas)))
      val skipList = missingTables.map(t => s""""$t"""").mkString(", ")
      throw new IllegalArgumentException(
        s"""${missingTables.size} table(s) have no spec.
           |
           |Either give each one a spec in plan(...)/run(...):
           |
           |${snippets.mkString(",\n\n")}
           |
           |or exclude them: new Graft(..., skippedTables = Set($skipList))
           |""".stripMargin
      )
    }
  }

  /** Spec columns that don't exist in the source schema → fail fast —
    * reference TableCopier.scala:49-58.
    */
  def ensureKnownColumns(tableName: String, spec: TableSpec, schema: Seq[String]): Unit = {
    val unknown = spec.columnNames.filterNot(schema.contains)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"Unknown columns in spec for table '$tableName': ${unknown.mkString(", ")}. " +
          s"Available columns: ${schema.mkString(", ")}"
      )
  }

  def validate(
      tableNames: Seq[String],
      skippedTables: Set[String],
      tableSpecs: Map[String, TableSpec],
      manifest: SchemaManifest,
      schemas: Map[String, Seq[String]]
  ): Unit = {
    ensureAllTables(tableNames, skippedTables, tableSpecs.keySet, manifest, schemas)
    ensureAllColumns(tableSpecs.view.filterKeys(!skippedTables.contains(_)).toMap, schemas)
    logger.info("Coverage validation passed.")
  }

  /** Copy-pastable spec snippet for an uncovered table — the snippet is a
    * valid expression of THIS library's DSL, one passthrough binding per
    * data column (same developer experience the reference provides).
    */
  def generateTableSnippet(tableName: String, columns: Seq[String]): String = {
    val body = columns.map(c => s"      row.$c").mkString(",\n")
    s""""$tableName" -> TableSpec.select { row =>\n    Seq(\n$body\n    )\n  }"""
  }

  /** Copy-pastable bindings for missing columns, sorted for determinism. */
  def generateColumnSnippets(columns: Set[String]): String =
    columns.toSeq.sorted.map(c => s"row.$c").mkString(",\n      ")
}
