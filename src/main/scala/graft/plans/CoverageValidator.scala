package graft.plans

import graft.dsl.TableSpec
import org.slf4j.LoggerFactory

/** Coverage gate run before any data moves: every non-skipped catalog table
  * must have a spec, and every source column must be accounted for once
  * PK/FK passthrough is merged in. Error messages carry ready-to-paste DSL
  * stubs so the fix is a copy, not a scavenger hunt — the same developer
  * experience as the reference's validator
  * (simple-anonymizer/src/scala/simpleanonymizer/CoverageValidator.scala:28-108),
  * here synchronous and manifest-driven (the catalog is already discovered;
  * no Future-returning metadata context to thread through).
  */
object CoverageValidator {
  private val logger = LoggerFactory.getLogger(getClass)

  /** Columns a spec must mention explicitly for `tableName`: the schema
    * minus PK and FK columns, which the planner passes through on its own.
    */
  def getDataColumns(tableName: String, manifest: SchemaManifest, schemas: Map[String, Seq[String]]): Seq[String] = {
    val keyish =
      manifest.pks.getOrElse(tableName, Seq.empty).toSet ++
        manifest.fkColumnsByTable.getOrElse(tableName, Set.empty)
    schemas.getOrElse(tableName, Seq.empty).filterNot(keyish)
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
    reportSpecless(tableNames, skippedTables, tableSpecs.keySet, manifest, schemas)
    reportUncovered(tableSpecs.view.filterKeys(!skippedTables.contains(_)).toMap, schemas)
    logger.info("Coverage validation passed.")
  }

  /** Tables with neither a spec nor a skip entry abort planning; the error
    * embeds one pasteable all-passthrough spec per table plus the skip-set
    * alternative.
    */
  private def reportSpecless(
      tableNames: Seq[String],
      skippedTables: Set[String],
      specced: Set[String],
      manifest: SchemaManifest,
      schemas: Map[String, Seq[String]]
  ): Unit = {
    val specless = tableNames.filter(t => !skippedTables(t) && !specced(t))
    if (specless.nonEmpty) {
      val stubs = specless.map(t => generateTableSnippet(t, getDataColumns(t, manifest, schemas)))
      throw new IllegalArgumentException(
        Seq(
          s"${specless.size} table(s) have no spec.",
          "Either give each one a spec in plan(...)/run(...):",
          stubs.mkString(",\n\n"),
          "or exclude them: new Graft(..., skippedTables = Set(" +
            specless.map("\"" + _ + "\"").mkString(", ") + "))"
        ).mkString("", "\n\n", "\n")
      )
    }
  }

  /** Specs that leave source columns unbound abort planning; each table's
    * error lists pasteable `row.<col>` bindings for exactly the gap.
    */
  private def reportUncovered(tableSpecs: Map[String, TableSpec], schemas: Map[String, Seq[String]]): Unit = {
    val gaps = tableSpecs.toSeq.flatMap { case (tableName, spec) =>
      spec.validateCovers(schemas.getOrElse(tableName, Seq.empty).toSet) match {
        case Left(missing) => Some(tableName -> missing)
        case Right(_)      => None
      }
    }
    if (gaps.nonEmpty) {
      val perTable = gaps.map { case (tableName, missing) =>
        s"Table '$tableName' has ${missing.size} unhandled column(s); add the bindings:\n" +
          s"      ${generateColumnSnippets(missing)}"
      }
      throw new IllegalArgumentException(
        s"Specs for ${gaps.size} table(s) leave source columns unhandled.\n\n" +
          perTable.mkString("\n\n") + "\n"
      )
    }
  }

  /** All-passthrough spec stub for an uncovered table — a valid expression
    * of THIS library's DSL, one `row.<col>` line per data column.
    */
  def generateTableSnippet(tableName: String, columns: Seq[String]): String = {
    val sb = new StringBuilder
    sb ++= "\"" ++= tableName ++= "\" -> TableSpec.select { row =>\n    Seq(\n"
    sb ++= columns.map("      row." + _).mkString(",\n")
    sb ++= "\n    )\n  }"
    sb.result()
  }

  /** Pasteable bindings for a set of missing columns, sorted so the same
    * gap always renders the same text.
    */
  def generateColumnSnippets(columns: Set[String]): String =
    columns.toSeq.sorted.map("row." + _).mkString(",\n      ")
}
