package graft.dsl

import graft.functions.Lens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, udf}

import scala.language.dynamics

/** The per-column "expression IR" of the spec DSL.
  *
  * Shape mirrored from the reference
  * (simple-anonymizer/src/scala/simpleanonymizer/OutputColumn.scala:6-77), but
  * compiled to Catalyst [[Column]] expressions instead of per-row closures:
  * passthrough → `col(name)` (native type preserved, no string round-trip),
  * transform → a deterministic string UDF, fixed → `lit(value)` (folded at
  * plan time). The reference's dual objects/strings row representation
  * disappears — Spark columns keep native types.
  */
sealed trait OutputColumn {
  def name: String

  /** Compile to a Catalyst expression against the source frame's schema. */
  private[graft] def toColumn(df: DataFrame): Column
}

object OutputColumn {

  /** A JSON array-element field with a transformation attached (DSL carrier). */
  final class JsonFieldTransformed(val fieldName: String, val f: String => String)

  /** Reference to a field of a JSON array element. */
  final class JsonFieldRef(val fieldName: String) {
    def mapString(f: String => String): JsonFieldTransformed = new JsonFieldTransformed(fieldName, f)
  }

  /** Dynamic accessor inside `mapJsonArray { el => el.someField.mapString(...) }`. */
  final class JsonObject extends Dynamic {
    def selectDynamic(fieldName: String): JsonFieldRef = new JsonFieldRef(fieldName)
  }

  /** Passthrough source column; also the builder for transformed variants —
    * reference OutputColumn.scala:30-56.
    */
  case class SourceColumn(name: String) extends OutputColumn {

    /** Apply `f` to non-null values; nulls are never passed to `f` —
      * reference OutputColumn.scala:33-35. When `f` is one of the library
      * scrubbers, the column compiles to the native codegen'd [[graft.functions.Scrub]]
      * expression instead of a UDF (identical semantics — the expression
      * calls the same kernel singleton). Parameterless kinds are
      * recognized by kernel identity; [[graft.functions.Anonymizer.PartialRedact]]
      * structurally, its edge widths riding along as plan-time constants.
      */
    def mapString(f: String => String): TransformedColumn = f match {
      case pr: graft.functions.Anonymizer.PartialRedact =>
        TransformedColumn(name, Lens.Direct, opt => opt.map(f),
          Some(graft.functions.ScrubKernel.PartialRedactKind),
          Seq(pr.showFirst, pr.showLast))
      case _ =>
        TransformedColumn(name, Lens.Direct, opt => opt.map(f),
          graft.functions.ScrubKernel.kindOf(f))
    }

    /** Explicit null handling: `f` sees None for SQL NULL and may produce a
      * value for it — reference OutputColumn.scala:37-38.
      */
    def mapOptString(f: Option[String] => Option[String]): TransformedColumn =
      TransformedColumn(name, Lens.Direct, f)

    /** Transform field `x` of every element of a JSON array column —
      * reference OutputColumn.scala:41-46.
      */
    def mapJsonArray(f: JsonObject => JsonFieldTransformed): TransformedColumn = {
      val ft = f(new JsonObject)
      TransformedColumn(name, Lens.ArrayElements(Lens.Field(ft.fieldName)), opt => opt.map(ft.f))
    }

    /** Replace with SQL NULL (type-preserving) — reference OutputColumn.scala:49. */
    def nulled: FixedColumn = FixedColumn(name, null)

    /** Replace with a fixed literal — reference OutputColumn.scala:52. */
    def :=[A](value: A): FixedColumn = FixedColumn(name, value)

    private[graft] def toColumn(df: DataFrame): Column = col(name)
  }

  /** A column with a lens-focused string transformation applied.
    * `nativeKind` marks a Direct-lens library scrubber recognized by
    * [[SourceColumn.mapString]]; those compile to the codegen'd expression.
    */
  case class TransformedColumn(
      name: String,
      lens: Lens,
      f: Option[String] => Option[String],
      nativeKind: Option[String] = None,
      nativeParams: Seq[Int] = Nil
  ) extends OutputColumn {
    private[graft] def toColumn(df: DataFrame): Column = nativeKind match {
      case Some(kind) if lens == Lens.Direct =>
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge
          .column(graft.functions.Scrub.ofAny(
            ColumnBridge.expression(col(name)), kind, nativeParams))
          .as(name)
      case _ =>
        val g = lens.modifyOpt(f)
        // One deterministic String=>String UDF per column; null-safe at the
        // Option boundary so mapString's null-skip contract holds.
        val u = udf((s: String) => g(Option(s)).orNull)
        u(col(name).cast("string")).as(name)
    }
  }

  /** A column replaced by a constant (or NULL). The literal folds at plan
    * time — the Spark analogue of the reference pre-wrapping fixed values
    * once per table (OutputColumn.scala:72-77).
    */
  case class FixedColumn(name: String, value: Any) extends OutputColumn {
    private[graft] def toColumn(df: DataFrame): Column = {
      val l = lit(value)
      // Preserve the source column's type for NULLs so sinks keep schemas.
      val typed =
        if (value == null && df.schema.fieldNames.contains(name)) l.cast(df.schema(name).dataType)
        else l
      typed.as(name)
    }
  }
}
