package graft

import graft.dsl.{OutputColumn, TableSpec}
import graft.functions.Anonymizer

class TableSpecSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("first_name", StringType),
      StructField("total", DecimalType(10, 2)),
      StructField("status", StringType)
    ))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "Ada", new java.math.BigDecimal("10.50"), "open"),
        Row(2, null, new java.math.BigDecimal("7.25"), "closed"),
        Row(3, "Grace", new java.math.BigDecimal("99.99"), "open")
      ),
      schema
    )
  }

  describe("DSL construction") {
    it("row.name builds SourceColumn; transforms build TransformedColumn") {
      val spec = TableSpec.select { row => Seq(row.first_name.mapString(Anonymizer.FirstName), row.status) }
      spec.columnNames shouldBe Seq("first_name", "status")
      spec.columns.head shouldBe a[OutputColumn.TransformedColumn]
      spec.columns(1) shouldBe a[OutputColumn.SourceColumn]
    }
    it("validateCovers reports missing columns") {
      val spec = TableSpec.select(row => Seq(row.a))
      spec.validateCovers(Set("a", "b", "c")) shouldBe Left(Set("b", "c"))
      spec.validateCovers(Set("a")) shouldBe Right(())
    }
  }

  describe("compile") {
    it("passthrough preserves native types (DECIMAL fidelity)") {
      val out = TableSpec.select(row => Seq(row.id, row.total)).compile(df)
      out.schema("total").dataType shouldBe DecimalType(10, 2)
      out.collect().map(_.get(1).toString).sorted shouldBe Array("10.50", "7.25", "99.99").sorted
    }
    it("mapString skips nulls (null in → null out, f not applied)") {
      val out = TableSpec.select(row => Seq(row.id, row.first_name.mapString(_ => "X"))).compile(df)
      out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap shouldBe
        Map(1 -> "X", 2 -> null, 3 -> "X")
    }
    it("mapOptString sees nulls as None and can replace them") {
      val out = TableSpec
        .select(row => Seq(row.id, row.first_name.mapOptString(o => Some(o.getOrElse("MISSING")))))
        .compile(df)
      out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap shouldBe
        Map(1 -> "Ada", 2 -> "MISSING", 3 -> "Grace")
    }
    it("nulled emits typed NULL") {
      val out = TableSpec.select(row => Seq(row.id, row.total.nulled)).compile(df)
      out.schema("total").dataType shouldBe DecimalType(10, 2)
      out.collect().forall(_.isNullAt(1)) shouldBe true
    }
    it(":= emits a constant") {
      val out = TableSpec.select(row => Seq(row.id, row.status := "REDACTED")).compile(df)
      out.collect().map(_.getString(1)).distinct shouldBe Array("REDACTED")
    }
    it("where filters before transform; multiple wheres AND") {
      val out = TableSpec
        .select(row => Seq(row.id))
        .where("status = 'open'")
        .where("id > 1")
        .compile(df)
      out.collect().map(_.getInt(0)) shouldBe Array(3)
    }
    it("withLimit uses ORDER BY id DESC when an id column is in the spec") {
      val out = TableSpec.select(row => Seq(row.id, row.status)).withLimit(2).compile(df)
      out.collect().map(_.getInt(0)).sorted shouldBe Array(2, 3) // most recent 2
    }
    it("withLimit without id column is a plain limit") {
      val out = TableSpec.select(row => Seq(row.status)).withLimit(2).compile(df)
      out.count() shouldBe 2
    }
  }

  describe("mapOptString honoring actual values") {
    it("passes through existing values to f") {
      val out = TableSpec
        .select(row => Seq(row.id, row.first_name.mapOptString(o => o.map(_.toUpperCase).orElse(Some("NONE")))))
        .compile(df)
      out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap shouldBe
        Map(1 -> "ADA", 2 -> "NONE", 3 -> "GRACE")
    }
  }
}
