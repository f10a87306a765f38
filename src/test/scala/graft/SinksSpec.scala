package graft

import graft.sinks.{ColumnValueWriter, ConstraintDeferrer, DeferrableConstraint, Ident, OnConflict, SinkSql}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class SinksSpec extends AnyFunSpec with Matchers {

  describe("Ident quoting (SQL-injection safety)") {
    it("quotes plain identifiers") {
      Ident.quote("users") shouldBe "\"users\""
      Ident.quoteQualified("public", "users") shouldBe "\"public\".\"users\""
    }
    it("neutralizes hostile identifiers by doubling embedded quotes") {
      // The reference's hostile fixtures: table `users"; DROP TABLE orders; --`
      Ident.quote("""users"; DROP TABLE orders; --""") shouldBe
        "\"users\"\"; DROP TABLE orders; --\""
    }
  }

  describe("SinkSql.insert") {
    val cols = Seq("id", "name", "email")

    it("plain insert without conflict clause") {
      SinkSql.insert("public", "users", cols, None) shouldBe
        """INSERT INTO "public"."users" ("id", "name", "email") VALUES (?, ?, ?)"""
    }
    it("ON CONFLICT (cols) DO NOTHING") {
      SinkSql.insert("public", "users", cols, Some(OnConflict.doNothing("id"))) shouldBe
        """INSERT INTO "public"."users" ("id", "name", "email") VALUES (?, ?, ?) ON CONFLICT ("id") DO NOTHING"""
    }
    it("ON CONFLICT resolves PrimaryKey target from provided pk columns (sorted)") {
      SinkSql.insert("public", "users", cols, Some(OnConflict.doNothing), pkColumns = Seq("id")) shouldBe
        """INSERT INTO "public"."users" ("id", "name", "email") VALUES (?, ?, ?) ON CONFLICT ("id") DO NOTHING"""
    }
    it("DO UPDATE defaults to all non-target columns") {
      val sql = SinkSql.insert("public", "users", cols, Some(OnConflict.doUpdate("id")))
      sql should startWith("""INSERT INTO "public"."users" ("id", "name", "email") VALUES (?, ?, ?) ON CONFLICT ("id") DO UPDATE SET """)
      sql should include(""""name" = EXCLUDED."name"""")
      sql should include(""""email" = EXCLUDED."email"""")
      sql should not include (""""id" = EXCLUDED."id"""")
    }
    it("DO UPDATE with explicit update columns") {
      SinkSql.insert("public", "users", cols, Some(OnConflict.doUpdate(Seq("id"), Set("email")))) shouldBe
        """INSERT INTO "public"."users" ("id", "name", "email") VALUES (?, ?, ?) ON CONFLICT ("id") DO UPDATE SET "email" = EXCLUDED."email""""
    }
    it("ON CONSTRAINT target") {
      SinkSql.insert("public", "users", cols,
        Some(OnConflict(OnConflict.ConflictTarget.Constraint("users_pkey"), OnConflict.Action.DoNothing))) should
        include("""ON CONFLICT ON CONSTRAINT "users_pkey" DO NOTHING""")
    }
    it("rejects an empty conflict-target column list instead of rendering ON CONFLICT ()") {
      // PrimaryKey target with no resolvable pk columns — previously
      // rendered invalid SQL that only failed at the database.
      val e = intercept[IllegalArgumentException] {
        SinkSql.insert("public", "users", cols, Some(OnConflict.doNothing), pkColumns = Seq.empty)
      }
      e.getMessage should include("non-empty column target")
      // And Columns(Nil) can no longer be constructed via the varargs API:
      // OnConflict.doNothing("id") requires at least one column by signature.
      OnConflict.doNothing("id").target shouldBe OnConflict.ConflictTarget.Columns(Seq("id"))
    }
  }

  describe("SinkSql.mergeFromStaging") {
    val cols = Seq("id", "name", "email")

    it("DO NOTHING renders with no WHEN MATCHED clause") {
      SinkSql.mergeFromStaging("public", "users", "users_stage", cols, OnConflict.doNothing("id")) shouldBe
        """MERGE INTO "public"."users" tgt USING "public"."users_stage" src ON tgt."id" = src."id"""" +
        """ WHEN NOT MATCHED THEN INSERT ("id", "name", "email") VALUES (src."id", src."name", src."email")"""
    }
    it("DO UPDATE updates all non-target columns, sorted for determinism") {
      SinkSql.mergeFromStaging("public", "users", "users_stage", cols, OnConflict.doUpdate("id")) shouldBe
        """MERGE INTO "public"."users" tgt USING "public"."users_stage" src ON tgt."id" = src."id"""" +
        """ WHEN MATCHED THEN UPDATE SET "email" = src."email", "name" = src."name"""" +
        """ WHEN NOT MATCHED THEN INSERT ("id", "name", "email") VALUES (src."id", src."name", src."email")"""
    }
    it("PrimaryKey target resolves from pkColumns; composite targets AND together") {
      val sql = SinkSql.mergeFromStaging("public", "m", "m_stage", Seq("a", "b", "v"),
        OnConflict.doNothing, pkColumns = Seq("b", "a"))
      sql should include("""ON tgt."a" = src."a" AND tgt."b" = src."b"""")
    }
    it("rejects a named-constraint target (MERGE needs columns)") {
      val e = intercept[IllegalArgumentException] {
        SinkSql.mergeFromStaging("public", "users", "s", cols,
          OnConflict(OnConflict.ConflictTarget.Constraint("users_pkey"), OnConflict.Action.DoNothing))
      }
      e.getMessage should include("resolve it to its column list")
    }
    it("rejects an unresolvable empty target and an empty update set") {
      intercept[IllegalArgumentException] {
        SinkSql.mergeFromStaging("public", "users", "s", cols, OnConflict.doNothing)
      }.getMessage should include("non-empty column target")
      intercept[IllegalArgumentException] {
        SinkSql.mergeFromStaging("public", "t", "s", Seq("id"), OnConflict.doUpdate("id"))
      }.getMessage should include("no columns to update")
    }
  }

  describe("SinkSql auxiliary DDL/DML") {
    it("sequence reset matches the reference's setval shape") {
      SinkSql.sequenceReset("public", "users_id_seq", "users", "id") shouldBe
        """SELECT setval('"public"."users_id_seq"', coalesce(max("id"), 0) + 1, false) FROM "public"."users""""
    }
    it("constraint deferral + restore") {
      SinkSql.deferConstraint("public", "categories", "fk_parent") shouldBe
        """ALTER TABLE "public"."categories" ALTER CONSTRAINT "fk_parent" DEFERRABLE INITIALLY DEFERRED"""
      SinkSql.restoreConstraint("public", "categories", "fk_parent", deferrable = false, initiallyDeferred = false) should
        endWith("NOT DEFERRABLE")
      SinkSql.restoreConstraint("public", "categories", "fk_parent", deferrable = true, initiallyDeferred = false) should
        endWith("DEFERRABLE INITIALLY IMMEDIATE")
    }
    it("sequence reset for a discovered (already-qualified) sequence name") {
      SinkSql.sequenceResetDiscovered("public.users_id_seq", "public", "users", "id") shouldBe
        """SELECT setval('public.users_id_seq', coalesce(max("id"), 0) + 1, false) FROM "public"."users""""
    }
  }

  describe("ConstraintDeferrer orchestration") {
    val fk = DeferrableConstraint("public", "categories", "fk_parent", deferrable = false, initiallyDeferred = false)

    it("brackets the body: defer, run, restore to the original state") {
      val sql = scala.collection.mutable.ArrayBuffer.empty[String]
      var ran = false
      new ConstraintDeferrer(sql += _).withDeferred(Seq(fk)) {
        sql should have size 1 // deferred before the body runs
        ran = true
      }
      ran shouldBe true
      sql.toSeq shouldBe Seq(
        SinkSql.deferConstraint("public", "categories", "fk_parent"),
        SinkSql.restoreConstraint("public", "categories", "fk_parent", deferrable = false, initiallyDeferred = false)
      )
    }
    it("empty constraint list runs the body with zero ALTERs") {
      val sql = scala.collection.mutable.ArrayBuffer.empty[String]
      new ConstraintDeferrer(sql += _).withDeferred(Nil) { () } shouldBe (())
      sql shouldBe empty
    }
    it("defer failure is fatal with the PostgreSQL 9.4+ hint") {
      val e = intercept[RuntimeException] {
        new ConstraintDeferrer(_ => throw new java.sql.SQLException("no ALTER CONSTRAINT"))
          .withDeferred(Seq(fk)) { fail("body must not run") }
      }
      e.getMessage should include("PostgreSQL 9.4+")
    }
    it("restore failure is logged, not propagated, and never masks the body outcome") {
      var calls = 0
      val deferrer = new ConstraintDeferrer(_ => {
        calls += 1
        if (calls > 1) throw new java.sql.SQLException("restore refused")
      })
      deferrer.withDeferred(Seq(fk)) { 42 } shouldBe 42
      calls shouldBe 2 // restore was attempted
      // And a failing body still restores, propagating the BODY's error.
      calls = 0
      val boom = intercept[IllegalStateException] {
        deferrer.withDeferred(Seq(fk)) { throw new IllegalStateException("copy failed") }
      }
      boom.getMessage shouldBe "copy failed"
      calls shouldBe 2
    }
  }

  describe("ColumnValueWriter") {
    it("forColumnTypes selects the JSON writer for json/jsonb columns only") {
      val writers = ColumnValueWriter.forColumnTypes(
        Map("payload" -> "jsonb", "meta" -> "json", "name" -> "character varying")
      )
      writers.keySet shouldBe Set("payload", "meta")
    }
    it("JsonString binds via Types.OTHER so the server casts text to json") {
      var recorded: (Int, Any, Int) = null
      var nulled: (Int, Int)        = null
      val stmt = java.lang.reflect.Proxy.newProxyInstance(
        getClass.getClassLoader,
        Array(classOf[java.sql.PreparedStatement]),
        (_, method, args) =>
          method.getName match {
            case "setObject" if args.length == 3 =>
              recorded = (args(0).asInstanceOf[Int], args(1), args(2).asInstanceOf[Int]); null
            case "setNull" =>
              nulled = (args(0).asInstanceOf[Int], args(1).asInstanceOf[Int]); null
            case _ => null
          }
      ).asInstanceOf[java.sql.PreparedStatement]
      ColumnValueWriter.JsonString.set(stmt, 3, """{"k":1}""")
      recorded shouldBe ((3, """{"k":1}""", java.sql.Types.OTHER))
      ColumnValueWriter.JsonString.set(stmt, 4, null)
      nulled shouldBe ((4, java.sql.Types.OTHER))
    }
  }
}
