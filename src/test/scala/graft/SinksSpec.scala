package graft

import graft.sinks.{Ident, OnConflict, SinkSql}
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
  }
}
