package graft

import graft.plans.{LogicalFK, TableSorter}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class TableSorterSpec extends AnyFunSpec with Matchers {
  private def fk(child: String, parent: String) =
    LogicalFK(s"fk_${child}_$parent", child, parent, Seq(("pid", "id")))

  describe("computeTableLevels") {
    it("assigns level 0 to dependency-free tables") {
      TableSorter.computeTableLevels(Seq("a", "b"), Nil) shouldBe Map("a" -> 0, "b" -> 0)
    }
    it("children land one level above their deepest parent") {
      val levels = TableSorter.computeTableLevels(
        Seq("users", "orders", "order_items"),
        Seq(fk("orders", "users"), fk("order_items", "orders"))
      )
      levels shouldBe Map("users" -> 0, "orders" -> 1, "order_items" -> 2)
    }
    it("diamond dependencies resolve to max parent level + 1") {
      val levels = TableSorter.computeTableLevels(
        Seq("a", "b", "c", "d"),
        Seq(fk("b", "a"), fk("c", "a"), fk("d", "b"), fk("d", "c"))
      )
      levels("d") shouldBe 2
    }
    it("self-references are ignored for leveling") {
      TableSorter.computeTableLevels(Seq("cat"), Seq(fk("cat", "cat"))) shouldBe Map("cat" -> 0)
    }
    it("cyclic tables are dropped (not assigned a level)") {
      val levels = TableSorter.computeTableLevels(
        Seq("a", "b", "c"),
        Seq(fk("a", "b"), fk("b", "a"))
      )
      levels shouldBe Map("c" -> 0)
    }
    it("FKs to tables outside the input list are ignored") {
      TableSorter.computeTableLevels(Seq("a"), Seq(fk("a", "external"))) shouldBe Map("a" -> 0)
    }
  }

  describe("apply (grouping)") {
    it("groups by level with alphabetical order within a level") {
      val groups = TableSorter(
        Seq("zeta", "alpha", "users", "orders"),
        Seq(fk("zeta", "users"), fk("alpha", "users"))
      )
      groups shouldBe Seq(Seq("orders", "users"), Seq("alpha", "zeta"))
    }
    it("empty input → empty output") {
      TableSorter(Nil, Nil) shouldBe Seq.empty
    }
  }
}
