package graft

import graft.dsl.TableSpec
import graft.plans._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Reproduces the reference integration fixture's subsetting semantics
  * (integration-tests/src/resources/01-schema.sql + 02-data.sql, asserted in
  * DbCopierIntegrationTest.scala:120-156) on in-memory frames: semi-join
  * propagation, the excluded-parent child ("Fiction"), the transitively
  * excluded grandchild ("Poetry Anthology"), independent dual self-refs
  * (employees), and composite-key self-refs (tree_nodes).
  */
class FilterPropagationSpec extends SparkSpec {

  private def intDf(schema: Seq[(String, Boolean)], rows: Seq[Seq[Any]]): DataFrame = {
    val st = StructType(schema.map { case (n, nullable) => StructField(n, IntegerType, nullable) })
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*),
      st
    )
  }

  // users(id), orders(id, user_id), categories(id, owner_id, parent_id),
  // order_items(id, order_id, category_id)
  private lazy val users = intDf(Seq("id" -> false), (1 to 10).map(Seq(_)))
  private lazy val orders = intDf(
    Seq("id" -> false, "user_id" -> false),
    Seq(Seq(1, 1), Seq(2, 2), Seq(3, 3), Seq(4, 2))
  )
  private lazy val categories = intDf(
    Seq("id" -> false, "owner_id" -> false, "parent_id" -> true),
    Seq(
      Seq(1, 1, null), // Root1: owner passes, root → kept
      Seq(2, 2, 1),    // child of Root1, owner passes → kept
      Seq(3, 3, null), // "Books": owner fails → dropped by cross-FK
      Seq(9, 1, 3)     // "Fiction": own owner passes, parent excluded → must drop
    )
  )
  private lazy val orderItems = intDf(
    Seq("id" -> false, "order_id" -> false, "category_id" -> false),
    Seq(
      Seq(1, 1, 1), // order 1 (user1 ok), cat 1 ok → kept
      Seq(2, 3, 1), // order 3 (user3 excluded) → dropped
      Seq(3, 2, 9), // "Poetry Anthology": order ok, cat 9 excluded → dropped
      Seq(4, 4, 2)  // order 4 (user2 ok), cat 2 ok → kept
    )
  )

  private lazy val manifest = SchemaManifest(
    tables = Seq("users", "orders", "categories", "order_items"),
    pks = Map("users" -> Seq("id"), "orders" -> Seq("id"), "categories" -> Seq("id"), "order_items" -> Seq("id")),
    fks = Seq(
      LogicalFK("fk_orders_users", "orders", "users", Seq(("user_id", "id"))),
      LogicalFK("fk_cat_users", "categories", "users", Seq(("owner_id", "id"))),
      LogicalFK("fk_cat_cat", "categories", "categories", Seq(("parent_id", "id"))),
      LogicalFK("fk_items_orders", "order_items", "orders", Seq(("order_id", "id"))),
      LogicalFK("fk_items_cat", "order_items", "categories", Seq(("category_id", "id")))
    )
  )

  private lazy val catalog =
    Map("users" -> users, "orders" -> orders, "categories" -> categories, "order_items" -> orderItems)

  private def effective(filtered: Map[String, Option[TableSpec.WhereClause]]): Map[String, DataFrame] =
    FilterPropagation.computeFilteredTables(catalog, manifest, t => filtered.getOrElse(t, None))

  private def ids(df: DataFrame, col: String = "id"): Set[Int] =
    df.select(col).collect().map(_.getInt(0)).toSet

  describe("cross-FK propagation (semi joins)") {
    it("children of a filtered parent keep only referencing rows") {
      val eff = effective(Map("users" -> Some(TableSpec.WhereClause.Single("id <= 2"))))
      ids(eff("users")) shouldBe Set(1, 2)
      ids(eff("orders")) shouldBe Set(1, 2, 4)
    }
    it("unfiltered graphs pass every table through unchanged") {
      val eff = effective(Map.empty)
      eff("orders") should be theSameInstanceAs orders
      eff("categories") should be theSameInstanceAs categories
    }
  }

  describe("self-ref closure composed with cross-FK filters") {
    it("drops a child whose own filter passes but whose parent is excluded (Fiction case)") {
      val eff = effective(Map("users" -> Some(TableSpec.WhereClause.Single("id <= 2"))))
      ids(eff("categories")) shouldBe Set(1, 2) // 3 fails owner filter; 9 orphaned
    }
    it("transitively excludes grandchildren through two FK hops (Poetry Anthology case)") {
      val eff = effective(Map("users" -> Some(TableSpec.WhereClause.Single("id <= 2"))))
      ids(eff("order_items")) shouldBe Set(1, 4)
    }
  }

  describe("multi-parent AND semantics") {
    it("a child must satisfy every filtered parent") {
      // Filter users AND (independently) categories by name-less predicate:
      val eff = effective(
        Map(
          "users"      -> Some(TableSpec.WhereClause.Single("id <= 2")),
          "categories" -> Some(TableSpec.WhereClause.Single("id <> 2"))
        )
      )
      // categories: explicit id<>2 removes 2; owner filter removes 3; closure removes 9 → {1}
      ids(eff("categories")) shouldBe Set(1)
      // items: order ok AND cat ∈ {1} → item 1 only
      ids(eff("order_items")) shouldBe Set(1)
    }
  }

  describe("independent dual self-ref FKs (employees case)") {
    // employees(id, manager_id, mentor_id): two independent closures from the
    // same base — reference FilterPropagationTest.scala:82-107 semantics.
    it("each self-ref FK gets its own closure; both must hold") {
      val employees = intDf(
        Seq("id" -> false, "manager_id" -> true, "mentor_id" -> true),
        Seq(
          Seq(1, null, null), // root in both hierarchies
          Seq(2, 1, null),    // managed by 1, no mentor → ok
          Seq(3, 1, 1),       // managed ok, mentored by 1 ok
          Seq(4, 5, null),    // manager 5 excluded by filter → drop
          Seq(5, null, null), // excluded by explicit filter (id <= 4)
          Seq(6, 1, 5)        // manager ok, mentor 5 excluded → drop
        )
      )
      val m = SchemaManifest(
        tables = Seq("employees"),
        pks = Map("employees" -> Seq("id")),
        fks = Seq(
          LogicalFK("fk_mgr", "employees", "employees", Seq(("manager_id", "id"))),
          LogicalFK("fk_mentor", "employees", "employees", Seq(("mentor_id", "id")))
        )
      )
      val eff = FilterPropagation.computeFilteredTables(
        Map("employees" -> employees),
        m,
        t => Some(TableSpec.WhereClause.Single("id <= 4"))
      )
      ids(eff("employees")) shouldBe Set(1, 2, 3)
    }
  }

  describe("composite-key self-ref (tree_nodes case)") {
    it("tuple semi-joins track composite parent keys") {
      val tree = intDf(
        Seq("group_id" -> false, "position" -> false, "parent_group_id" -> true, "parent_position" -> true),
        Seq(
          Seq(1, 1, null, null), // root kept
          Seq(1, 2, 1, 1),       // child of (1,1) kept
          Seq(1, 3, 1, 2),       // grandchild kept
          Seq(2, 1, null, null), // root excluded by filter
          Seq(2, 2, 2, 1),       // parent excluded → drop
          Seq(1, 9, 2, 1)        // own filter passes, parent (2,1) excluded → drop
        )
      )
      val m = SchemaManifest(
        tables = Seq("tree_nodes"),
        pks = Map("tree_nodes" -> Seq("group_id", "position")),
        fks = Seq(
          LogicalFK("fk_tree", "tree_nodes", "tree_nodes",
            Seq(("parent_group_id", "group_id"), ("parent_position", "position")))
        )
      )
      val eff = FilterPropagation.computeFilteredTables(
        Map("tree_nodes" -> tree),
        m,
        _ => Some(TableSpec.WhereClause.Single("group_id = 1"))
      )
      eff("tree_nodes").select("group_id", "position").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet shouldBe Set((1, 1), (1, 2), (1, 3))
    }
  }

  describe("SelfRefClosure.reachableKeys") {
    it("computes full reachability on a deep chain") {
      val chain = intDf(
        Seq("id" -> false, "parent_id" -> true),
        Seq(Seq(1, null)) ++ (2 to 20).map(i => Seq[Any](i, i - 1))
      )
      val keys = SelfRefClosure.reachableKeys(chain, Seq("parent_id"), Seq("id"))
      keys.count() shouldBe 20
    }
    it("stays correct over 30+ rounds (the periodic union fold keeps the plan flat)") {
      // Depth 100 with unroll=3 → ~34 materialized rounds, crossing the
      // every-8-rounds re-truncate boundary four times. Correctness of the
      // fold: identical reachable set, and the accumulated union's plan
      // stays shallow enough that this completes in seconds, not minutes.
      val deep = intDf(
        Seq("id" -> false, "parent_id" -> true),
        Seq(Seq(1, null)) ++ (2 to 100).map(i => Seq[Any](i, i - 1))
      )
      val keys = SelfRefClosure.reachableKeys(deep, Seq("parent_id"), Seq("id"))
      keys.collect().map(_.getInt(0)).toSet shouldBe (1 to 100).toSet
    }
    it("rows unreachable from any root are excluded") {
      val orphans = intDf(
        Seq("id" -> false, "parent_id" -> true),
        Seq(Seq(1, null), Seq(2, 1), Seq(10, 99), Seq(11, 10))
      )
      val keys = SelfRefClosure.reachableKeys(orphans, Seq("parent_id"), Seq("id"))
      keys.collect().map(_.getInt(0)).toSet shouldBe Set(1, 2)
    }
  }
}
