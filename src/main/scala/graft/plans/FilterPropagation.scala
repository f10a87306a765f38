package graft.plans

import graft.dsl.TableSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, min}

/** Propagates row filters through the FK graph as DataFrame rewrites.
  *
  * Where the reference compiles subsetting into source-side SQL — IN
  * subqueries and recursive CTEs evaluated by PostgreSQL
  * (simple-anonymizer/src/scala/simpleanonymizer/FilterPropagation.scala:26-51,
  * 73-99) — this engine expresses the same semantics as Spark plan rewrites:
  *
  *   - parent filter → child LEFT SEMI join on the filtered parent's keys
  *     (composite FKs become multi-column join conditions, i.e. tuple-IN);
  *   - multiple filtered parents AND together (chained semi joins);
  *   - transitivity falls out of reusing each child's filtered frame as the
  *     semi-join right side for ITS children (tables walked in topo order);
  *   - self-referencing FKs get an iterative reachability fixpoint
  *     ([[SelfRefClosure]]) replacing the recursive CTE (Spark SQL has none).
  *
  * Scale notes: the semi-join right side is pruned to the parent's key
  * columns, so AQE can broadcast it when the subset is small (the common
  * case after filtering); nothing here collects to the driver.
  */
object FilterPropagation {

  /** Compute the EFFECTIVE (explicit + propagated) frame for every table.
    *
    * @param catalog  table name → source DataFrame
    * @param manifest FK manifest (composite columns pre-grouped)
    * @param explicitClauses user-provided filter per table, if any
    * @return table name → effective DataFrame; tables with no explicit or
    *         inherited filter map to their catalog frame unchanged.
    */
  def computeFilteredTables(
      catalog: Map[String, DataFrame],
      manifest: SchemaManifest,
      explicitClauses: String => Option[TableSpec.WhereClause]
  ): Map[String, DataFrame] = {
    val fksByChild = manifest.fks.groupBy(_.childTable).withDefaultValue(Nil)
    val ordered    = TableSorter(manifest.tables, manifest.fks).flatten

    // Tracks which tables actually received a filter — only those propagate.
    val filteredSet = scala.collection.mutable.Set.empty[String]

    ordered.foldLeft(Map.empty[String, DataFrame]) { (acc, table) =>
      val df                        = catalog(table)
      val (selfRefFks, crossRefFks) = fksByChild(table).partition(_.isSelfRef)

      val explicit   = explicitClauses(table)
      val afterWhere = explicit.map(w => df.where(w.toCondition)).getOrElse(df)

      // Cross-FK semi joins against each FILTERED parent's effective frame.
      val filteredParents = crossRefFks.filter(fk => filteredSet.contains(fk.parentTable))
      val afterSemi = filteredParents.foldLeft(afterWhere) { (child, fk) =>
        semiJoinOnKeys(child, acc(fk.parentTable), fk)
      }

      val hasBaseFilter = explicit.nonEmpty || filteredParents.nonEmpty

      // Self-ref closures: each independent, computed from the SAME base
      // (explicit + cross-ref), matching reference FilterPropagation.scala:90-94.
      val result =
        if (hasBaseFilter && selfRefFks.nonEmpty)
          selfRefFks.foldLeft(afterSemi) { (cur, fk) =>
            SelfRefClosure.filterReachable(cur, afterSemi, fk.fkColumns, fk.pkColumns)
          }
        else afterSemi

      if (hasBaseFilter) filteredSet += table
      acc + (table -> result)
    }
  }

  /** `child LEFT SEMI JOIN parent` on the FK's column pairs. The right side
    * is pruned to the parent key columns (renamed to avoid ambiguity).
    */
  private[plans] def semiJoinOnKeys(child: DataFrame, parent: DataFrame, fk: LogicalFK): DataFrame = {
    val renamed = fk.pkColumns.map(c => s"__graft_pk_$c")
    val keys    = parent.select(fk.pkColumns.map(col): _*).toDF(renamed: _*)
    val cond = fk.fkColumns
      .zip(renamed)
      .map { case (fc, pc) => child(fc) === keys(pc) }
      .reduce(_ && _)
    child.join(keys, cond, "left_semi")
  }
}

/** Transitive-closure operator for self-referencing FKs — the Spark
  * replacement for the reference's recursive CTE
  * (simple-anonymizer/src/scala/simpleanonymizer/FilterPropagation.scala:23-51).
  *
  * Spark SQL has no recursive CTE, so reachability is an iterative DataFrame
  * fixpoint: start from roots (all FK columns NULL) within the filtered base,
  * repeatedly add rows whose parent key is already reachable, stop when an
  * iteration adds nothing. Each iteration is materialized via
  * [[Lineage.truncate]] (executor-local blocks by default; reliable
  * checkpoints opt-in for cluster runs) — otherwise the plan grows linearly
  * with hierarchy depth and re-executes from scratch each round.
  */
object SelfRefClosure {

  /** Filter `target` to rows whose FK is NULL or whose FK points at a
    * reachable row of `base` — i.e. the reference's final predicate
    * `(fk IS NULL) OR (fkCols) IN (closure CTE)` with the closure computed
    * over `base` (the explicitly+cross-filtered frame).
    *
    * @param target frame to filter (usually == base)
    * @param base   frame defining roots and the recursion universe
    */
  def filterReachable(
      target: DataFrame,
      base: DataFrame,
      fkCols: Seq[String],
      pkCols: Seq[String],
      maxIterations: Int = 1000
  ): DataFrame = {
    val fkNull    = fkCols.map(col(_).isNull).reduce(_ && _)
    val reachable = reachableKeys(base, fkCols, pkCols, maxIterations)

    val renamed = pkCols.map(c => s"__graft_r_$c")
    val keys    = reachable.toDF(renamed: _*)
    val cond = fkCols
      .zip(renamed)
      .map { case (fc, rc) => target(fc) === keys(rc) }
      .reduce(_ && _)

    // fk-null rows appear only in the first branch (NULL never equi-matches),
    // so the union is disjoint — no dedup needed.
    target.where(fkNull).unionByName(target.join(keys, cond, "left_semi"))
  }

  /** PK tuples of all rows of `base` reachable from fk-null roots through
    * the self-ref chain (every hop must itself satisfy `base`).
    */
  def reachableKeys(
      base: DataFrame,
      fkCols: Seq[String],
      pkCols: Seq[String],
      maxIterations: Int = 1000
  ): DataFrame = {
    val fkNull  = fkCols.map(col(_).isNull).reduce(_ && _)
    val renamed = pkCols.map(c => s"__graft_r_$c")

    // Materialize the recursion universe ONCE, pruned to the join columns.
    // Joining against the raw `base` plan instead re-inlines its entire
    // derivation into every iteration's join predicate — observed to double
    // the compiled task size per iteration (2→4→8 MiB…) when fk/pk columns
    // are computed expressions. The checkpoint caps every iteration at a
    // flat scan of (fk, pk) tuples.
    val universe = base
      .select((fkCols ++ pkCols).distinct.map(col): _*)
      .transform(Lineage.truncate)

    def childrenOf(parents: DataFrame): DataFrame = {
      val keys = parents.toDF(renamed: _*)
      val cond = fkCols
        .zip(renamed)
        .map { case (fc, rc) => universe(fc) === keys(rc) }
        .reduce(_ && _)
      universe.join(keys, cond, "left_semi").select(pkCols.map(col): _*)
    }

    // Hops unrolled per materialized round: each round costs one nontrivial
    // job regardless of hop count, and driver-synchronized rounds are the
    // latency floor of any iterative fixpoint — K hops per round divides
    // the rounds by K for deep hierarchies at the price of K-1 extra
    // key-only semi joins inside the round's plan. K=5 measured best on
    // the depth-14 fixture (2.3 s → 2.0 s at sf0.1 vs K=3); hops past the
    // fixpoint are semi joins of an empty frontier — near-free — so a
    // larger K does not tax shallow hierarchies.
    val unroll = 5

    var reachable = universe.where(fkNull).select(pkCols.map(col): _*).transform(Lineage.truncate)
    var frontier  = reachable
    // Arms of the lazy union stay pinned until a fold re-materializes
    // `reachable`; folding releases them (pinned checkpoints that nothing
    // will read again are leaked execution memory — Lineage
    // .truncateReleasable's contract).
    var pendingRelease: List[() => Unit] = Nil
    var iters     = 0
    while (iters < maxIterations && !frontier.isEmpty) {
      // K hops materialized as ONE hop-tagged checkpoint. A node found by
      // several hops keeps the smallest (min(hop)); the anti join drops
      // already-reachable nodes (except() would compare the hop column).
      // Induction on completeness: children of hop-i news are exactly
      // hop i+1 (explored) for i < K; only hop-K news keep unexplored
      // children — they are the next frontier, derived from the SAME
      // cached frame, so lineage never compounds across rounds.
      val hops = (2 to unroll).scanLeft(childrenOf(frontier))((prev, _) => childrenOf(prev))
      val seen = reachable.toDF(renamed: _*)
      val news = hops.zipWithIndex
        .map { case (h, i) => h.withColumn("__graft_hop", lit(i + 1)) }
        .reduce(_ unionByName _)
        .groupBy(pkCols.map(col): _*)
        .agg(min(col("__graft_hop")).as("__graft_hop"))
        .join(seen, pkCols.zip(renamed).map { case (pc, rc) => col(pc) === seen(rc) }.reduce(_ && _), "left_anti")
        .transform(df => {
          val (cp, rel) = Lineage.truncateReleasable(df)
          pendingRelease ::= rel
          cp
        })
      frontier = news.where(col("__graft_hop") === unroll).select(pkCols.map(col): _*)
      // Lazy union of checkpointed arms — re-reading costs no recompute,
      // but the driver-side plan (and task binary) grows by one union arm
      // per round. Fold the accumulated union back into a single
      // materialized frame every few rounds so the plan stays O(1) for
      // arbitrarily deep hierarchies — and the fold's checkpoint copies
      // every arm, so the superseded arm checkpoints release.
      reachable = reachable.unionByName(news.select(pkCols.map(col): _*))
      if (iters % 8 == 7) {
        val (cp, rel) = Lineage.truncateReleasable(reachable)
        reachable = cp
        // The NEWEST arm stays: the live frontier is a lazy view over it
        // and the next round still reads its blocks. Everything older is
        // fully copied into the fold's checkpoint.
        pendingRelease match {
          case newest :: older =>
            older.foreach(_())
            pendingRelease = rel :: newest :: Nil
          case Nil =>
            pendingRelease = rel :: Nil
        }
      }
      iters += 1
    }
    reachable
  }
}
