package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot-to-snapshot entity reconciliation.
 *
 * The reference keeps one entity_map per session and OVERWRITES it when a
 * session re-runs (`dedupe-api:api/utils/delayed_tasks.py†` rebuilds
 * entity assignments wholesale) — workable for a city data portal,
 * useless at crawl cadence where downstream tables key on the entity id
 * and every re-crawl would churn every key. This operator gives the
 * re-run story a stable spine: match each NEW entity to the OLD entity it
 * overlaps most (plurality of shared members; ties to the smallest old
 * id, so the pick is total-order deterministic), classify the transition,
 * and mint persistent ids that survive re-clustering.
 *
 * Shuffle economics at 10^12 rows: one id-co-partitioned join of the two
 * labelings, map-side-combinable counts, and per-group `max_by` picks —
 * no windows, no global sorts, nothing driver-side.
 */
object Crosswalk {

  /**
   * @param oldLabels (id, component) — previous snapshot's assignment
   * @param newLabels (id, component) — this snapshot's assignment
   * @return one row per NEW component:
   *         (component_new, component_old, overlap, new_size, old_size,
   *          status) where component_old is the plurality-overlap old
   *         entity (null for entities of only-new members), and status ∈
   *         {stable, grown, split, changed, new}:
   *         stable  = identical membership;
   *         grown   = swallowed the old entity whole and added members;
   *         split   = a strict fragment of the old entity;
   *         changed = overlaps but neither contains the other;
   *         new     = no member was previously assigned.
   */
  def crosswalk(oldLabels: DataFrame, newLabels: DataFrame): DataFrame = {
    val o = oldLabels.toDF("id", "component_old")
    val n = newLabels.toDF("id", "component_new")
    val j = n.join(o, Seq("id"), "left")
    val overlaps = j.filter(col("component_old").isNotNull)
      .groupBy("component_new", "component_old")
      .agg(count(lit(1)).as("overlap"))
    val newSize = n.groupBy("component_new").agg(count(lit(1)).as("new_size"))
    val oldSize = o.groupBy("component_old").agg(count(lit(1)).as("old_size"))
    // plurality pick: max overlap, tie → min old id (negate for max_by)
    val best = overlaps.groupBy("component_new").agg(
      max_by(
        struct(col("component_old"), col("overlap")),
        struct(col("overlap"), (lit(-1L) * col("component_old")).as("t"))
      ).as("b"))
      .select(col("component_new"), col("b.component_old"), col("b.overlap"))
    newSize.join(best, Seq("component_new"), "left")
      .join(oldSize, Seq("component_old"), "left")
      .select(
        col("component_new"), col("component_old"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        col("new_size"), col("old_size"),
        when(col("component_old").isNull, "new")
          .when(col("overlap") === col("new_size") && col("overlap") === col("old_size"), "stable")
          .when(col("overlap") === col("old_size"), "grown")
          .when(col("overlap") === col("new_size"), "split")
          .otherwise("changed").as("status"))
  }

  /**
   * Persistent entity ids: rename each new component to its
   * plurality-matched old id — except when several new components claim
   * the same old entity (a split), where only the claimant with the
   * largest overlap (tie → smallest new id) inherits it and the rest
   * keep their fresh min-member id, flagged `inherited = false`.
   *
   * Inherited ids are claimed at most once (one winner per old id), and
   * fresh ids are distinct min-member ids — but a FRESH id can equal an
   * UNRELATED INHERITED id (e.g. the split loser contains the old min
   * member while the winner inherits that old id), so the collision-free
   * key is the PAIR (inherited, entity). Callers wanting a single flat
   * key should namespace (e.g. (snapshot_epoch, entity)); documented
   * rather than hidden.
   *
   * @return (id, entity, inherited) — every row of newLabels, relabeled
   */
  def stableIds(oldLabels: DataFrame, newLabels: DataFrame): DataFrame = {
    val xw = crosswalk(oldLabels, newLabels)
      .filter(col("component_old").isNotNull)
    // one winner per old id: max overlap, tie → min new id
    val winners = xw.groupBy("component_old").agg(
      max_by(
        col("component_new"),
        struct(col("overlap"), (lit(-1L) * col("component_new")).as("t"))
      ).as("component_new"))
      .select(col("component_new"), col("component_old").as("entity"))
    newLabels.toDF("id", "component_new")
      .join(winners, Seq("component_new"), "left")
      .select(col("id"),
        coalesce(col("entity"), col("component_new")).as("entity"),
        col("entity").isNotNull.as("inherited"))
  }
}
