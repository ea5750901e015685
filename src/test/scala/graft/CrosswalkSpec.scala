package graft

import graft.cluster.Crosswalk

/** Snapshot-to-snapshot entity reconciliation (cluster/Crosswalk). */
class CrosswalkSpec extends SparkSpec {
  import spark.implicits._

  // old: {1,2}→1, {3}→3, {4,5}→4, {10,11,12}→10
  private val oldL = Seq(
    (1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L),
    (10L, 10L), (11L, 10L), (12L, 10L)).toDF("id", "component")
  // new: {1,2}→1 stable; {3,4,5}→3 grown-over-4/changed-over-3;
  //      {10}→10 split; {11,12}→11 split; {6,7}→6 all-new members
  private val newL = Seq(
    (1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 3L),
    (10L, 10L), (11L, 11L), (12L, 11L), (6L, 6L), (7L, 6L)).toDF("id", "component")

  test("crosswalk statuses and plurality picks") {
    val got = Crosswalk.crosswalk(oldL, newL).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getString(5))).toMap
    assert(got(1L) == (Some(1L), 2L, 2L, Some(2L), "stable"))
    // {3,4,5}: overlap 1 with old 3, overlap 2 with old 4 → plurality 4,
    // overlap == old_size → grown
    assert(got(3L) == (Some(4L), 2L, 3L, Some(2L), "grown"))
    assert(got(10L) == (Some(10L), 1L, 1L, Some(3L), "split"))
    assert(got(11L) == (Some(10L), 2L, 2L, Some(3L), "split"))
    assert(got(6L) == (None, 0L, 2L, None, "new"))
  }

  test("plurality tie breaks to the smallest old id") {
    val o = Seq((1L, 1L), (2L, 2L)).toDF("id", "component")
    val n = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val row = Crosswalk.crosswalk(o, n).collect()(0)
    assert(row.getLong(1) == 1L) // overlap 1 with old 1 and old 2 → min
  }

  test("stableIds: winner inherits, loser keeps fresh id, pair key unique") {
    val got = Crosswalk.stableIds(oldL, newL).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // old 10 contested by new {10} (overlap 1) and new {11,12} (overlap 2):
    // {11,12} wins and inherits 10; loser {10} keeps fresh id 10 — the
    // documented collision the (inherited, entity) pair key disambiguates
    assert(got(11L) == ((10L, true)) && got(12L) == ((10L, true)))
    assert(got(10L) == ((10L, false)))
    assert(got(1L) == ((1L, true)) && got(2L) == ((1L, true)))
    assert(got(3L) == ((4L, true)) && got(4L) == ((4L, true)) && got(5L) == ((4L, true)))
    assert(got(6L) == ((6L, false)) && got(7L) == ((6L, false)))
    // (entity, inherited) is a collision-free cluster key: one key per
    // new component (5 components), even though entity 10 appears twice
    assert(got.values.toSet.size == 5)
    assert(got.values.map(_._1).toSeq.distinct.size == 4) // the collision exists
  }
}
