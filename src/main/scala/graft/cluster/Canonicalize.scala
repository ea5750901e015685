package graft.cluster

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.Sim

/**
 * Canonicalization (G5) + confidence (G4) — `dedupe:canonical
 * (fn getCanonicalRep)†`, `dedupe:clustering (fn confidences)†`.
 *
 * Per cluster, per field: the canonical value is the MEDOID — the value
 * minimizing summed string distance (here 1 - JaroWinkler; the reference
 * uses affine-gap†, replaced per the north rule) to the cluster's other
 * values; ties broken by the lexicographically smallest value so the
 * output is deterministic. Clusters are tiny after thresholding, so the
 * per-group O(k²) is bounded: values are capped at `maxValues` (sorted
 * first — deterministic, no silent order dependence).
 */
object Canonicalize {

  def medoid(values: Seq[String], maxValues: Int = 64,
      maxCompareLen: Int = 256): String = {
    val vs = values.filter(v => v != null && v.nonEmpty).sorted.take(maxValues)
    if (vs.isEmpty) return null
    // k ≤ 2 short-circuit: with one value it IS the medoid; with two, the
    // distance is symmetric so both tie and the tie-break picks the
    // lexicographic minimum — vs.head either way, no comparator call.
    if (vs.length <= 2) return vs.head
    // comparator inputs capped at a prefix: crawl-page fields are multi-KB
    // and JW over full bodies made canonicalization the pipeline's top cost
    // at scale; the first maxCompareLen chars carry the discriminating
    // signal (values identical through the prefix tie → lexicographic min,
    // still deterministic). The RETURNED value is always the full string.
    val cs = vs.map(v => if (v.length > maxCompareLen) v.substring(0, maxCompareLen) else v)
    var bestIdx = 0
    var bestCost = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      var cost = 0.0
      var j = 0
      while (j < cs.length) {
        if (i != j) cost += 1.0 - Sim.jaroWinkler(cs(i), cs(j))
        j += 1
      }
      if (cost < bestCost) { bestCost = cost; bestIdx = i } // first == lexic. min on tie
      i += 1
    }
    vs(bestIdx)
  }

  /**
   * One canonical row per entity.
   * @param labeled records with an entity column + the fields to canonicalize
   * @return (entity, <field>... medoid values, cluster_size)
   */
  def canonTable(labeled: DataFrame, entityCol: String, fields: Seq[String],
      maxValues: Int = 64): DataFrame = {
    val schema = StructType(
      StructField(entityCol, LongType) +:
      fields.map(f => StructField(f, StringType)) :+
      StructField("cluster_size", LongType))
    val input = labeled.select(
      col(entityCol).cast("long") +: fields.map(f => col(f).cast("string")): _*)
    implicit val enc = Encoders.row(schema)
    input.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (entity, rows) =>
        val mat = rows.toArray
        val vals = fields.indices.map { fi =>
          medoid(mat.map(r => r.getString(fi + 1)).toSeq, maxValues)
        }
        Row.fromSeq(entity +: vals :+ mat.length.toLong)
      }
  }

  /**
   * Per-record confidence = mean score of the record's intra-cluster scored
   * edges; records with no surviving edge (singletons) get 1.0 — they are
   * trivially self-consistent (reference assigns unclustered rows their own
   * entity†).
   */
  def confidences(labels: DataFrame, scoredPairs: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("component"))
    val e = scoredPairs
      .join(lab.withColumnRenamed("id", "id1").withColumnRenamed("component", "c1"), "id1")
      .join(lab.withColumnRenamed("id", "id2").withColumnRenamed("component", "c2"), "id2")
      .filter(col("c1") === col("c2"))
    val incident = e.select(col("id1").as("id"), col("score"))
      .union(e.select(col("id2").as("id"), col("score")))
      .groupBy("id").agg(avg("score").as("confidence"))
    lab.join(incident, Seq("id"), "left")
      .select(col("id"), col("component"),
        coalesce(col("confidence"), lit(1.0)).as("confidence"))
  }
}
