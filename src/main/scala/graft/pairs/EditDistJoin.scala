package graft.pairs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gfunctions

/**
 * Exact edit-distance similarity self-join via q-gram prefix filtering
 * (beyond the reference; q-gram count filtering Gravano et al. VLDB
 * 2001†, prefix-filter formulation Xiao et al. "Ed-Join" VLDB 2008†).
 * Finds EVERY pair with Levenshtein distance ≤ k — the SetSimJoin
 * complement for the other classic string-join semantics, and the scale
 * path for C1-style comparators when the workload is a join rather than
 * scoring given pairs.
 *
 * Filter chain (each step only prunes, never loses a true pair):
 *  1. one edit destroys at most q of a string's distinct q-grams, so
 *     ed(a,b) ≤ k ⟹ |G(a) ∩ G(b)| ≥ |G(a)| − k·q (set form — a
 *     destroyed duplicate gram only shrinks the set difference)†;
 *  2. prefix filter: under a global (df asc, gram asc) total order, the
 *     first k·q + 1 grams of both sides must share a gram† (same
 *     theorem as SetSimJoin, overlap bound α = |G| − k·q);
 *  3. SHORT records — |G| ≤ k·q, where the overlap bound is vacuous and
 *     prefix filtering is NOT complete — pair among themselves in a
 *     dedicated all-pairs block (their partners of length ≤ len + k are
 *     structurally short too; short-vs-LONG pairs stay covered by the
 *     prefix theorem because a short record's prefix is its whole set);
 *  4. length filter ||a|−|b|| ≤ k, then EXACT verification with the
 *     built-in `levenshtein` (bit-identical to DuckDB's on ASCII — the
 *     oracle twin brute-forces the same predicate).
 *
 * Hot prefix grams ride the skew-proof grid self-join uncapped, as in
 * SetSimJoin (a capped block would silently lose true pairs).
 */
object EditDistJoin {

  /**
   * All pairs with levenshtein(s(id1), s(id2)) ≤ k, exactly.
   *
   * Exact-duplicate pre-grouping first (the engine's G1 pattern): the
   * q-gram machinery runs over DISTINCT strings only — on web-scale text
   * the distinct ratio is the whole ballgame (at sf0.1 this corpus has
   * 64 distinct names across 20 000 records; candidates drop from ~47 M
   * to a few thousand) — then the string-level matches expand back to id
   * pairs. Identical-string pairs (dist 0) expand through the same
   * skew-proof grid join as candidate generation; cross-string expansion
   * is output-bound (every produced row is a result row).
   *
   * @param recs (id, s) — non-null strings
   * @return (id1, id2, dist) with id1 < id2, dist long
   */
  def selfJoin(recs: DataFrame, k: Int, q: Int = 2,
      chunkTarget: Int = 256): DataFrame = {
    require(k >= 0 && q >= 1, s"need k >= 0, q >= 1: k=$k q=$q")
    val in = recs.select(col("id"), col("s"))
    val names = in.groupBy("s").agg(min(col("id")).as("id"))
    val repPairs = distinctSelfJoin(names.select("id", "s"), k, q, chunkTarget)

    // dist-0 pairs: all id pairs sharing a string — the quadratic
    // expansion IS the output here; the grid join spreads hot groups
    val within = PairGen.candidatePairs(
        in.select(col("id"), col("s").as("block_key")),
        maxBlockSize = Int.MaxValue, chunkTarget = chunkTarget)
      .select(col("id1"), col("id2"), lit(0L).as("dist"))

    // cross-string pairs: map representative ids back to strings, then
    // expand each matched string pair to its member id pairs (two
    // equi-joins, output-bound)
    val repToS = names.select(col("id"), col("s"))
    val cross = repPairs
      .join(repToS.withColumnsRenamed(Map("id" -> "id1", "s" -> "sa")), "id1")
      .join(repToS.withColumnsRenamed(Map("id" -> "id2", "s" -> "sb")), "id2")
      .select(col("sa"), col("sb"), col("dist"))
      .join(in.withColumnsRenamed(Map("id" -> "ia", "s" -> "sa")), "sa")
      .join(in.withColumnsRenamed(Map("id" -> "ib", "s" -> "sb")), "sb")
      .select(least(col("ia"), col("ib")).as("id1"),
        greatest(col("ia"), col("ib")).as("id2"), col("dist"))
    within.unionByName(cross)
  }

  /** The q-gram prefix-filtered join proper, assuming DISTINCT strings
    * (one id per s). Public callers use [[selfJoin]]. */
  private def distinctSelfJoin(recs: DataFrame, k: Int, q: Int,
      chunkTarget: Int): DataFrame = {
    val in = recs.select(col("id"), col("s"))
    val grams = in
      .select(col("id"), col("s"),
        array_distinct(gfunctions.char_ngrams(col("s"), q)).as("g"))
      .withColumn("ng", size(col("g")))
    val short = grams.filter(col("ng") <= k * q)
    val long = grams.filter(col("ng") > k * q)

    // global gram order = (df asc, gram asc); per-record sort only (no
    // global rank window), as in SetSimJoin
    val dfreq = grams.select(explode(col("g")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val longPrefix = long.select(col("id"), explode(col("g")).as("gram"))
      .join(dfreq, "gram")
      .groupBy("id")
      .agg(slice(
        transform(array_sort(collect_list(struct(col("df"), col("gram")))),
          x => x.getField("gram")),
        1, k * q + 1).as("pref"))
      .select(col("id"), explode(col("pref")).as("key"))
    // short records: whole gram set as keys (covers short-vs-long via
    // the prefix theorem) + one shared all-pairs block (short-vs-short).
    // Distinct "g:"/"s:" namespaces - a q-gram can never alias the
    // sentinel.
    val blocks = longPrefix
      .unionByName(short.select(col("id"), explode(col("g")).as("key")))
      .select(col("id"), concat(lit("g:"), col("key")).as("block_key"))
      .unionByName(short.select(col("id"), lit("s:all").as("block_key")))

    val cands = PairGen.candidatePairs(blocks,
      maxBlockSize = Int.MaxValue, chunkTarget = chunkTarget)
    PairGen.attachFields(cands, in, "id", Seq("s"))
      .filter(abs(length(col("s_1")) - length(col("s_2"))) <= k)
      // threshold variant = banded O(k·n) DP, -1 past the band; equal to
      // the full distance whenever it is <= k, so the kept rows carry the
      // exact distance
      .withColumn("dist", levenshtein(col("s_1"), col("s_2"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
