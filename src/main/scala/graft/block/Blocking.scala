package graft.block

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.model.PredicateSpec

/**
 * Predicate blocking — the reference's index-build stage
 * (`dedupe:predicates†` + `dedupe:blocking (Fingerprinter)†`, SURVEY.md §2.3).
 *
 * Every predicate maps a row to an array<string> of block keys; keys are
 * prefixed "{predIdx}:" so distinct predicates never collide (the reference
 * qualifies keys by predicate the same way†). The blocking map is
 * `select(id, explode(array_distinct(keys)))` — a Generator, no shuffle.
 */
object Blocking {

  /** Column of block keys (array<string>, no prefix) for one predicate. */
  def predicateKeys(p: PredicateSpec): Column = {
    val col0 = col(p.field)
    p.kind match {
      case "whole" => array(col0)
      case "token" => tokens(col0)
      case "first_token" =>
        // slice() keeps it array-typed and yields array() for empty input
        slice(tokens(col0), 1, 1)
      case "shingle" => token_shingles(tokens(col0), math.max(2, p.n))
      case "ngram" => char_ngrams(col0, math.max(2, p.n))
      case "prefix" => array(substring(col0, 1, math.max(1, p.n)))
      case "suffix" => suffixes(col0, minLen = math.max(3, p.n), cap = 16)
      case "acronym" =>
        array(array_join(transform(array_sort(tokens(col0)), t => substring(t, 1, 1)), ""))
      case "fingerprint" =>
        array(array_join(array_sort(array_distinct(tokens(col0))), ""))
      case "integer" => regexp_extract_all(col0, lit("\\d+"), lit(0))
      // ---- B10 numeric predicate family (dedupe:predicates†) ----
      case "first_integer" =>
        // integer prefix of the field (dedupe: re.match(r'\d+')† — start
        // anchored); no key when the field doesn't start with a digit
        filter(array(regexp_extract(col0, "^(\\d+)", 1)), k => length(k) > 0)
      case "near_integer" =>
        // each integer i → keys {i-1, i, i+1}: two records sharing any
        // integer within ±1 collide
        array_distinct(flatten(transform(
          regexp_extract_all(col0, lit("\\d+"), lit(0)),
          s => {
            val i = s.cast("long")
            array((i - 1).cast("string"), i.cast("string"), (i + 1).cast("string"))
          })))
      case "hundred_integer" =>
        // each integer floored to its hundred (i - i % 100)
        array_distinct(transform(
          regexp_extract_all(col0, lit("\\d+"), lit(0)),
          s => {
            val i = s.cast("long")
            (i - pmod(i, lit(100L))).cast("string")
          }))
      case "order_of_magnitude" =>
        // numeric field → round(log10(|x|)) as the key; 0/null → no key
        filter(
          array(when(abs(col0.cast("double")) > 0,
            round(log10(abs(col0.cast("double")))).cast("long").cast("string"))),
          k => k.isNotNull)
      case "round_to_1" =>
        // numeric field rounded to 1 significant figure (dedupe roundTo1†):
        // x → round(x / 10^floor(log10|x|)) * 10^floor(log10|x|);
        // fixed-point render, trailing zeros stripped ("1000", "0.005")
        filter(
          array(when(abs(col0.cast("double")) > 0, {
            val d = col0.cast("double")
            val mag = floor(log10(abs(d)))
            val p10 = pow(lit(10.0), mag)
            regexp_replace(
              (round(d / p10) * p10).cast("decimal(38,6)").cast("string"),
              "\\.?0+$", "")
          }).otherwise(when(col0.cast("double") === 0.0, lit("0")))),
          k => k.isNotNull)
      case "alphanum" => regexp_extract_all(col0, lit("[a-z0-9]+"), lit(0))
      // ---- B13 set predicates over array columns (dedupe:predicates†) ----
      case "whole_set" =>
        // the whole (distinct, sorted) set as one key
        array(array_join(array_sort(array_distinct(col0.cast("array<string>"))), " "))
      case "common_set" => // each element is a key
        array_distinct(col0.cast("array<string>"))
      case "first_set_element" => slice(array_sort(col0.cast("array<string>")), 1, 1)
      case "last_set_element" => slice(array_sort(col0.cast("array<string>")), -1, 1)
      case "common_set_2" | "common_set_3" => {
        // all k-element subsets of the sorted distinct set (dedupe
        // commonTwo/ThreeElementsPredicate†); element order canonical so
        // the same subset always yields the same key
        val sorted = array_sort(array_distinct(col0.cast("array<string>")))
        if (p.kind == "common_set_2")
          flatten(transform(sorted, (x, i) =>
            transform(slice(sorted, i + 2, size(sorted)), y => concat(x, lit(" "), y))))
        else
          flatten(flatten(transform(sorted, (x, i) =>
            transform(slice(sorted, i + 2, size(sorted)), (y, j) =>
              transform(slice(sorted, i + j + 3, size(sorted)), z =>
                concat(x, lit(" "), y, lit(" "), z))))))
      }
      case "magnitude_cardinality" =>
        // order of magnitude of the set size (dedupe magnitudeOfCardinality†)
        filter(
          array(when(size(col0) > 0,
            round(log10(size(col0).cast("double"))).cast("long").cast("string"))),
          k => k.isNotNull)
      case "latlong_grid" =>
        // B14 (`dedupe:predicates (latLongGridPredicate)†`): one key =
        // the containing grid cell of the record's (lat, lon); cell side
        // = p.n degrees (≥1 — dedupe truncates to a 0.1° grid, but
        // integer-degree cells keep the key arithmetic float-exact in
        // both engines at any coordinate). Convention: field `f` reads
        // columns `f_lat` / `f_lon` (the haversine_ comparator's pairing
        // convention, Scoring.featureColumn); either side null → no key.
        val cell = lit(math.max(1, p.n).toDouble)
        val latC = col(s"${p.field}_lat"); val lonC = col(s"${p.field}_lon")
        val key = concat(
          floor(latC / cell).cast("long").cast("string"), lit(":"),
          floor(lonC / cell).cast("long").cast("string"))
        filter(array(when(latC.isNotNull && lonC.isNotNull, key)), k => k.isNotNull)
      case "exists" => array(when(col0.isNull, lit("0")).otherwise(lit("1")))
      case "metaphone" => array_distinct(metaphone_tokens(tokens(col0)))
      case "simhash" =>
        // LSH banding of the 64-bit simhash: `bands` bands of 64/bands bits;
        // two docs within small hamming distance share >=1 band key w.h.p.
        val bands = math.max(1, p.bands)
        val width = 64 / bands
        val h = simhash64(tokens(col0))
        val cols = (0 until bands).map { b =>
          concat(lit(s"$b#"), conv(
            hex(shiftrightunsigned(h, b * width).bitwiseAND(
              // JVM shifts are mod 64: bands=1 -> width=64 -> (1L<<64)-1
              // would be 0, masking EVERY hash to one degenerate key
              lit(if (width >= 64) -1L else (1L << width) - 1))),
            16, 16))
        }
        array(cols: _*)
      case "simhash_combo" =>
        // Manku et al. (WWW '07)†-style block-combination banding — the
        // crawl-scale replacement for plain banding. Plain `simhash` with
        // 4 bands keys on 16 bits: chance collisions add O(n²/2^16)
        // candidate pairs, a component that saturates the candidate set at
        // megadoc corpora (measured: +10% superlinear pairs at 400k docs
        // on the volume-scaling corpus). Splitting the hash into b blocks
        // and keying on every (b-k)-subset keeps the same structural
        // recall guarantee — k bit errors corrupt at most k blocks, so
        // some (b-k)-subset is clean on both sides (pigeonhole) — while
        // widening keys to >=31 bits (b=6, k=3): collisions drop to
        // O(n²/2^31) for C(6,3)=20 keys per doc instead of 4.
        // p.n = k (max guaranteed hamming distance). p.bands = b (blocks)
        // only when it exceeds 2k — any smaller value (including the
        // case-class default 4) floors to the b=2k Manku sweet spot,
        // because b <= 2k shrinks subsets below k blocks (<32 bits of
        // key): b=4,k=3 would emit four SINGLE 16-bit blocks — plain
        // banding with the exact collision profile this kind exists to
        // suppress.
        val k = if (p.n <= 0) 3 else p.n
        val b = if (p.bands > 2 * k) p.bands else 2 * k
        array(simhashComboKeys(simhash64(tokens(col0)), b, k): _*)
      case "compound" =>
        // cross-product of two sub-predicates' keys (B16)
        require(p.sub.size == 2, "compound predicate needs exactly 2 subs")
        val a = coalesce(predicateKeys(p.sub.head), array())
        val b = coalesce(predicateKeys(p.sub(1)), array())
        flatten(transform(a, ka => transform(b, kb => concat(ka, lit(":"), kb))))
      case other => throw new IllegalArgumentException(s"unknown predicate kind: $other")
    }
  }

  /** Block-combination simhash keys over a precomputed 64-bit hash column
    * (the `simhash_combo` predicate's kernel, factored out so the
    * pigeonhole guarantee is testable on raw hashes): the hash is split
    * into `blocks` contiguous blocks (widths differ by at most one bit
    * when 64 % blocks != 0) and one key is emitted per (blocks-k)-subset,
    * `<subsetIndex>#<blockValue>-<blockValue>-...`. Any two hashes within
    * hamming distance k share at least one key. A null hash yields null
    * keys (NOT keys of empty joined values — concat_ws skips nulls, which
    * would herd every null-field record into the same 20 degenerate
    * buckets); null keys are dropped by allKeys' element filter and never
    * survive candidatePairs' equi-join. */
  private[graft] def simhashComboKeys(h: Column, blocks: Int, k: Int): Seq[Column] = {
    require(blocks > k && k >= 1, s"need blocks > k >= 1, got blocks=$blocks k=$k")
    require(blocks <= 64, s"at most 64 blocks, got $blocks")
    val base = 64 / blocks
    val rem = 64 % blocks // first `rem` blocks are one bit wider
    val widths = (0 until blocks).map(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    def block(i: Int): Column =
      shiftrightunsigned(h, offsets(i)).bitwiseAND(
        lit(if (widths(i) >= 64) -1L else (1L << widths(i)) - 1))
    (0 until blocks).combinations(blocks - k).toSeq.zipWithIndex.map {
      case (subset, si) =>
        when(h.isNotNull, concat(lit(s"$si#"),
          concat_ws("-", subset.map(i => block(i).cast("string")): _*)))
    }
  }

  /** All predicates, prefixed and concatenated into one array<string>. */
  def allKeys(preds: Seq[PredicateSpec]): Column = {
    val perPred = preds.zipWithIndex.map { case (p, i) =>
      // array_distinct BEFORE the union: a predicate emitting the same key
      // twice for one record must not double-pair it. COALESCE to empty:
      // flatten() returns NULL if ANY element array is NULL (verified on
      // Spark 4.1.2), so one predicate null-propagating over a null field
      // (token of an empty text_norm, regexp over null, ...) would
      // otherwise silently erase the record's keys from EVERY predicate —
      // its duplicates become unfindable with no error.
      coalesce(
        transform(array_distinct(predicateKeys(p)), k => concat(lit(s"$i:"), k)),
        array())
    }
    if (perPred.isEmpty) array()
    // drop null ELEMENTS too (a null key inside one predicate's array,
    // e.g. whole-field over null): they explode into null block_key rows
    // that never equi-join but inflate the blocking map
    else filter(array_distinct(flatten(array(perPred: _*))), k => k.isNotNull)
  }

  /**
   * Blocking map: (id, block_key), one row per (record, key).
   * Narrow (scan + generate) — the shuffle happens later in pair-gen.
   * Fields referenced by predicates must already exist on `df`.
   */
  def blockingMap(df: DataFrame, preds: Seq[PredicateSpec], idCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(allKeys(preds)).as("block_key"))

  /** Block-size histogram (for skew metrics + cap decisions): one pass. */
  def blockStats(blocks: DataFrame): DataFrame =
    blocks.groupBy("block_key").agg(count("*").as("block_size"))
}
