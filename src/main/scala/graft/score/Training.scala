package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Model, PredicateSpec}

/**
 * Training support (SURVEY.md §2.8) — the engine's contract is model-in /
 * scores-out, but the loop closes here:
 *
 *  - T1 blocked sampling: training pairs drawn preferentially from shared
 *    blocks plus a uniform random floor (`dedupe:sampling†`). Deterministic
 *    seeds only (driver determinism rule).
 *  - LR fit: L2-regularized logistic regression on labeled pairs' feature
 *    columns. The labeled set is human-sized (the reference caps active
 *    learning at hundreds of pairs†), so the fit is DRIVER-SIDE batch
 *    gradient descent on collected features — no distributed training
 *    machinery for a 10²-row problem; the expensive part (feature
 *    computation) is Spark.
 *  - T3 greedy predicate cover (`dedupe:training (BlockLearner)†`): pick
 *    predicates maximizing covered duplicate pairs, penalized by block
 *    volume — driver-side greedy set cover over Spark-computed stats.
 */
object Training {

  /** T1: sample candidate pairs for labeling — blocked pairs (they carry
    * signal) topped up with random record pairs (they anchor the negative
    * class). All seeded. */
  def samplePairsForLabeling(records: DataFrame, blockedPairs: DataFrame,
      nBlocked: Int, nRandom: Int, seed: Long = 42L): DataFrame = {
    val blockedFrac = {
      val n = blockedPairs.count().toDouble
      if (n == 0) 0.0 else math.min(1.0, nBlocked * 1.2 / n)
    }
    // pre-thinning is a seeded HASH THRESHOLD, not df.sample(): Spark's
    // sample seeds per PARTITION, so the thinned superset (and with it
    // the labeled sample and the model fitted on it) changed with
    // partition layout; xxhash64 < frac·2^20 keeps the same binomial
    // thinning as a pure function of (data, seed) — which is also what
    // lets q_training_sample carry a frozen oracle
    def hashKeep(h: org.apache.spark.sql.Column, frac: Double) =
      pmod(h, lit(1048576L)) < lit((frac * 1048576L).toLong)
    // orderBy before limit: a bare limit() keeps whichever rows arrive
    // first under the physical plan — the seeded hash order makes the
    // final pick a pure function of the (now partition-free) superset
    val blockedThinned =
      if (blockedFrac >= 1.0) blockedPairs
      else blockedPairs.filter(
        hashKeep(xxhash64(col("id1"), col("id2"), lit(seed + 3)), blockedFrac))
    val fromBlocks = blockedThinned
      .orderBy(xxhash64(col("id1"), col("id2"), lit(seed)))
      .limit(nBlocked)
    val ids = records.select(col("id"))
    val rFrac = math.min(1.0, 4.0 * nRandom / math.max(1, records.count()))
    val r1 = (if (rFrac >= 1.0) ids
      else ids.filter(hashKeep(xxhash64(col("id"), lit(seed + 4)), rFrac)))
      .withColumn("rnd", xxhash64(col("id"), lit(seed)))
    val r2 = r1.select(col("id").as("id2"), col("rnd").as("rnd2"))
    val random = r1.select(col("id").as("id1"), col("rnd"))
      .join(r2, col("rnd") < col("rnd2")) // deterministic half-pairing
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .orderBy(xxhash64(col("id1"), col("id2"), lit(seed + 2)))
      .limit(nRandom)
    fromBlocks.select("id1", "id2").unionByName(random).dropDuplicates("id1", "id2")
  }

  /**
   * Fit LR weights on labeled pairs. `labeledFeatures` must carry the
   * feature columns named in `featureNames` plus a boolean/0-1 `label`.
   * Returns (weights, bias). Collected to the driver: labeled sets are
   * small by construction (active-learning scale).
   */
  def fitLR(labeledFeatures: DataFrame, featureNames: Seq[String],
      l2: Double = 0.1, epochs: Int = 500, lr: Double = 0.5): (Map[String, Double], Double) = {
    val rows = labeledFeatures
      .select((featureNames.map(f => coalesce(col(f), lit(0.0)).cast("double")) :+
        col("label").cast("double")): _*)
      .collect()
      .map(r => (featureNames.indices.map(r.getDouble).toArray, r.getDouble(featureNames.length)))
    require(rows.nonEmpty, "no labeled pairs")
    val k = featureNames.length
    val w = new Array[Double](k)
    var b = 0.0
    val n = rows.length.toDouble
    var e = 0
    while (e < epochs) {
      val gw = new Array[Double](k)
      var gb = 0.0
      rows.foreach { case (x, y) =>
        var z = b
        var i = 0
        while (i < k) { z += w(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y
        i = 0
        while (i < k) { gw(i) += d * x(i); i += 1 }
        gb += d
      }
      var i = 0
      while (i < k) { w(i) -= lr * (gw(i) / n + l2 * w(i) / n); i += 1 }
      b -= lr * gb / n
      e += 1
    }
    (featureNames.zip(w).toMap, b)
  }

  /**
   * Deterministic micro-unit LR fit over FIXED pair-feature columns —
   * the oracle-checkable twin of [[fitLR]] for the composed
   * active-learning round-trip (q_al_round; SURVEY §3.3). Borrows
   * GradLR's determinism contract (score/GradLR.scala): feature values
   * quantize to exact 1e-6 micro-units (long), weights live in
   * micro-units, a pair's margin Σ xq_j·wq_j is an exact integer in
   * 1e-12 units, σ(margin/1e12) is one libm call whose last-ulp noise
   * is absorbed by rounding each per-pair gradient contribution
   * round(xq_j·r) to a long BEFORE the order-independent sum — so
   * training is bit-reproducible across partitionings, AQE re-plans,
   * and engines (the DuckDB twin unrolls the identical steps).
   *
   * Scale shape: each step is ONE map-side-combinable aggregation over
   * the labeled frame; the driver only ever sees the (k+1)-element
   * sufficient statistic (gradient vector + row count), never rows —
   * the FS/EM collapse pattern. Labeled sets are human-batch-sized by
   * construction, but nothing here degrades if they are not.
   *
   * All rounding is HALF_UP (away from zero on ties) to match both
   * Spark's `round` and DuckDB's — including the driver-side weight
   * update, which goes through BigDecimal rather than `math.round`
   * (floor(x+0.5) disagrees at negative halves).
   *
   * @return weights in micro-units by feature name; bias under "__bias__"
   */
  def fitLRQuantized(labeled: DataFrame, featureNames: Seq[String],
      labelCol: String, iters: Int, learnRate: Double): Map[String, Long] = {
    require(iters >= 1, "need at least one step")
    val k = featureNames.length
    val xq = featureNames.map(f =>
      round(coalesce(col(f), lit(0.0)) * lit(1e6), 0).cast("long")) :+
      lit(1000000L)
    var w = Array.fill(k + 1)(0L)
    for (_ <- 1 to iters) {
      val margin = xq.zip(w).map { case (x, wj) => x * lit(wj) }
        .reduce(_ + _)
      val r = lit(1.0) /
        (lit(1.0) + exp(-margin.cast("double") / lit(1e12))) -
        col(labelCol).cast("double")
      val aggs = xq.map(x =>
        sum(round(x.cast("double") * r, 0).cast("long"))) :+ count(lit(1))
      val row = labeled.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getLong(k + 1).toDouble
      require(n > 0, "no labeled pairs")
      w = Array.tabulate(k + 1) { j =>
        w(j) - BigDecimal(learnRate * row.getLong(j) / n)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    (featureNames :+ "__bias__").zip(w).toMap
  }

  /** Convenience: labeled (id1,id2,label) → features via the comparator
    * registry → fitted Model reusing `base`'s predicates/threshold. */
  def trainModel(attachedLabeled: DataFrame, base: Model,
      l2: Double = 0.1): Model = {
    val names = base.featureNames
    val feats = names.foldLeft(attachedLabeled) { (df, f) =>
      df.withColumn(f, Scoring.featureColumn(f))
    }
    val (w, b) = fitLR(feats, names, l2)
    base.copy(weights = w, bias = b)
  }

  /**
   * T2 (batch analog of dedupe's active-labeling step†): select the next
   * `batchSize` candidate pairs for human labeling — the pairs the current
   * model is least certain about (uncertainty sampling, Lewis & Gale SIGIR
   * 1994†; dedupe surfaces the pair nearest the decision boundary†), with a
   * per-record diversity cap so one ambiguous record cannot monopolize the
   * label budget by appearing in every selected pair.
   *
   * `scored` must carry (id1, id2, z) where z = w·d + b is the LR logit.
   * Uncertainty ranks by |z|, not |σ(z) − 0.5|: σ is strictly monotone with
   * σ(0) = 0.5, so the two orders are identical — but |z| is plain IEEE
   * mul/add over the comparator columns (bit-reproducible across engines)
   * while exp() differs in ULPs between libm implementations, which would
   * make the selected batch non-reproducible. Ties break by (id1, id2), so
   * the batch is a pure function of the candidate set.
   *
   * Scale shape: NO global window over the pair stream. Stage 1 keeps each
   * record's `perRecordCap` most-uncertain incident pairs via windows
   * partitioned by endpoint id — each partition is one record's candidate
   * fan-out (bounded by blocking, not corpus size) — and a pair survives
   * only if BOTH endpoints keep it (the mutual-rank condition of the
   * locally-dominant one-to-one matcher, cluster/OneToOne.scala). Stage 2's
   * global top-B runs on the pruned survivor set (≤ cap·|records| rows,
   * human-batch-sized target) as TakeOrderedAndProject — no full sort.
   * A record-cap stage that needed sequential greedy semantics would be
   * exactly b-matching; mutual-rank is its standard one-round relaxation
   * and is deterministic, which the labeling workflow needs more than the
   * last epsilon of coverage.
   */
  def uncertainBatch(scored: DataFrame, batchSize: Int,
      perRecordCap: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize > 0 && perRecordCap > 0, "batchSize/perRecordCap must be positive")
    // one scan, not a two-leg union: the union form read the (47M-row at
    // sf0.1) scored-pair input twice — explode of the two endpoint roles
    // produces the identical row set from a single pass
    val base = scored.select(col("id1"), col("id2"), col("z"))
    val roles = base.select(
      explode(array(col("id1"), col("id2"))).as("rid"),
      col("id1"), col("id2"), col("z"))
    // default cap 1 = each record's single most-uncertain pair: that is
    // a min_by AGGREGATE, not a rank — map-side partial combine replaces
    // the per-partition sort a row_number window pays over 2x the pair
    // stream (measured 2x ~15 s per pass on 47M pairs at sf0.1; the
    // struct order (|z|, id1, id2) is total, so the pick is identical)
    val kept =
      if (perRecordCap == 1)
        // min over ONE struct ordered (|z|, id1, id2, z): lexicographic
        // struct-min IS the (|z|, id1, id2) argmin — the 4th field only
        // orders at a full tie of the first three, i.e. the same pair —
        // and evaluates/compares one struct per row where min_by built two
        // (measured ~25% off the 94M-row aggregate)
        roles.groupBy(col("rid"))
          .agg(min(struct(abs(col("z")).as("az"), col("id1"), col("id2"),
            col("z"))).as("_p"))
          .select(col("_p.id1").as("id1"), col("_p.id2").as("id2"),
            col("_p.z").as("z"))
      else {
        val w = Window.partitionBy(col("rid"))
          .orderBy(abs(col("z")).asc, col("id1").asc, col("id2").asc)
        roles.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= perRecordCap)
          .select(col("id1"), col("id2"), col("z"))
      }
    // a pair appears once per endpoint role; mutual survival = 2 rows
    kept.groupBy(col("id1"), col("id2"), col("z"))
      .agg(count(lit(1)).as("sides"))
      .filter(col("sides") === 2)
      .select(col("id1"), col("id2"), col("z"))
      .orderBy(abs(col("z")).asc, col("id1").asc, col("id2").asc)
      .limit(batchSize)
  }

  /**
   * T3: greedy predicate cover. For each candidate predicate, Spark counts
   * (a) how many KNOWN duplicate pairs it covers (same key both sides) and
   * (b) its total pair volume Σ s·(s-1)/2. Greedy driver-side selection
   * maximizes marginal dup coverage while total volume stays under budget.
   */
  def greedyPredicateCover(records: DataFrame, dupePairs: DataFrame,
      candidates: Seq[PredicateSpec], maxPredicates: Int = 3,
      volumeBudget: Long = 10000000L): Seq[PredicateSpec] = {
    import graft.block.Blocking
    // ADVICE r5: the tagged-union reduce throws on an empty candidate
    // list where the old per-candidate loop returned an empty selection
    if (candidates.isEmpty) return Seq.empty
    // per-candidate: covered dup-pair set (collected as pair ids — labeled
    // dup sets are small) + volume. All candidates ride ONE tagged union
    // (candidate index as a column), so the whole census is two Spark
    // jobs total instead of two PER candidate — the round-4 note about
    // this loop crawling at hundreds of candidates
    val tagged = candidates.zipWithIndex.map { case (p, i) =>
      Blocking.blockingMap(records, Seq(p), "id")
        .select(lit(i).as("cand"), col("id"), col("block_key"))
    }.reduce(_ unionByName _)
    val volumes: Map[Int, Long] = tagged
      .groupBy("cand", "block_key").count()
      .groupBy("cand")
      .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0L))
        .cast("long").as("volume")) // Spark `/` is double division
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b1 = tagged.withColumnRenamed("id", "id1")
    val b2 = tagged.withColumnRenamed("id", "id2")
    val coveredBy: Map[Int, Set[(Long, Long)]] = dupePairs
      .join(b1, "id1").join(b2, Seq("cand", "id2", "block_key"))
      .select(col("cand"), col("id1"), col("id2")).distinct()
      .collect().groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    val stats = candidates.zipWithIndex.map { case (p, i) =>
      (p, coveredBy.getOrElse(i, Set.empty[(Long, Long)]),
        volumes.getOrElse(i, 0L))
    }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[PredicateSpec]
    val coveredSoFar = scala.collection.mutable.Set.empty[(Long, Long)]
    var volumeSoFar = 0L
    var continue = true
    while (continue && chosen.size < maxPredicates) {
      val remaining = stats.filterNot(s => chosen.contains(s._1))
        .filter(s => volumeSoFar + s._3 <= volumeBudget)
        .map(s => (s, (s._2 diff coveredSoFar).size))
        .filter(_._2 > 0)
      if (remaining.isEmpty) continue = false
      else {
        val best = remaining.maxBy(r => (r._2, -r._1._3))._1
        chosen += best._1
        coveredSoFar ++= best._2
        volumeSoFar += best._3
      }
    }
    chosen.toSeq
  }
}
