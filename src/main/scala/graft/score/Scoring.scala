package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.model.Model

/**
 * Pairwise field scoring + logistic-regression classification
 * (`dedupe:core (fns fieldDistances, scoreDuplicates)†`, SURVEY.md §2.5).
 *
 * Features are FLAT COLUMNS (not a vector) so Catalyst prunes and fuses
 * them into one whole-stage-codegen span; the reference's numpy feature
 * matrix becomes per-pair column arithmetic (BASELINE.json:6).
 *
 * A feature name encodes comparator + field: "<kind>_<field>", e.g.
 *   jw_text_norm        Jaro-Winkler on text_norm_1/text_norm_2  (C1')
 *   lev_<f>             normalized Levenshtein similarity         (C1')
 *   cosine_tfidf_<f>    TF-IDF cosine over <f>_tfidf map columns  (C2)
 *   exact_<f>           equality dummy                            (C6)
 *   missing_<f>         is-missing dummy (either side null)       (C8)
 *   dt_<f>              |Δ seconds| / 86400 on timestamp fields   (C5)
 *   logratio_<f>        |log10(a)-log10(b)| on numerics           (C3)
 *   hamming_<f>         simhash hamming similarity 1 - d/64
 *   inter_<a>__<b>      interaction term: product of features a,b (C7)
 *   cat_<f>__<x>__<y>   categorical pair dummy: 1 iff {f1,f2}={x,y} (C6)
 * The model's learned weights key this registry — mirrors "dedupe's
 * learned field weights" (BASELINE.json:6).
 */
object Scoring {

  /** Every known feature-name prefix — the single source of truth for the
    * `inter_` sub-feature split test here and in Dedupe.requiredFields
    * (the two resolvers MUST agree or field attachment and scoring pick
    * different interaction sub-features). */
  private[graft] val featurePrefixes = Seq("jw_", "lev_", "cosine_tfidf_",
    "exact_", "missing_", "dt_", "logratio_", "hamming_", "affine_",
    "haversine_", "inter_", "cat_")

  /** Feature column for one named feature over an attached-pairs frame
    * (columns `<field>_1`, `<field>_2` present; see PairGen.attachFields). */
  def featureColumn(name: String): Column = {
    def f1(f: String) = col(s"${f}_1")
    def f2(f: String) = col(s"${f}_2")
    val c = name match {
      case n if n.startsWith("jw_") =>
        val f = n.stripPrefix("jw_"); jaro_winkler(f1(f), f2(f))
      case n if n.startsWith("lev_") =>
        val f = n.stripPrefix("lev_"); levenshtein_sim(f1(f), f2(f))
      case n if n.startsWith("cosine_tfidf_") =>
        val f = n.stripPrefix("cosine_tfidf_")
        tfidfCosine(col(s"${f}_tfidf_1"), col(s"${f}_tfidf_2"))
      case n if n.startsWith("exact_") =>
        val f = n.stripPrefix("exact_"); (f1(f) === f2(f)).cast("double")
      case n if n.startsWith("missing_") =>
        val f = n.stripPrefix("missing_")
        (f1(f).isNull || f2(f).isNull).cast("double")
      case n if n.startsWith("dt_") =>
        val f = n.stripPrefix("dt_")
        abs(unix_timestamp(f1(f)) - unix_timestamp(f2(f))).cast("double") / 86400.0
      case n if n.startsWith("logratio_") =>
        val f = n.stripPrefix("logratio_"); abs(log10(f1(f)) - log10(f2(f)))
      case n if n.startsWith("hamming_") =>
        val f = n.stripPrefix("hamming_")
        lit(1.0) - hamming64(f1(f), f2(f)).cast("double") / 64.0
      case n if n.startsWith("affine_") =>
        val f = n.stripPrefix("affine_"); affine_gap(f1(f), f2(f))
      case n if n.startsWith("haversine_") =>
        val f = n.stripPrefix("haversine_")
        haversine_km(f1(s"${f}_lat"), f1(s"${f}_lon"), f2(s"${f}_lat"), f2(s"${f}_lon"))
      case n if n.startsWith("inter_") =>
        // C7: interaction term — product of two named features (dedupe's
        // Interaction variable†). Sub-features are full registry names,
        // joined by "__": e.g. inter_jw_name__exact_lang. A sub-feature
        // name may ITSELF contain "__" (cat_ dummies), so a fixed
        // left-split is ambiguous: try each "__" split point left to
        // right and take the first where BOTH sides resolve.
        val body = n.stripPrefix("inter_")
        val splits = "__".r.findAllMatchIn(body).map(_.start).toSeq
        require(splits.nonEmpty, s"interaction needs two features: $n")
        // a split is eligible only when BOTH sides carry a known feature
        // prefix — the same test Dedupe.requiredFields applies, so column
        // attachment and scoring always agree on the pick. (Try alone is
        // too permissive: most branches build Columns lazily without
        // validating the field, so a bogus split would "resolve" here and
        // fail later at analysis with a confusing missing-column error.)
        val resolved = splits.iterator
          .filter { at =>
            featurePrefixes.exists(body.substring(0, at).startsWith(_)) &&
              featurePrefixes.exists(body.substring(at + 2).startsWith(_))
          }
          .map { at =>
            val (a, b) = (body.substring(0, at), body.substring(at + 2))
            scala.util.Try(featureColumn(a) * featureColumn(b))
          }.collectFirst { case scala.util.Success(c) => c }
        resolved.getOrElse(throw new IllegalArgumentException(
          s"interaction sub-features do not resolve at any __ split: $n"))
      case n if n.startsWith("cat_") =>
        // C6: categorical pair dummy (dedupe's Categorical variable's
        // fixed-width one-hot over unordered value pairs†):
        // cat_<field>__<x>__<y> = 1.0 iff {f1,f2} == {x,y}. x==y encodes
        // the same-category dummy; a full categorical variable is one such
        // feature per unordered category pair, each with a learned weight.
        val parts = n.stripPrefix("cat_").split("__", 3)
        require(parts.length == 3, s"categorical dummy needs field+2 values: $n")
        val (f, x, y) = (parts(0), parts(1), parts(2))
        ((f1(f) === x && f2(f) === y) || (f1(f) === y && f2(f) === x)).cast("double")
      case other => throw new IllegalArgumentException(s"unknown feature: $other")
    }
    // missing-data policy (C8): a null comparator value contributes 0; the
    // paired missing_<f> dummy carries the signal (dedupe's has-missing†).
    if (name.startsWith("missing_")) c else coalesce(c, lit(0.0))
  }

  /** TF-IDF cosine between two pre-normalized map<string,double> vectors:
    * dot product over the key union (missing → 0). Direct Catalyst kernel
    * (C2) — value- and order-identical to the built-in composition
    * `aggregate(map_values(map_zip_with(a,b,coalesce·*)))` but without its
    * per-pair map allocations (see ExprKernels2.mapDot). */
  def tfidfCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.MapDotExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /**
   * Append per-feature columns + the LR score
   * σ(bias + Σ wᵢ·fᵢ) as column `score` (C9 + C10, inference only —
   * weights come from the model fixture, SURVEY.md §2.8 T2).
   */
  def scorePairs(attached: DataFrame, model: Model): DataFrame = {
    val withFeatures = model.featureNames.foldLeft(attached) { (df, f) =>
      df.withColumn(f, featureColumn(f))
    }
    val z = model.featureNames.foldLeft(lit(model.bias)) { (acc, f) =>
      acc + lit(model.weights(f)) * col(f)
    }
    withFeatures.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /**
   * Match explainability — the review-UI "why did these match" panel
   * (the reference surfaces only the opaque score; production reviewers
   * need the per-feature breakdown): one row per (pair, feature) with
   * the raw comparator value, the learned weight, and the contribution
   * w·f, plus the model bias and the final σ score on every row. A melt
   * of [[scorePairs]]' own columns, so it shares the scoring semantics
   * by construction — per-row explode, no extra shuffle.
   */
  def explainPairs(attached: DataFrame, model: Model): DataFrame = {
    val melted = explode(array(model.featureNames.map(f =>
      struct(lit(f).as("feature"),
        col(f).cast("double").as("value"),
        lit(model.weights(f)).as("weight"),
        (lit(model.weights(f)) * col(f)).cast("double").as("contribution"))): _*))
    scorePairs(attached, model)
      .select(col("id1"), col("id2"), col("score"), melted.as("x"))
      .select(col("id1"), col("id2"),
        col("x.feature").as("feature"), col("x.value").as("value"),
        col("x.weight").as("weight"), col("x.contribution").as("contribution"),
        lit(model.bias).as("bias"), col("score"))
  }

  /**
   * Corpus pass for TF-IDF (C2): per-doc L2-normalized map<term, tf·idf>.
   * One aggregation for document frequencies; IDF joined back per-term.
   * At cluster scale the DF table is tiny relative to the corpus
   * (vocabulary-sized) and the join is broadcast by AQE.
   * Output: input columns + `<field>_tfidf: map<string,double>`.
   */
  def withTfidfVectors(df: DataFrame, field: String, idCol: String,
      minDf: Int = 1, topK: Int = 64): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(field))).as("term"))
    val tf = toks.groupBy(idCol, "term").agg(count("*").cast("double").as("tf"))
    val nDocs = df.count().toDouble
    val dfreq = toks.distinct().groupBy("term")
      .agg(count("*").as("df"))
      .filter(col("df") >= minDf)
      .withColumn("idf", log(lit(nDocs + 1.0) / (col("df") + 1.0)) + 1.0)
    val weighted = tf.join(dfreq, "term")
      .withColumn("w", col("tf") * col("idf"))
    // top-k terms per doc bounds vector width (canopy-index analog cap)
    val ranked = weighted
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col("w").desc, col("term"))))
      .filter(col("rk") <= topK)
    // entries sorted by term: MapDotExpr's two-cursor merge kernel needs
    // key-ascending maps (it falls back to a quadratic scan otherwise)
    val vecs = ranked.groupBy(idCol)
      .agg(map_from_entries(array_sort(collect_list(struct(col("term"), col("w")))))
        .as("_rawvec"))
      .withColumn("_norm", sqrt(aggregate(
        map_values(col("_rawvec")), lit(0.0d), (acc, v) => acc + v * v)))
      .select(col(idCol),
        transform_values(col("_rawvec"), (_, v) => v / col("_norm"))
          .as(s"${field}_tfidf"))
    df.join(vecs, Seq(idCol), "left")
  }
}
