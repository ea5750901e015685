package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** A Common-Crawl-style page row — the north-rule input shape
  * (BASELINE.json:15 input_hint). `text` is the per-row invariant surface:
  * it is carried through the pipeline untouched (byte-identity). */
case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** One blocking predicate to apply (mirrors the reference's learned
  * predicate list stored in the pickled settings†, SURVEY.md §1.1).
  * kind ∈ {whole, token, first_token, shingle, ngram, prefix, suffix,
  *         acronym, fingerprint, simhash, simhash_combo, exists,
  *         compound, metaphone,
  *         integer, first_integer, near_integer, hundred_integer,
  *         order_of_magnitude, round_to_1, alphanum,           — B10
  *         whole_set, common_set, first_set_element, last_set_element,
  *         common_set_2, common_set_3, magnitude_cardinality}  — B13 */
case class PredicateSpec(
    kind: String,
    field: String,
    n: Int = 0,
    bands: Int = 4,
    sub: Seq[PredicateSpec] = Nil)

/** Learned model — plain JSON on disk, broadcast to executors; replaces the
  * reference's pickled settings (`dedupe:api StaticDedupe†`). Feature names
  * in `weights` key the comparator registry (graft.score.Comparators). */
case class Model(
    bias: Double,
    weights: Map[String, Double],
    threshold: Double,
    predicates: Seq[PredicateSpec]) {
  def featureNames: Seq[String] = weights.keys.toSeq.sorted
}

object Model {
  implicit private val fmt: Formats = DefaultFormats

  def fromJson(json: String): Model = {
    val j = JsonMethods.parse(json)
    val preds = (j \ "predicates") match {
      case JArray(items) => items.map(parsePred)
      case _ => Nil
    }
    Model(
      bias = (j \ "bias").extract[Double],
      weights = (j \ "weights").extract[Map[String, Double]],
      threshold = (j \ "threshold").extractOrElse[Double](0.5),
      predicates = preds)
  }

  private def parsePred(j: JValue): PredicateSpec = PredicateSpec(
    kind = (j \ "kind").extract[String],
    field = (j \ "field").extractOrElse[String](""),
    n = (j \ "n").extractOrElse[Int](0),
    bands = (j \ "bands").extractOrElse[Int](4),
    sub = (j \ "sub") match {
      case JArray(items) => items.map(parsePred)
      case _ => Nil
    })

  def toJson(m: Model): String = {
    def predJson(p: PredicateSpec): JValue = JObject(
      "kind" -> JString(p.kind), "field" -> JString(p.field),
      "n" -> JInt(p.n), "bands" -> JInt(p.bands),
      "sub" -> JArray(p.sub.map(predJson).toList))
    JsonMethods.compact(JsonMethods.render(JObject(
      "bias" -> JDouble(m.bias),
      "weights" -> JObject(m.weights.toList.sortBy(_._1).map { case (k, v) => k -> (JDouble(v): JValue) }),
      "threshold" -> JDouble(m.threshold),
      "predicates" -> JArray(m.predicates.map(predJson).toList))))
  }
}
