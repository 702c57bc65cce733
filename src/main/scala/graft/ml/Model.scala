package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.ModelStore

/** Model trait + plugin registry — the Spark restatement of the
  * reference's model loading seam (/root/reference/loudml/model.py:445-468:
  * `load_model` resolves `settings['type']` through the `loudml.models`
  * entry-point registry; unknown type → `UnsupportedModel`).
  *
  * A [[ModelType]] is the factory ("entry point"): it trains a new
  * [[TrainedModel]] from a bucketed series or rehydrates one from storage.
  * A [[TrainedModel]] carries its small state (profile frame + settings
  * JSON) and answers predict/forecast with a common output schema
  * (`predicted`, `lower`, `upper`, `score` added to the input series), so
  * the scoring + hysteresis-scan + hooks pipeline downstream is
  * model-agnostic — exactly the seam the VAE upgrade path needs.
  *
  * Settings ride as JSON (the analog of the reference's settings dict,
  * persisted by `ModelStore` next to the profile parquet); each type owns
  * its schema and must include `"type": "<name>"` for load dispatch.
  */
final case class UnsupportedModel(modelType: String)
  extends IllegalArgumentException(s"unsupported model type: $modelType")

trait TrainedModel {
  def modelType: String
  /** Small state frame persisted as the checkpoint parquet (per-slot
    * profile, weights table, …). Model-sized, never a data-scale frame. */
  def profile: DataFrame
  /** Settings + trained scalars as JSON; must contain `"type"`. */
  def settingsJson: String

  /** Add `predicted`/`lower`/`upper`/`score` to a bucketed series. */
  def predict(bucketed: DataFrame, valueCol: String,
      anomalyType: String = "low_high"): DataFrame
  /** Future bands over `[from, to[` (no observations). */
  def forecast(spark: SparkSession, from: Long, to: Long): DataFrame

  /** Future bands at a requested confidence — the reference's forecast
    * parameters (/root/reference/loudml/donut.py:1338-1339,1415,1423):
    * half-width z·σ with z = Φ⁻¹(1−(1−percentInterval)/2), plus
    * deterministic noise growth over the horizon — the reference expands
    * each forecast step j by uniform(±noise·j) with
    * noise = percentNoise·bucket_interval/86400; the deterministic analog
    * widens the band by noise·j·|predicted| (the expansion's envelope).
    * `forecast` ≡ `forecastCI(…, 0.9973002039367398, 0)` (z = 3). */
  def forecastCI(spark: SparkSession, from: Long, to: Long,
      percentInterval: Double, percentNoise: Double): DataFrame

  /** Versioned checkpoint via [[graft.io.ModelStore]]; returns version. */
  def save(root: String, name: String): Int =
    ModelStore.save(profile, settingsJson, root, name)
}

trait ModelType {
  def name: String
  /** Train on a spine-complete bucketed series (`bucket: Long` epoch-sec
    * left edges, `valueCol: Double` nullable). */
  def train(bucketed: DataFrame, valueCol: String, settingsJson: String): TrainedModel
  /** Rehydrate from a stored (profile, settings) pair. */
  def load(spark: SparkSession, profile: DataFrame, settingsJson: String): TrainedModel
}

object ModelRegistry {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val types = scala.collection.concurrent.TrieMap.empty[String, ModelType]

  def register(t: ModelType): Unit = types.put(t.name, t)
  def apply(name: String): ModelType =
    types.getOrElse(name, throw UnsupportedModel(name))
  def names: Seq[String] = types.keys.toSeq.sorted

  /** `load_model` analog: dispatch on the persisted settings' `type`. */
  def load(spark: SparkSession, root: String, model: String,
      version: Option[Int] = None): TrainedModel = {
    val (profile, json) = ModelStore.load(spark, root, model, version)
    val tpe = JsonMethods.parse(json) \ "type" match {
      case JString(s) => s
      case _ => throw UnsupportedModel("(model has no type)")
    }
    apply(tpe).load(spark, profile, json)
  }

  // built-in types (the reference ships 'donut'; we ship the seasonal
  // baseline + the windowed reconstructor targeting donut's quality
  // floors + additive Holt-Winters for trending seasonal series + the
  // low-rank tied-weights autoencoder + the true Donut VAE)
  register(SeasonalModelType)
  register(WindowReconstructor)
  register(HoltWintersType)
  register(AutoencoderReconstructor)
  register(DonutVae)
}
