package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.schema.Transaction

/** The reference's core capability: the 5-stage fraud-detection ML
  * pipeline (SURVEY §2.4 M1–M9), with the reference's exact
  * hyperparameters (fraud_detection_model.py:123-169):
  *
  *   StringIndexer(type → type_indexed, handleInvalid=keep)
  *   OneHotEncoder(type_indexed → type_encoded)
  *   VectorAssembler([type_encoded ++ 6 numerics] → features_raw, keep)
  *   StandardScaler(features_raw → features, withMean, withStd)
  *   LogisticRegression(maxIter=10, regParam=0.3, elasticNetParam=0.8,
  *                      threshold=0.5, standardization=true,
  *                      label=isFraud)
  *
  * Deliberate deviations from the reference, all scale-driven:
  *  - class counts / confusion matrix are ONE conditional aggregate
  *    instead of 2 resp. 7 separate filter+count jobs
  *    (fraud_detection_model.py:197-198,259-271) — at 100 TB each
  *    extra job is a full scan;
  *  - predictions are persisted across the evaluator + metric passes
  *    (the reference recomputes lineage per action);
  *  - the `classWeight` column (fraud_detection_model.py:206-209) is
  *    reproduced, and — faithfully to the reference's latent bug — is
  *    NOT wired into the estimator by default: the reference never
  *    passes weightCol, so training is unweighted. `weighted = true`
  *    opts into the fix (setWeightCol).
  */
object FraudPipeline {
  val CategoricalCols: Seq[String] = Seq("type")
  val NumericCols: Seq[String] = Seq("step", "amount", "oldbalanceOrg",
    "newbalanceOrig", "oldbalanceDest", "newbalanceDest")
  val FeatureCols: Seq[String] = CategoricalCols ++ NumericCols

  final case class Metrics(
      auc: Double, accuracy: Double, precision: Double, recall: Double,
      f1: Double, tp: Long, fp: Long, tn: Long, fn: Long)

  /** M1–M6: the estimator chain (fraud_detection_model.py:102-177). */
  def buildPipeline(weighted: Boolean = false): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol("type").setOutputCol("type_indexed")
      .setHandleInvalid("keep")
    val encoder = new OneHotEncoder()
      .setInputCols(Array("type_indexed"))
      .setOutputCols(Array("type_encoded"))
    val assembler = new VectorAssembler()
      .setInputCols((CategoricalCols.map(_ + "_encoded") ++ NumericCols)
        .toArray)
      .setOutputCol("features_raw")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithStd(true).setWithMean(true)
    val lr = {
      val base = new LogisticRegression()
        .setFeaturesCol("features").setLabelCol("isFraud")
        .setMaxIter(10).setRegParam(0.3).setElasticNetParam(0.8)
        .setThreshold(0.5).setStandardization(true)
      if (weighted) base.setWeightCol("classWeight") else base
    }
    new Pipeline()
      .setStages(Array(indexer, encoder, assembler, scaler, lr))
  }

  /** M8: deterministic split (fraud_detection_model.py:86, seed 42). */
  def split(df: DataFrame, testFraction: Double = 0.2,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) =
      df.randomSplit(Array(1 - testFraction, testFraction), seed)
    (train, test)
  }

  /** classWeight projection — one scan for both class counts (the
    * reference runs two filter+count jobs), then the reference's
    * arithmetic `isFraud*ratio + (1-isFraud)` verbatim. */
  def withClassWeight(df: DataFrame): DataFrame = {
    val row = df.agg(
      sum(when(col("isFraud") === 1, 1L).otherwise(0L)).as("fraud"),
      count(lit(1)).as("total")).head()
    val fraud = row.getLong(0)
    val nonFraud = row.getLong(1) - fraud
    if (fraud == 0) df
    else {
      val ratio = nonFraud.toDouble / fraud
      df.withColumn("classWeight",
        col("isFraud") * ratio + (lit(1.0) - col("isFraud")))
    }
  }

  /** M6: fit (fraud_detection_model.py:217). */
  def train(df: DataFrame, weighted: Boolean = false): PipelineModel =
    buildPipeline(weighted).fit(withClassWeight(df))

  /** M7 + A2/A4: AUC via BinaryClassificationEvaluator plus the full
    * confusion matrix + derived metrics in ONE aggregate over a
    * persisted prediction frame — 2 jobs total vs the reference's 9
    * (fraud_detection_model.py:246-276). */
  def evaluate(model: PipelineModel, test: DataFrame): Metrics = {
    val preds = model.transform(test)
      .select(col("prediction"), col("rawPrediction"), col("isFraud"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val auc = new BinaryClassificationEvaluator()
        .setLabelCol("isFraud").setRawPredictionCol("rawPrediction")
        .setMetricName("areaUnderROC")
        .evaluate(preds)
      val r = preds.agg(
        sum(when(col("prediction") === 1.0 && col("isFraud") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("prediction") === 1.0 && col("isFraud") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("prediction") === 0.0 && col("isFraud") === 0, 1L)
          .otherwise(0L)).as("tn"),
        sum(when(col("prediction") === 0.0 && col("isFraud") === 1, 1L)
          .otherwise(0L)).as("fn")).head()
      val (tp, fp, tn, fn) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val total = tp + fp + tn + fn
      val accuracy = if (total > 0) (tp + tn).toDouble / total else 0.0
      val precision = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
      val recall = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
      val f1 =
        if (precision + recall > 0)
          2 * precision * recall / (precision + recall)
        else 0.0
      Metrics(auc, accuracy, precision, recall, f1, tp, fp, tn, fn)
    } finally preds.unpersist()
  }

  /** M9 + P7/P8/P9: score + project fraud_prediction (int cast) and
    * fraud_probability (P(fraud) = probability[1] via vector_to_array
    * — fraud_detection_model.py:392-399). */
  def predict(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df).select(
      col("*"),
      col("prediction").cast("int").as("fraud_prediction"),
      vector_to_array(col("probability")).getItem(1)
        .as("fraud_probability"))

  /** S12: model store — PipelineModel dir + feature_columns.json
    * sidecar + model_ready.txt signal file
    * (fraud_detection_model.py:328-337,360-367). */
  def save(model: PipelineModel, path: String): Unit = {
    model.write.overwrite().save(path)
    val features = FeatureCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    Files.writeString(Paths.get(path, "feature_columns.json"), features)
    Files.writeString(Paths.get(path).getParent.resolve("model_ready.txt"),
      "ready")
  }

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Metrics → the reference's model_metrics.json shape
    * (fraud_detection_model.py:278-299). */
  def metricsJson(m: Metrics): String =
    s"""{"auc":${m.auc},"accuracy":${m.accuracy},"precision":${m.precision},""" +
      s""""recall":${m.recall},"f1":${m.f1},"confusion_matrix":""" +
      s"""{"tp":${m.tp},"fp":${m.fp},"tn":${m.tn},"fn":${m.fn}}}"""
}
