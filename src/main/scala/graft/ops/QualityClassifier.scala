package graft.ops

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained model-based quality filtering — the GPT-3/CCNet curation
  * component the rule-based scores ([[TextAnalysis]], Gopher filters)
  * feed into: a logistic regression over hashed bag-of-words features,
  * trained on a labeled SEED set (curated positives vs crawl negatives),
  * then scored over the whole corpus as a keep/drop probability.
  *
  * Scale shape: training runs on the seed — curated-set-sized, not
  * corpus-sized — with Spark ML's distributed L-BFGS; scoring is a
  * MAP-ONLY transform (hashing + one dot product per row, no shuffle),
  * so a 100 TB corpus scores at scan speed and the model broadcast is
  * `numFeatures` doubles (~256 KB at the default 2^15). Deterministic:
  * hashing is seedless murmur3 and L-BFGS on a fixed seed frame
  * converges to the same coefficients. */
object QualityClassifier {

  private def withWords(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__words", split(lower(trim(col(textCol))), "\\s+"))

  /** Fit the hashed-BoW logistic regression on `seed`.
    * @param labelCol double column, 1.0 = high quality */
  def train(seed: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 15, maxIter: Int = 50,
            regParam: Double = 1e-3): PipelineModel = {
    val tf = new HashingTF()
      .setInputCol("__words").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(tf, lr))
      .fit(withWords(seed, textCol))
  }

  /** Score `df`: (idCol, quality_prob) — P(label=1), the keep
    * probability a curation pipeline thresholds on. Map-only.
    *
    * Deliberately does NOT call the LR model's own `transform`: a
    * fitted LogisticRegressionModel carries its training summary, whose
    * captured SparkSession poisons task-closure serialization. Scoring
    * needs only the coefficient ARRAY and intercept — plain data the
    * closure serializes for free — so the model is unpacked once on the
    * driver and the per-row cost is the same sparse dot product. */
  def score(model: PipelineModel, df: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val tf = model.stages(0).asInstanceOf[HashingTF]
    val lrm = model.stages(1)
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val coef = lrm.coefficients.toArray
    val intercept = lrm.intercept
    val prob = udf { (v: org.apache.spark.ml.linalg.Vector) =>
      var m = intercept
      v.foreachActive((i, x) => m += coef(i) * x)
      1.0 / (1.0 + math.exp(-m))
    }
    tf.transform(withWords(df, textCol))
      .select(col(idCol), prob(col("__features")).as("quality_prob"))
  }
}
