package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a fasttext-style document QUALITY CLASSIFIER
  * (logistic regression over hashed token counts — the learned upgrade
  * of [[TextAnalysis.qualityScore]]'s hand-tuned heuristics, and the
  * standard web-corpus "looks like good text?" filter).
  *
  * Scale shape per gradient-descent iteration: ONE map-side-combinable
  * aggregation over the corpus producing exactly B+1 numbers (the
  * gradient), collected to the driver for the scalar weight update —
  * the classic tree-aggregated GD. The corpus is featurized once and
  * cached; weights ride into each pass as literals.
  *
  * Cross-engine exactness (the DSIR trick applied to training): every
  * per-document gradient contribution is floor-quantized to integer
  * MICRO-units BEFORE summing, so the distributed sum is a BIGINT sum —
  * exact and addition-order-independent — and the weight trajectory is
  * identical in any engine that replays the same per-row arithmetic.
  * All float ops (sigmoid, dot product, update) are scalar or per-row
  * with a pinned evaluation order.
  */
object QualityClassifier {

  final case class TrainedModel(weights: Array[Double], bias: Double,
                                docs: Long)

  /** Per-row feature vector: token counts over `buckets` md5 buckets
    * (same portable hash as [[Dsir.tokenBucket]]). The bucket is
    * materialized per TOKEN first so the md5 evaluates once per token,
    * not once per (token, bucket) pair inside the fold.
    */
  def features(text: Column, buckets: Int): Column =
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => Dsir.tokenBucket(t, buckets)),
      array((0 until buckets).map(_ => lit(0L)): _*),
      (acc, b) =>
        transform(acc, (v, i) => v + when(b === i.cast("long"), 1L)
          .otherwise(0L)))

  /** The pinned margin arithmetic: ((bias + x0*w0) + x1*w1) + … */
  private def margin(feats: Column, w: Array[Double], bias: Double): Column =
    aggregate(
      zip_with(feats, array(w.map(lit(_)): _*),
        (x, wj) => x.cast("double") * wj),
      lit(bias), (a, v) => a + v)

  /** Train `iters` full-batch GD steps from zero weights. */
  def train(docs: DataFrame, isPositive: Column, buckets: Int = 16,
            iters: Int = 3, lr: Double = 0.1): TrainedModel = {
    val feat = docs.select(
      features(col("text"), buckets).as("x"),
      when(isPositive, lit(1.0)).otherwise(lit(0.0)).as("y"))
      .persist()
    try {
      val n = feat.count()
      var w = Array.fill(buckets)(0.0)
      var bias = 0.0
      (1 to iters).foreach { _ =>
        // err = sigmoid(margin) - y; every contribution quantized to
        // exact micro-units: floor((1e6 * err) * x_j)
        val err = lit(1.0) /
          (lit(1.0) + exp(lit(0.0) - margin(col("x"), w, bias))) - col("y")
        val gradCols = (0 until buckets).map(j =>
          sum(floor((lit(1e6) * err) *
            element_at(col("x"), j + 1).cast("double"))).as(s"g$j")) :+
          sum(floor(lit(1e6) * err)).as("gb")
        val row = feat.agg(gradCols.head, gradCols.tail: _*).head()
        val g = (0 to buckets).map(row.getLong)
        w = w.zipWithIndex.map { case (wj, j) =>
          wj - lr * ((g(j).toDouble / 1e6) / n.toDouble)
        }
        bias = bias - lr * ((g(buckets).toDouble / 1e6) / n.toDouble)
      }
      TrainedModel(w, bias, n)
    } finally feat.unpersist()
  }

  /** Train and emit the model as rows (`j`, `w_micro`) — bucket weights
    * 0..B-1 then the bias at j=B, each floor-quantized at 1e6.
    */
  def trainedWeights(docs: DataFrame, isPositive: Column,
                     buckets: Int = 16, iters: Int = 3,
                     lr: Double = 0.1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = train(docs, isPositive, buckets, iters, lr)
    ((0 until buckets).map(j =>
      (j.toLong, math.floor(m.weights(j) * 1e6).toLong)) :+
      (buckets.toLong, math.floor(m.bias * 1e6).toLong))
      .toDF("j", "w_micro")
  }

  /** Score documents with a trained model (map-only projection). */
  def score(docs: DataFrame, model: TrainedModel, buckets: Int): DataFrame =
    docs.withColumn("quality_margin",
      margin(features(col("text"), buckets), model.weights, model.bias))
}
