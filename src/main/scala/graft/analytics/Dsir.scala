package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling for pretraining-data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every document by the log-likelihood ratio of a
  * TARGET-domain bag-of-hashed-features model vs the RAW-corpus model,
  * then keep high-ratio documents — the cheap, calibrated way to tilt a
  * web-scale corpus toward a target domain without a learned classifier.
  *
  * Implementation is two passes, both map-side-combinable:
  *
  *  1. hashed-feature counts: explode tokens → md5 bucket (portable
  *     hash, same as [[Sampling.hashBucket]]) → `groupBy(bucket).count`
  *     for target and raw. Each result is exactly B rows regardless of
  *     corpus size — B=64 here, 100k in production — so collecting the
  *     per-bucket log-ratios to the driver is bounded by the feature
  *     space, never the data.
  *  2. scoring: the B log-ratios become a broadcast literal array and
  *     each document's score is a map-only `aggregate(transform(...))`
  *     over its own tokens — no join, no shuffle, no second pass over
  *     token-level rows.
  *
  * Cross-engine parity: the per-bucket log-ratio is floor-quantized to
  * integer MICRO-units before summing, so a document score is a sum of
  * BIGINTs — exact and order-independent, immune to float addition
  * order differing between engines (the r5 lesson). Laplace add-1
  * smoothing keeps empty buckets finite.
  */
object Dsir {

  /** Token bucket via the portable md5 hash. */
  def tokenBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 6), 16, 10).cast("long") % buckets

  /** Per-bucket micro log-ratios: floor(1e6 * [ln(ct_t+1) - ln(Nt+B)
    * - ln(ct_r+1) + ln(Nr+B)]) for every bucket 0..B-1.
    */
  def bucketLogRatios(docs: DataFrame, isTarget: Column,
                      buckets: Int): Array[Long] = {
    val toks = docs.select(isTarget.as("is_target"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("is_target"), tokenBucket(col("tok"), buckets).as("bucket"))
    val counts = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("raw_c"),
      count_if(col("is_target")).as("tgt_c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nRaw = counts.values.map(_._1).sum
    val nTgt = counts.values.map(_._2).sum
    Array.tabulate(buckets) { b =>
      val (rawC, tgtC) = counts.getOrElse(b.toLong, (0L, 0L))
      math.floor(1e6 * (math.log(tgtC + 1.0) - math.log(nTgt + buckets.toDouble)
        - math.log(rawC + 1.0) + math.log(nRaw + buckets.toDouble))).toLong
    }
  }

  /** Score each document: integer micro log-ratio sum over its tokens,
    * `selected` = positive score (more target-like than raw-like).
    */
  def importanceScores(docs: DataFrame, isTarget: Column,
                       buckets: Int = 64): DataFrame = {
    val lr = bucketLogRatios(docs, isTarget, buckets)
    val lrArr = array(lr.map(lit(_)): _*)
    val toks = TextAnalysis.tokens(col("text"))
    val score = aggregate(
      transform(toks, t =>
        element_at(lrArr, (tokenBucket(t, buckets) + 1).cast("int"))),
      lit(0L), (acc, x) => acc + x)
    docs.select(col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"),
      score.as("score_micro"),
      (score > 0).as("selected"))
  }
}
