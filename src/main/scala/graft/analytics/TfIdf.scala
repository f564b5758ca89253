package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the per-document salient-term profile used
  * for corpus exploration, topic labeling and quality triage (terms with
  * high in-doc frequency but low corpus frequency characterize what a
  * document is ABOUT; a training-data pipeline uses them for cluster
  * naming and domain tagging).
  *
  * Cross-engine exactness: the usual `ln(N/df)` idf threads two libm
  * `log` implementations (not correctly rounded — a 1-ulp divergence can
  * flip a `floor` at a quantization boundary), so the idf here is the
  * RECIPROCAL form quantized exactly: `idf_q6 = floor((N+1)/(df+1)·1e6)`
  * — one correctly-rounded IEEE division of exact integers, one exact
  * scale, one floor, identical bits on every engine. The per-document
  * score is then the exact integer `tf · idf_q6`. Within a document the
  * top-k ranking is identical to log-idf whenever df ranks coincide;
  * pipelines needing the damped weighting can apply `ln` downstream of
  * the released integers.
  *
  * 100 TB shape: `tf` is one map-side-combinable count keyed by
  * (doc, term); `df` reuses the tf frame with a second small aggregation
  * keyed by term (Zipf-skewed hot keys — AQE skew handling applies); the
  * scalar corpus size broadcasts; the top-k window partitions by doc_id
  * (no global sort). Nothing scans the corpus twice.
  */
object TfIdf {

  /** `(doc_id, rk, term, tf, df, score)` — top-`k` terms per document by
    * exact integer tf·idf, ties broken by term (ascending) for a
    * deterministic ranking.
    */
  def topTerms(docs: DataFrame, k: Int): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // distinct docs per term == rows per term in the tf frame
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))

    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("idf_q6",
        floor((col("n_docs") + 1).cast("double") / (col("df") + 1) * 1e6)
          .cast("long"))
      .withColumn("score", col("tf") * col("idf_q6"))

    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("int").as("rk"), col("term"),
        col("tf"), col("df"), col("score"))
  }
}
