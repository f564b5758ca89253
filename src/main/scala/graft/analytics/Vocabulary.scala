package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics and per-document coverage signals —
  * the integer-exact cousins of LM-perplexity quality scoring (vocab
  * coverage and rare-token ratio correlate with perplexity without a
  * model, and integer counts reproduce bit-for-bit in any engine;
  * floating log-probs would not).
  *
  * 100 TB shape: term frequencies are ONE map-side-combinable
  * aggregation over the exploded corpus (vocab-sized result, not
  * corpus-sized); the top-M vocab ranks over that vocab table; the
  * per-doc lookup is a token-keyed join whose stopword-skew is the
  * canonical AQE skew-join case (hot keys split automatically).
  */
object Vocabulary {

  /** token → corpus count (one aggregation). */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Per-document coverage: total tokens, tokens with corpus frequency
    * below `rareBelow`, and tokens inside the top-`topM` vocabulary
    * (rank by count desc, token asc — a deterministic tie-break).
    */
  def coverage(docs: DataFrame, rareBelow: Long, topM: Int): DataFrame = {
    val tf = termFrequencies(docs)
    val top = tf
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("w"))))
      .filter(col("rk") <= topM)
      .select(col("w"), lit(1).as("is_top"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(tf, "w")
      .join(broadcast(top), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cnt") < rareBelow, 1L).otherwise(0L)).as("rare_tokens"),
        sum(coalesce(col("is_top"), lit(0)).cast("long")).as("top_hits"))
  }
}
