package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 ranking over the document corpus — the lexical-retrieval
  * counterpart to the ANN stack (`Similarity`/`Ivf`): given a bag of query
  * terms, rank documents by the BM25 relevance function (Robertson &
  * Spärck Jones probabilistic weighting with tf saturation `k1` and
  * length normalization `b`). A training-data pipeline uses it for
  * decontamination probes, targeted corpus slicing ("all docs about X"),
  * and hybrid lexical+vector retrieval for hard-negative mining.
  *
  * Cross-engine exactness: the classical `ln`-IDF threads libm; here the
  * IDF keeps the Robertson–Spärck Jones ODDS ratio un-logged —
  * `(N - df + 0.5) / (df + 0.5)` — one correctly-rounded IEEE division of
  * half-integer-exact operands (the log is monotone, so per-term ordering
  * is identical; the sum weights terms by odds rather than log-odds,
  * which sharpens rare-term dominance — acceptable for the slicing/probe
  * use cases this serves, and exactly reproducible). Every per-(doc,term)
  * contribution is floor-quantized to 1e6 BEFORE the per-document sum, so
  * the aggregation sums exact integers in any order; the oracle mirrors
  * the expression tree op-for-op.
  *
  * 100 TB shape: term frequencies are one map-side-combinable count keyed
  * by (doc, term) over ONLY the query terms (the filter prunes the
  * exploded stream before the shuffle); document lengths aggregate in the
  * same scan; `df` and the corpus scalars broadcast (query-term df table
  * is |Q| rows). The final top-k is one window over an |Q|-bounded
  * candidate set — no global sort of the corpus.
  */
object Bm25 {

  /** `(rk, doc_id, n_terms, score_q6)` — top-`k` documents for the query
    * term bag, ties broken by doc_id.
    */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val lens = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val hits = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))

    val tf = hits.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))

    // mirror this tree EXACTLY in any oracle (and keep literals DOUBLE —
    // DuckDB parses bare decimals as DECIMAL, a different arithmetic):
    //   idf   = (2*(N - df) + 1) / (2*df + 1)     -- == (N-df+.5)/(df+.5),
    //                                                integer operands, one division
    //   norm  = (dl * N) / total_tokens           -- integer product, one division
    //   denom = tf + k1*(1 - b + b*norm)
    //   c_q6  = floor(idf * (tf*(k1+1)) / denom * 1e6)
    val idf = (lit(2) * (col("n_docs") - col("df")) + lit(1)).cast("double") /
      (lit(2) * col("df") + lit(1))
    val norm = (col("dl") * col("n_docs")).cast("double") / col("total_tokens")
    val denom = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * norm)
    val contrib: Column =
      floor(idf * (col("tf") * lit(k1 + 1.0)) / denom * lit(1e6)).cast("long")

    val perDoc = tf
      .join(broadcast(dfT), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("c_q6", contrib)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c_q6")).as("score_q6"))

    // orderBy().limit(k) plans TakeOrderedAndProject — a distributed
    // per-partition top-k + k-row merge, never a single-reducer full sort;
    // the rank window then runs over only k rows
    val top = perDoc.orderBy(col("score_q6").desc, col("doc_id")).limit(k)
    top
      .withColumn("rk", row_number().over( // k rows; constant key = global
        Window.partitionBy(graft.functions.Windows.globalKey(col("doc_id")))
          .orderBy(col("score_q6").desc, col("doc_id"))))
      .select(col("rk").cast("int").as("rk"), col("doc_id"),
        col("n_terms"), col("score_q6"))
  }
}
