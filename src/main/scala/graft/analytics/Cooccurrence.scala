package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed co-occurrence statistics with pointwise mutual information
  * (Church & Hanks 1990 — the association measure behind phrase mining,
  * collocation extraction, and count-based embedding pipelines like
  * word2vec's unigram tables).
  *
  * 100 TB shape: pair and unigram counts are map-side-combinable hash
  * aggs over exploded token windows (Zipf skew lands on AQE's skew
  * split), the corpus-total token count broadcasts as a scalar, and the
  * min-count filters prune the pair tail BEFORE the two unigram joins —
  * the joins run on the (vocab²-bounded) count tables, never on corpus
  * rows. No sorts, no windows, no driver state.
  */
object Cooccurrence {

  /** Unordered co-occurring pairs within `window` tokens (distances
    * 1..window), with counts and floor-quantized PMI:
    * `pmi = ln(n_ab · N / (n_a · n_b))` where N = total token count.
    * `minPair` / `minTerm` suppress the unstable low-count tail (the
    * standard PMI degeneracy guard).
    *
    * Output: (a, b, n_ab, pmi_q4), a < b.
    */
  def pmiPairs(docs: DataFrame, text: Column, window: Int = 2,
               minPair: Long = 5, minTerm: Long = 10): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(text).as("tk"))
    val n = size(col("tk"))
    // token pairs at each distance d: zip the list against itself
    // shifted by d — an array op per row, no join
    val pairCols = (1 to window).map { d =>
      zip_with(
        slice(col("tk"), lit(1), greatest(n - d, lit(0))),
        slice(col("tk"), lit(d + 1), greatest(n - d, lit(0))),
        (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b")))
    }
    val pairs = toks
      .select(explode(concat(pairCols: _*)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)

    val uni = toks.select(explode(col("tk")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    // corpus-total as a broadcast 1-row frame, NOT a driver action: no
    // eager job, and the vocab-sized `uni` lineage is reused by Catalyst
    // instead of a third full corpus scan
    val total = uni.agg(sum(col("n_t")).as("total"))

    pairs
      .join(uni.select(col("term").as("a"), col("n_t").as("n_a")), "a")
      .join(uni.select(col("term").as("b"), col("n_t").as("n_b")), "b")
      .crossJoin(broadcast(total))
      .filter(col("n_a") >= minTerm && col("n_b") >= minTerm)
      .select(col("a"), col("b"), col("n_ab"),
        // each count casts to double BEFORE the multiply: at 100 TB
        // corpus scale (total tokens ~1e13) the int64 products n_ab*total
        // would overflow; double*double is IEEE-identical in any engine
        // (the oracle mirrors the exact operation order), floor-quantized
        // after the single ln
        (floor(log((col("n_ab").cast("double") * col("total").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))) * 10000)
          / 10000.0).as("pmi_q4"))
  }
}
