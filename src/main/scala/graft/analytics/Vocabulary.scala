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

  /** BPE tokenizer training (the merge-learning loop of byte-pair
    * encoding): start from the per-word character sequence, then
    * `nMerges` times pick the most frequent adjacent symbol pair
    * (corpus-weighted, ties by pair lexicographically) and fuse it
    * everywhere. Returns the learned merge table
    * `(step, w1, w2, merged, n)` — the artifact a tokenizer ships.
    *
    * Scale shape: the corpus is scanned ONCE (map-side-combinable word
    * counts); every iteration then runs on the word-frequency table —
    * vocab-sized, not corpus-sized — and only the single winning pair
    * row is collected per step. Symbol state lives in one string column
    * and the merge application is a literal `replace` — left-to-right
    * non-overlapping over the pre-replacement string, identical in
    * every engine. (For a run of 3+ repeats of one symbol, e.g.
    * `aaaa`, the shared-space scan fuses one pair per step instead of
    * all at once; the leftover pairs fuse on later iterations, so the
    * segmentation still converges — only the merge PATH for degenerate
    * same-char runs can differ from a symbol-array BPE; on natural
    * text the learned table does not.)
    * Production tokenizers run tens of thousands of
    * merges: there the same word table, pruned to the top ~1M words,
    * collects once and the loop runs in memory — this distributed loop
    * is the memory-unbounded path and the oracle-checked reference of
    * that optimization.
    */
  def bpeMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // " c h a r s " — space-sentineled symbol string; filter guards the
    // empty fragments some engines emit for empty-pattern splits
    var syms = words.withColumn("syms",
      concat(lit(" "),
        array_join(filter(split(col("word"), ""), x => x =!= ""), " "),
        lit(" ")))
      .persist()
    syms.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    try {
      for (step <- 1 to nMerges) {
        val tk = split(trim(col("syms")), " ")
        val best = syms
          .filter(size(tk) >= 2)
          .select(col("freq"),
            explode(transform(sequence(lit(1), size(tk) - 1),
              i => struct(element_at(tk, i).as("w1"),
                element_at(tk, i + 1).as("w2")))).as("b"))
          .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("w1"), col("w2"))
          .limit(1).collect()(0)
        val (w1, w2, n) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((step, w1, w2, w1 + w2, n))
        val prev = syms
        syms = syms.withColumn("syms",
          call_function("replace", col("syms"),
            lit(s" $w1 $w2 "), lit(s" $w1$w2 ")))
          .persist()
        syms.count()
        prev.unpersist()
      }
      merges.toSeq.toDF("step", "w1", "w2", "merged", "n")
    } finally syms.unpersist()
  }

  /** Tokenizer APPLICATION: run a trained merge table over the corpus
    * via the native `BpeEncode` expression — a map-only projection (the
    * merge table rides as a codegen reference object; no join, no
    * explode), trainer-identical replace semantics so the segmentation
    * matches [[bpeMerges]]' learned path bit-for-bit.
    */
  def bpeTokenize(docs: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      graft.expressions.GraftFunctions.bpeEncode(col("text"), merges)
        .as("bpe_tokens"))
  }

  /** Tokenizer fertility per language — the standard tokenizer-quality
    * metric (subword tokens per whitespace word, and raw bytes per
    * subword token): a vocabulary trained on one language family shows
    * fertility ≫ 1 on scripts it fragments, which inflates effective
    * sequence length and training cost there. Computed against a given
    * merge table via the native `bpe_encode` expression.
    *
    * Sums are exact BIGINTs; each ratio is ONE floor-quantized double
    * division, so the per-language rows are bit-stable cross-engine.
    * 100 TB shape: map-only encode (codegen expression) feeding one
    * map-side-combinable per-language aggregate — |languages| rows out.
    */
  def tokenFertility(docs: DataFrame,
                     merges: Seq[(String, String)]): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("lang"),
      graft.analytics.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_words"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      size(graft.expressions.GraftFunctions.bpeEncode(col("text"), merges))
        .cast("long").as("n_bpe"))
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("words"),
        sum(col("n_bytes")).as("bytes"),
        sum(col("n_bpe")).as("bpe_tokens"))
      .select(col("lang"), col("words"), col("bytes"), col("bpe_tokens"),
        (floor(col("bpe_tokens").cast("double") /
          col("words").cast("double") * 10000) / 10000.0).as("fertility"),
        (floor(col("bytes").cast("double") /
          col("bpe_tokens").cast("double") * 10000) / 10000.0)
          .as("bytes_per_token"))
  }

  /** Per-document coverage: total tokens, tokens with corpus frequency
    * below `rareBelow`, and tokens inside the top-`topM` vocabulary
    * (rank by count desc, token asc — a deterministic tie-break).
    */
  def coverage(docs: DataFrame, rareBelow: Long, topM: Int): DataFrame = {
    val tf = termFrequencies(docs)
    val top = tf // vocabulary-sized input; constant key = deliberately global
      .withColumn("rk", row_number().over(
        Window.partitionBy(graft.functions.Windows.globalKey(col("cnt")))
          .orderBy(col("cnt").desc, col("w"))))
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
