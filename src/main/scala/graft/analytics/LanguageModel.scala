package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/KenLM-style filter:
  * train a bigram model ON the corpus, then score every document by its
  * average smoothed bigram probability. Low scores mark documents whose
  * word transitions are atypical for the corpus (gibberish, wrong
  * language, boilerplate soup) — the classic perplexity-filter signal.
  *
  * Model: add-one smoothing, `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`
  * with `c(w)` the corpus unigram count and `V` the vocabulary size.
  *
  * Cross-engine exactness: scores stay in the PROBABILITY domain and
  * every per-bigram probability is floor-quantized to 1e-9 BEFORE the
  * per-document sum. Both factors of the quantization — one IEEE
  * division of two exactly-representable integers, one multiply by 1e9
  * — are correctly rounded, so Spark and any oracle engine produce the
  * same integers bit-for-bit. A log-domain score would thread `ln`
  * through two different libm implementations (not correctly rounded)
  * and make verification flaky at quantization boundaries; the ranking
  * the filter acts on is insensitive to the choice. (`avg(log p)` ranks
  * nearly identically to this for filtering; pipelines that need true
  * perplexity can apply `ln` to the released probabilities downstream.)
  *
  * 100 TB shape: unigram and bigram counts are map-side-combinable
  * aggregations (two corpus scans, or one with re-exploding); scoring is
  * two shuffle joins keyed by bigram and by history token. The count
  * tables follow a Zipf law — hot function-word keys — which is the
  * textbook AQE skew-join case; the vocabulary scalar broadcasts.
  */
object LanguageModel {

  /** `(doc_id, n_bigrams, prob_q9_sum, avg_prob_q9)` per document —
    * add-one-smoothed bigram probabilities quantized to 1e-9 and summed
    * exactly as integers. Documents of fewer than two tokens score 0
    * over 0 bigrams.
    */
  def bigramScore(docs: DataFrame): DataFrame = {
    // tokenize ONCE into an attribute: referencing `split(text)` inside
    // the bigram lambda would re-split the document per element
    // (quadratic in tokens — measured 5x on this query's wall-clock)
    val withToks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val tokens = withToks.select(col("doc_id"), explode(col("toks")).as("w"))
    val uni = tokens.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))

    // shared by the count aggregation and the scoring join — materialize
    // so the explode runs once. Eager localCheckpoint, NOT persist(): the
    // blocks are owned by the checkpointed RDD, which the ContextCleaner
    // reclaims as soon as the result frame is unreferenced — a persist()
    // here outlives the call in the session's CacheManager with no
    // handle to unpersist it by (the r5 ADVICE leak). Only the bigram
    // EXPLODE subtree is truncated; the count tables, scoring joins and
    // vocab broadcast stay in the visible plan (PlanSpec's a_lm_score
    // guard still sees them).
    // Single-token docs are filtered BEFORE the sequence: Spark's
    // sequence(1, 0) counts DOWN to [1, 0] and element_at(_, 0) throws —
    // the left join below restores such docs with 0 bigrams.
    val bigrams = withToks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(true)

    val big = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))

    val scored = bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni, col("w1") === uni("w"))
      .crossJoin(broadcast(vocab))
      // (cb+1)/(cu+V): one correctly-rounded IEEE division; ×1e9 and
      // floor are exact — identical integers on every engine
      .withColumn("q", floor((col("cb") + 1).cast("double") /
        (col("cu") + col("v")) * 1e9).cast("long"))

    val agg = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("q")).as("prob_q9_sum"))

    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("prob_q9_sum"), lit(0L)).as("prob_q9_sum"))
      .withColumn("avg_prob_q9",
        floor(col("prob_q9_sum").cast("double") /
          greatest(col("n_bigrams"), lit(1L))).cast("long"))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus LM, then cut each LANGUAGE into `buckets` equal tiles by
    * score — head (most corpus-typical) / middle / tail — the partition
    * CCNet publishes its corpus in and the standard mixture axis
    * ("train on head+middle, drop tail"). Returns per-(lang, bucket)
    * doc and token counts with the score range per tile.
    *
    * Exact `ntile` sorts within each language partition — correct at any
    * scale but the per-language sort is the cost; the 100 TB fast path
    * computes the two cut scores per language with `approx_percentile`
    * and buckets map-only (identical tiles up to quantile error). Kept
    * exact here so the oracle reproduces tiles bit-for-bit.
    */
  def ccnetBuckets(docs: DataFrame, buckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramScore(docs)
      .join(docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
    val tile = ntile(buckets).over(Window.partitionBy(col("lang"))
      .orderBy(col("avg_prob_q9").desc, col("doc_id")))
    scored.withColumn("tile", tile)
      .withColumn("bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === buckets, "tail").otherwise("middle"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("avg_prob_q9")).as("min_q9"),
        max(col("avg_prob_q9")).as("max_q9"))
  }

  /** The 100 TB fast path of [[ccnetBuckets]]: instead of per-language
    * `ntile` (a sort of EVERY row of a language on one reducer — a
    * single-reducer global sort under web-corpus skew, where one
    * language dominates), compute the two tile cut scores per language
    * with `approx_percentile` — a mergeable Greenwald-Khanna sketch:
    * map-side partials, one |langs|-row cut table out of the
    * aggregation, never a row sort — then bucket map-only against the
    * broadcast cut table.
    *
    * Tile semantics: head = score strictly above the 2/3 cut, tail =
    * at or below the 1/3 cut; ties collapse into the lower bucket, so
    * tile populations differ from exact `ntile` by the tie mass at the
    * cuts (the approximation contract — CCNet itself publishes fixed
    * perplexity cutoffs, not exact tiles).
    *
    * Cross-engine exactness at verification scale: with `accuracy` 1e6
    * and fewer than ~500k docs per language the sketch's target rank
    * error is below one, so it returns EXACTLY the `ceil(p·n)`-th
    * smallest score and the DuckDB oracle reproduces it with a rank
    * window. At larger scale the cuts drift within the ±1/accuracy
    * rank guarantee and bucket counts move by at most that rank mass.
    */
  def ccnetBucketsApprox(docs: DataFrame, accuracy: Int = 1000000): DataFrame = {
    val scored = bigramScore(docs)
      .join(docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      // consumed by the cut sketch AND the bucketing scan — materialize
      // once; ContextCleaner-owned, same contract as the bigrams frame
      .localCheckpoint(true)
    val cuts = scored.groupBy(col("lang"))
      .agg(percentile_approx(col("avg_prob_q9"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("cs"))
      .select(col("lang"), element_at(col("cs"), 1).as("c1"),
        element_at(col("cs"), 2).as("c2"))
    scored.join(broadcast(cuts), "lang")
      .withColumn("bucket",
        when(col("avg_prob_q9") > col("c2"), "head")
          .when(col("avg_prob_q9") > col("c1"), "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("avg_prob_q9")).as("min_q9"),
        max(col("avg_prob_q9")).as("max_q9"))
  }

  /** Stupid-Backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the backoff the web-scale MT LMs
    * shipped, chosen over Kneser-Ney precisely because its relative
    * frequencies need no normalization pass and distribute trivially):
    *
    *   S(w3|w1 w2) = c(w1w2w3)/c(w1w2)          if the trigram is in train
    *               = 0.4 · c(w2w3)/c(w2)        else if the bigram is
    *               = 0.4² · c(w3)/N             else if the unigram is
    *               = 0                          else (OOV)
    *
    * The model trains on `train` and scores `target` — the CCNet shape
    * (LM fit on a clean reference corpus, applied to the crawl), and the
    * reason the backoff paths actually fire.
    *
    * Cross-engine exactness: each path is ONE division of exact integer
    * counts times an EXACT constant (1e9, 4e8 = 0.4·1e9, 1.6e8 = 0.4²·1e9
    * — all representable), floored to an integer before the per-document
    * sum; no libm, no float literals with decimal/double ambiguity.
    *
    * 100 TB shape: the three count tables are map-side-combinable
    * aggregations of the train scan; scoring is three left joins keyed by
    * the (Zipf-skewed — AQE skew case) n-gram columns; the token-count
    * scalar broadcasts. Per-position rows stream through the joins — no
    * per-document state.
    */
  def stupidBackoffScore(train: DataFrame, target: DataFrame): DataFrame = {
    def toks(d: DataFrame) =
      d.select(col("doc_id"), split(col("text"), " ").as("toks"))

    val trainToks = toks(train)
    val unigrams = trainToks.select(explode(col("toks")).as("w"))
    val cu = unigrams.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val total = unigrams.agg(count(lit(1)).as("n_tokens"))
    val trainBi = trainToks.filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = trainBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val trainTri = trainToks.filter(size(col("toks")) >= 3)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2"),
          element_at(col("toks"), i + 2).as("w3")))).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
    val ct = trainTri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("ct"))

    val positions = toks(target).filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2"),
            element_at(col("toks"), i + 2).as("w3")))).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))

    val scored = positions
      .join(ct, Seq("w1", "w2", "w3"), "left")
      .join(cb, Seq("w1", "w2"), "left")                       // history c(w1 w2)
      .join(cb.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cb").as("cb23")), Seq("w2", "w3"), "left")        // backoff c(w2 w3)
      .join(cu.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .join(cu.select(col("w").as("w3"), col("cu").as("cu3")), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn("s_q9",
        when(col("ct").isNotNull,
          floor(col("ct").cast("double") / col("cb") * lit(1e9)))
          .when(col("cb23").isNotNull,
            floor(col("cb23").cast("double") / col("cu2") * lit(4e8)))
          .when(col("cu3").isNotNull,
            floor(col("cu3").cast("double") / col("n_tokens") * lit(1.6e8)))
          .otherwise(lit(0L)).cast("long"))

    val agg = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_scored"),
      sum(col("s_q9")).as("backoff_q9_sum"),
      sum(when(col("ct").isNotNull, 0L)
        .when(col("cb23").isNotNull, 1L)
        .when(col("cu3").isNotNull, 2L).otherwise(3L)).as("backoff_depth_sum"))

    target.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("backoff_q9_sum"), lit(0L)).as("backoff_q9_sum"),
        coalesce(col("backoff_depth_sum"), lit(0L)).as("backoff_depth_sum"))
  }
}
