package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data mixture construction: turn per-source target WEIGHTS
  * into per-document REPEAT factors so the assembled corpus hits the
  * target proportions by token count — the standard pretraining recipe
  * step (upweighted sources repeat across epochs, downweighted ones
  * subsample; cf. the published LLaMA / Gopher / DoReMi mixture
  * tables).
  *
  * For source s with weight w_s, natural token count T_s, and a total
  * token budget B: the sampling rate is `r_s = (w_s / Σw) · B / T_s`.
  * Every document of s emits `floor(r_s)` full copies plus one more
  * when its md5 bucket falls under `frac(r_s)` — deterministic,
  * rerun-stable, and exact in expectation per source.
  *
  * Cross-engine exactness: r_s is ONE IEEE division of two exactly-
  * representable integers, the threshold is `floor(frac · 10⁴)`, and
  * the bucket is integer md5 arithmetic — no libm anywhere, so the
  * oracle reproduces the factors bit-for-bit.
  *
  * 100 TB shape: one map-side-combinable aggregation for the
  * per-source token counts (|sources| rows → broadcast back), then a
  * map-only pass assigning factors. Emitting the physical copies is a
  * later `explode(sequence(1, n_repeats))` the caller fuses with its
  * write — the factor table itself stays one row per document.
  */
object Mixture {

  /** Finer-grained deterministic bucket for fractional repeat rates:
    * uniform in [0, 10000), same md5 derivation as `Sampling.hashBucket`
    * so one oracle-side reconstruction covers both.
    */
  def hashBucket10k(id: Column): Column = Sampling.hashBucket(id, 10000)

  /** `(doc_id, source, n_tokens, n_repeats)` per document.
    *
    * @param weights      relative target weight per source; a source
    *                     missing from the map gets weight 0, so its
    *                     documents emit `n_repeats = 0` (dropped from
    *                     the assembled corpus, kept in the factor table)
    * @param budgetFactor total token budget as a multiple of the
    *                     corpus's natural token count
    */
  /** Mixture → physical corpus assembly in ONE pass: the factor table's
    * `explode(sequence(1, n_repeats))` fuses directly with sequence
    * packing, so the assembled (repeated) corpus gets pack ids without
    * materializing an intermediate copy table. Output one row per
    * physical COPY: `(doc_id, source, copy, shard, n_tokens, pack_id,
    * pack_offset)`, ordered within each shard by (doc_id, copy) — the
    * deterministic extension of `SequencePack.pack`'s doc_id order to
    * repeated documents.
    *
    * Plan shape: the explode is map-only on top of the broadcast rate
    * join, so the ONLY shuffle is the pack's shard hash — identical to
    * packing alone; repeating the corpus adds zero extra shuffles.
    * Equals the two-step composition (repeatFactors → explode →
    * pack-by-(doc_id, copy)) bit-for-bit; `CorpusOpsSpec`'s
    * "packMixture equals the two-step" test asserts it.
    */
  def packMixture(docs: DataFrame, weights: Map[String, Long],
                  budgetFactor: Int, budget: Int, shards: Int): DataFrame = {
    val copies = repeatFactors(docs, weights, budgetFactor)
      .filter(col("n_repeats") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_repeats"))).as("copy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"), col("copy"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    copies
      .withColumn("shard", pmod(col("doc_id"), lit(shards)))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("copy"), col("shard"),
        col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).cast("long")
          .as("pack_id"),
        ((col("cum") - col("n_tokens")) % budget).as("pack_offset"))
  }

  /** Temperature-scaled multilingual sampling (the mBERT / XLM-R
    * exponential-smoothing recipe): languages are sampled with
    * probability q_l ∝ p_l^α where p_l is the natural token share —
    * α < 1 upsamples low-resource languages without hand-written weight
    * tables. This is `repeatFactors` with the weight table DERIVED from
    * the data instead of supplied.
    *
    * α is fixed at 1/2 — the one exponent where the power is IEEE
    * sqrt (correctly rounded by spec in every engine), so the factors
    * stay bit-identical cross-engine. Since q_l ∝ √(T_l/T) ∝ √T_l, the
    * per-language weight is s_l = floor(√T_l · 10⁶) (exact integer),
    * S = Σ s_l is an exact integer sum, and the rate
    * `r_l = (s_l · B) / (S · T_l)` is evaluated in DOUBLE — each factor
    * cast once, two correctly-rounded multiplications and one division
    * in a pinned order, bit-identical cross-engine and overflow-free at
    * any corpus size (int64 products would wrap silently past ~5·10⁸
    * tokens per language: s_l·B grows as 2·10⁶·T^1.5). General-α
    * smoothing would go through libm `pow`, whose last-ulp rounding is
    * NOT portable across engines — callers needing α ≠ 1/2 should
    * accept an approximate (rows-only) check.
    *
    * 100 TB shape: identical to `repeatFactors` — one map-side
    * combinable per-language count aggregation (|languages| rows →
    * broadcast back), then a map-only factor pass.
    */
  def temperatureFactors(docs: DataFrame, budgetFactor: Int = 2,
                         langCol: String = "lang"): DataFrame = {
    val toks = graft.analytics.TextAnalysis.tokenCount(col("text"))
      .cast("long")
    val base = docs.select(col("doc_id"), col(langCol).as("lang"),
      toks.as("n_tokens"))
    val perLang = base.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("t_s"))
      .withColumn("s_l",
        floor(sqrt(col("t_s").cast("double")) * 1000000.0).cast("long"))
    val Array(totalTokens, sSum) = perLang
      .agg(sum(col("t_s")), sum(col("s_l"))).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val bt = budgetFactor.toLong * totalTokens
    val rates = perLang.select(col("lang").as("r_lang"),
      ((col("s_l").cast("double") * lit(bt.toDouble)) /
        (lit(sSum.toDouble) * col("t_s").cast("double"))).as("rate"))
    base.join(broadcast(rates), col("lang") === col("r_lang"))
      .withColumn("n_repeats",
        (floor(col("rate")).cast("long") +
          when(hashBucket10k(col("doc_id")) <
            floor((col("rate") - floor(col("rate"))) * 10000), 1L)
            .otherwise(0L)).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("n_repeats"))
  }

  def repeatFactors(docs: DataFrame, weights: Map[String, Long],
                    budgetFactor: Int = 2): DataFrame = {
    val toks = graft.analytics.TextAnalysis.tokenCount(col("text"))
      .cast("long")
    val base = docs.select(col("doc_id"), col("source"),
      toks.as("n_tokens"))
    val perSource = base.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t_s"))
    val totalTokens = perSource.agg(sum(col("t_s"))).head().getLong(0)
    val wsum = weights.values.sum
    val weightOf = coalesce(
      element_at(typedLit(weights), col("source")), lit(0L))
    val rates = perSource.select(col("source").as("r_source"),
      ((weightOf * budgetFactor * totalTokens).cast("double") /
        (col("t_s") * wsum)).as("rate"))
    base.join(broadcast(rates), col("source") === col("r_source"))
      .withColumn("n_repeats",
        (floor(col("rate")).cast("long") +
          when(hashBucket10k(col("doc_id")) <
            floor((col("rate") - floor(col("rate"))) * 10000), 1L)
            .otherwise(0L)).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("n_repeats"))
  }
}
