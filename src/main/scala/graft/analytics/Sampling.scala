package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation: per-stratum rates (e.g.
  * language rebalancing) and reproducible dataset splits, both driven
  * by a content-stable hash of the document id — NOT `rand()`, so
  * membership is a pure function of the row, stable across reruns,
  * retries, and cluster sizes.
  *
  * 100 TB shape: sampling is a stateless filter on a hash expression —
  * no shuffle, no driver state, prunes before any downstream work, and
  * composes with partition pruning. The md5-derived uniform is portable
  * (bit-identical in any engine with md5), which is what makes the
  * sample auditable outside Spark.
  */
object Sampling {

  /** Uniform [0, mod) bucket from the first 6 md5 hex digits of `id`
    * (default percentage buckets; pass a larger modulus for finer
    * thresholds, e.g. Mixture's 1e4 fractional-rate buckets).
    */
  def hashBucket(id: Column, mod: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % mod

  /** Keep rows whose stratum has a configured rate and whose hash
    * bucket falls under it: `rates` maps stratum value → percentage
    * [0, 100]. Strata without a rate are dropped (explicit allowlist).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(-1)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(id) < rate)
  }

  /** Deterministic named splits (train/valid/test …): `cuts` maps split
    * name → cumulative upper percentage, evaluated in ascending order.
    * E.g. `Seq("valid" -> 1, "test" -> 2, "train" -> 100)` sends 1% to
    * valid, 1% to test, the rest to train.
    */
  def splitColumn(id: Column, cuts: Seq[(String, Int)]): Column =
    cuts.sortBy(_._2).foldRight(lit(null).cast("string")) {
      case ((name, upper), acc) =>
        when(hashBucket(id) < upper, lit(name)).otherwise(acc)
    }

  /** Per-source document cap: rank within each source by quality
    * (best-first, doc_id tiebreak) and keep the top `cap` — the
    * anti-domination rule web-corpus curation applies per domain so one
    * crawl host can't swamp the mixture. One shuffle on the source key;
    * at 100 TB source cardinality is high (domains), so partitions stay
    * balanced and the window never sees more than one source's rows.
    * `quality` must already be engine-quantized if it will be compared
    * across engines (ranking ties break on doc_id either way).
    */
  /** Reproducible global corpus shuffle: the training-order shuffle as
    * a pure function of (seed, id) — every epoch seed yields a new
    * order, reruns and cluster resizes yield the SAME order, and no
    * `rand()` state ever leaks into lineage. Key = md5(seed ':' id);
    * shard = portable hash bucket of the key; position = rank of the
    * key within its shard (id tiebreak for hash collisions). One
    * shuffle; at 100 TB this is `bucketBy(shard)` sorted by the key, so
    * readers stream each shard in final order with no extra sort.
    */
  def deterministicShuffle(docs: DataFrame, id: Column, shards: Int,
                           seed: String): DataFrame = {
    val key = md5(concat(lit(seed), lit(":"), id.cast("string")))
    val shard = conv(substring(key, 1, 6), 16, 10).cast("long") % shards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shuffle_key"), id)
    docs.withColumn("shuffle_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Cluster-atomic ("leak-free") train/eval split: a document inherits
    * the split of its NEAR-DUP CLUSTER, so no near-duplicate pair can
    * straddle train and eval — the contamination a per-document hash
    * split cannot rule out (a paraphrase of a test document lands in
    * train with probability = train fraction). `id` must be identical
    * for every member of a cluster (use the cluster id from
    * `Dedup.dedupClusters`); singleton documents cluster alone, so they
    * split exactly like `splitColumn` would. Pure map over the
    * clustered frame — the clustering join is the only shuffle, and the
    * split itself adds none.
    */
  def leakFreeSplit(clustered: DataFrame, id: Column,
                    cuts: Seq[(String, Int)]): DataFrame =
    clustered.withColumn("split", splitColumn(id, cuts))

  /** Token-budget corpus selection: keep the highest-quality-density
    * (quality per token) documents whose total token count fits
    * `budget` — the data-constrained curation rule ("best N tokens",
    * not "best N documents", so short high-quality docs aren't crowded
    * out by long mediocre ones).
    *
    * 100 TB shape: a global quality sort + running sum would funnel the
    * corpus through one partition. Instead density is quantized to
    * integer buckets (`floor(density·quant)`) and selection happens at
    * the BUCKET level: (1) one map-side-combinable aggregation builds
    * the bucket→token-mass histogram (≤ ~quant rows regardless of
    * corpus size); (2) a window over that tiny table finds the greedy
    * descending prefix of buckets that fits, plus the single boundary
    * bucket that crosses the budget; (3) full buckets join back
    * broadcast (map-only filter over the corpus); (4) only the boundary
    * bucket's rows — at most one quantization cell — are sorted
    * (by doc_id, within their own partition) to take the remainder
    * deterministically. Raise `quant` to shrink the boundary cell.
    */
  def budgetSelect(docs: DataFrame, quality: Column, tokens: Column,
                   budget: Long, quant: Int = 1000000): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      tokens.cast("long").as("n_tokens"),
      floor(quality / tokens * quant).cast("long").as("qd"))
    val hist = d.groupBy("qd").agg(sum(col("n_tokens")).as("bt"))
    // bounded input: ≤ ~quant histogram rows flow through this window.
    // The constant partition key (see Windows.globalKey) means
    // "deliberately global" — same single-group execution, but it keeps
    // WindowExec's "No Partition Defined" warning out of the logs so a
    // real unbounded global window elsewhere would still stand out.
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.functions.Windows.globalKey(col("qd")))
      .orderBy(col("qd").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist.withColumn("before_bt",
      coalesce(sum(col("bt")).over(wDesc), lit(0L)))
    // the descending bucket prefix that fits entirely …
    val fullB = cum.filter(col("before_bt") + col("bt") <= budget)
      .select(col("qd"))
    // … and the one bucket the budget line crosses (its predecessors
    // spent before_bt; slack is what remains for it)
    val bound = cum.filter(col("before_bt") <= budget &&
        col("before_bt") + col("bt") > budget)
      .select(col("qd"), (lit(budget) - col("before_bt")).as("slack"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qd")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val fullSel = d.join(broadcast(fullB), Seq("qd"))
    val boundSel = d.join(broadcast(bound), Seq("qd"))
      .withColumn("cum", sum(col("n_tokens")).over(wIn))
      .filter(col("cum") <= col("slack"))
      .drop("cum", "slack")
    fullSel.unionByName(boundSel)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("qd"))
  }

  def sourceCaps(docs: DataFrame, quality: Column, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    docs.withColumn("quality", quality)
      .withColumn("src_rank", row_number().over(w).cast("int"))
      .filter(col("src_rank") <= cap)
      .select(col("doc_id"), col("source"), col("quality"), col("src_rank"))
  }

  /** Deterministic training-shard manifest — the export contract of a
    * curation run: docs route to `shards` by the portable hash of their
    * id (a pure function of the row, stable across reruns and cluster
    * sizes), and each shard gets an integrity row: doc count, token
    * total, and an ORDER-INSENSITIVE id checksum (sum of each id's
    * 32-bit md5 hex prefix) — map-side combinable, no per-shard sort or
    * collect, integer-exact in any engine with md5. A consumer
    * recomputes the same manifest after transport and diffs it; a
    * mismatch names the shard, not just "something differs".
    */
  def shardManifest(docs: DataFrame, id: Column, tokens: Column,
                    shards: Int): DataFrame =
    docs.select(
        hashBucket(id, shards).as("shard"),
        id.cast("string").as("id_s"),
        tokens.cast("long").as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(conv(substring(md5(col("id_s")), 1, 8), 16, 10).cast("long"))
          .as("id_checksum"))
}
