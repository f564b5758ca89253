package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{Boilerplate, Decontaminate, Dedup, LanguageModel, Sampling, SequencePack, Similarity, SubstringDedup, TextAnalysis}

/** LLM-training-corpus operators over `documents` / `embeddings`:
  * deduplication (exact, Jaccard, MinHash+LSH, SimHash), similarity search
  * (brute-force + LSH ANN), text analysis (token stats, lang-ID, quality,
  * fingerprints). The un-oracled entries (LSH variants) are verified by
  * dedicated ScalaTest specs instead (recall vs the exact computation).
  */
object CorpusQueries extends QueryGroup {

  private val enList = Seq("the", "a", "and", "of", "to")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        // floor-quantize, not round(): both engines compute the identical
        // IEEE quotient, but round() disagrees at exact .xxxx5 boundaries
        (floor(TextAnalysis.avgTokenLen(col("text")) * 10000) / 10000.0)
          .as("avg_token_len"),
        TextAnalysis.stopwordHits(col("text"), enList).cast("long").as("stop_hits_en"),
        TextAnalysis.tokenCountBpeIsh(col("text")).as("bpe_ish_tokens"))),

    "a_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    "a_quality_score" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))),

    "a_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.prefixFingerprint(col("text"), 8).as("prefix_fp"))),

    "a_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"))),

    // content-based blocking: docs sharing an 8-token prefix fingerprint
    // are candidates — finds real near-dups regardless of id locality
    "a_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"),
        TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)),

    // Char-3-gram Jaccard: shingle-level near-dup detection, robust to
    // tokenization drift (same content-based blocking, shingles differ)
    "a_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsBy(t(s, dir, "documents"),
        TextAnalysis.prefixFingerprint(col("text"), 8),
        Dedup.charNgrams(col("text"), 3), 0.8)),

    // Per-source cap: top-N docs per source by quality — the
    // anti-domination rule (one domain can't swamp the corpus)
    "a_source_caps" -> ((s, dir) =>
      Sampling.sourceCaps(t(s, dir, "documents"),
        TextAnalysis.qualityScore(col("text")), cap = 10)),

    // Asymmetric containment: |A∩B|/|A| vs /|B| — flags near-supersets
    // (quotes, expansions) whose Jaccard stays low because the union is
    // dominated by the long side; same blocked candidate stage
    "a_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"),
        TextAnalysis.prefixFingerprint(col("text"), 8),
        array_distinct(split(col("text"), " ")), 0.9)),

    // Pair lists become an actionable keep/drop set: connected components
    // over the near-dup pair graph, canonical = min doc_id per cluster
    "a_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs,
        TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)
      Dedup.dedupClusters(docs, pairs)
        .select(col("doc_id"), col("cluster_id"),
          col("is_canonical").cast("int").as("is_canonical"))
    }),

    // representative selection by quality: within each near-dup cluster
    // keep the highest-quality member (ties → lowest doc_id) — curation
    // policy when crawls of the same page differ in extraction quality
    "a_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs,
        TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)
      val clusters = Dedup.dedupClusters(docs, pairs)
        .select(col("doc_id"), col("cluster_id"))
      val quality = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      Dedup.keepBest(clusters.join(quality, "doc_id"))
    }),

    // Leak-free split: near-dup clusters are assigned to
    // train/valid/test WHOLESALE (hash of the cluster id, not the doc
    // id), so no near-duplicate pair straddles a split boundary — the
    // eval contamination a per-document split cannot rule out
    "a_leakfree_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs,
        TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)
      val clusters = Dedup.dedupClusters(docs, pairs)
        .select(col("doc_id"), col("cluster_id"))
      Sampling.leakFreeSplit(clusters, col("cluster_id"),
          Seq("valid" -> 5, "test" -> 10, "train" -> 100))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
    }),

    // Token-budget curation: the best 12k tokens by quality DENSITY
    // (quality per token, so short high-quality docs beat long mediocre
    // ones) — bucket-level greedy selection, no global sort
    // (Sampling.budgetSelect)
    "a_budget_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
      Sampling.budgetSelect(docs, col("quality"), col("n_toks"),
          budget = 12000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),

    // LSH is a candidate *generator*; the emitted pairs are verified by
    // exact shingle-Jaccard, so with enough bands the result equals the
    // exact all-pairs computation — which is what the oracle computes
    // (and why the oracle needs no banding knowledge: recall at the
    // threshold is held ≥ 1-1e-7 at every size). Banding derives from
    // (threshold, corpus size) via Dedup.lshParams — the r8 promotion of
    // the r7 10× finding (r=2 constants grew candidates 33× for 10×
    // docs; the dial must climb with N)
    "a_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairsAuto(t(s, dir, "documents"),
        shingleSize = 3, minJaccard = 0.8)),

    // One-permutation densified MinHash (Li/Owen/Zhang OPH + Shrivastava
    // rotation densification): every shingle hashed ONCE — the signature
    // stage goes O(shingles + slots) instead of O(shingles × perms), the
    // shape that dominates as lshParams drives the permutation count into
    // the hundreds. Same banding, same exact-Jaccard verify, so the
    // output still equals the exact all-pairs oracle.
    "a_minhash_oph" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (bands, rowsPerBand) = Dedup.lshParams(0.8, docs.count())
      Dedup.minhashLshPairs(docs, shingleSize = 3, bands, rowsPerBand,
        minJaccard = 0.8, onePerm = true)
    }),

    // Portable 32-bit simhash (md5-derived token hash) in 4 bands of 8
    // bits: hamming <= 3 < nBands pairs provably share a band (recall 1.0),
    // so the output is exactly the all-pairs hamming computation the
    // oracle reproduces bit-for-bit in SQL. Signature = native one-pass
    // codegen expression (no explode/agg shuffle).
    "a_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairsNative(t(s, dir, "documents"), maxHamming = 3,
        bits = 32, nBands = 4, useMd5 = true)),

    // Benchmark decontamination: training docs sharing any 5-token
    // shingle with the eval set (doc_id%11==0 stands in for a benchmark
    // suite); eval shingles broadcast, corpus side never shuffles
    "a_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.contaminatedDocs(
        docs.filter(col("doc_id") % 11 =!= 0),
        docs.filter(col("doc_id") % 11 === 0), n = 5)
    }),

    // Fuzzy decontamination: training docs NEAR-duplicating the eval
    // split (MinHash candidates, exact-Jaccard verified) — catches the
    // paraphrased leakage a_decontaminate's exact collisions miss
    "a_neardup_decontaminate" -> ((s, dir) =>
      Decontaminate.nearDupContaminated(t(s, dir, "documents"),
        isBenchmark = c => c % 11 === 0,
        shingleSize = 3, bands = 16, rowsPerBand = 2, minJaccard = 0.8)),

    // Gopher-style repetition signals: high duplicate-token /
    // top-token / duplicate-2-gram fractions mark boilerplate
    "a_repetition_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.dupTokenFrac(col("text")).as("dup_token_frac"),
        TextAnalysis.topTokenFrac(col("text")).as("top_token_frac"),
        TextAnalysis.dup2gramFrac(col("text")).as("dup_2gram_frac"))),

    // Concatenate-and-chunk sequence packing: 8 independent shard
    // streams, 2048-token windows, deterministic pack ids + offsets
    "a_sequence_pack" -> ((s, dir) =>
      SequencePack.pack(t(s, dir, "documents"),
        TextAnalysis.tokenCount(col("text")), budget = 2048, shards = 8)),

    // Deterministic per-language sampling: md5-bucket under a
    // per-stratum rate — a pure filter, no shuffle, rerun-stable
    "a_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(t(s, dir, "documents"), col("lang"),
        col("doc_id"),
        Map("en" -> 60, "de" -> 40, "fr" -> 40, "es" -> 20, "zh" -> 20))
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id")).as("bucket"))),

    // Reproducible named splits from the same hash bucket
    "a_train_split" -> ((s, dir) =>
      t(s, dir, "documents").select(
        Sampling.splitColumn(col("doc_id"),
          Seq("valid" -> 5, "test" -> 10, "train" -> 100)).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))),

    "a_embed_norms" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        Similarity.q6(Similarity.norm(col("embedding"))).as("norm"))),

    "a_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") % 100 === 0), e, 5)
    }),

    // Matryoshka retrieval (Kusupati et al. 2022): search on the FIRST
    // 32 dims only — the MRL cheap first tier (half the bytes scanned,
    // same broadcast/no-corpus-shuffle shape); rankings verified exactly
    // on the truncated space.
    "a_matryoshka_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val trunc = e.select(col("vec_id"),
        slice(col("embedding"), 1, 32).as("embedding"))
      Similarity.bruteForceTopK(
        trunc.filter(col("vec_id") % 100 === 0), trunc, 5)
    }),

    // Contrastive-training data prep: semi-hard negatives per query —
    // the most-similar candidates inside [0.1, 0.5), informative but
    // safely below the near-duplicate band
    "a_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(e.filter(col("vec_id") % 100 === 0), e, 5,
        lo = 0.1, hi = 0.5)
    }),

    "a_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val b = e.select(floor(col("vec_id") / 50).cast("long").as("bucket"),
        col("vec_id"), col("embedding"))
      val l = b.select(col("bucket"), col("vec_id").as("id_a"),
        col("embedding").as("ea"))
      val r = b.select(col("bucket").as("bucket_r"), col("vec_id").as("id_b"),
        col("embedding").as("eb"))
      l.join(r, col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
        .withColumn("sim", Similarity.q6(Similarity.cosineNative(e)(col("ea"), col("eb"))))
        .filter(col("sim") >= 0.3)
        .select(col("id_a"), col("id_b"), col("sim"))
    }),

    "a_ann_lsh" -> ((s, dir) =>
      Similarity.annLsh(t(s, dir, "embeddings"), dims = 64, nBits = 8,
        minSim = 0.3)),

    // Vocabulary coverage: integer-exact LM-quality proxy (rare-token
    // and top-vocab hit counts; no float log-probs, so it reproduces
    // bit-for-bit across engines)
    "a_vocab_coverage" -> ((s, dir) =>
      graft.analytics.Vocabulary.coverage(t(s, dir, "documents"),
        rareBelow = 200L, topM = 10)),

    // PII scrubbing: deterministic synthetic PII (emails, phones, IPs)
    // appended per doc, then the regexp_replace redaction chain; had_pii
    // flags rows the chain touched
    "a_pii_redact" -> ((s, dir) => {
      val raw = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" call +1 555 0123 4567 or 10.0.0."), col("doc_id") % 256))
          .otherwise(lit("")))
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.redactPii(raw).as("clean"),
        (raw =!= TextAnalysis.redactPii(raw)).cast("int").as("had_pii"))
    }),

    // Corpus roll-up: per-language doc/token/source counts plus an
    // integer-exact quality sum (floor-quantized per doc, so the sum is
    // order-independent — no float accumulation drift)
    "a_corpus_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("total_tokens"),
        max(TextAnalysis.tokenCount(col("text"))).cast("long")
          .as("max_tokens"),
        countDistinct(col("source")).as("n_sources"),
        sum(floor(TextAnalysis.qualityScore(col("text")) * 10000)
          .cast("long")).as("quality_sum_q4"))),

    // End-to-end curation pipeline: quality filter → prefix-fingerprint
    // dedup (keep min doc_id) → stratified sample → sequence packing.
    // One shuffle per stage boundary that needs one (fp window, shard
    // window); the filters and sampling are map-only
    "a_curation_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val kept = docs
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.6)
        .withColumn("fp", TextAnalysis.prefixFingerprint(col("text"), 8))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
      val sampled = Sampling.stratifiedSample(kept, col("lang"),
        col("doc_id"),
        Map("en" -> 60, "de" -> 40, "fr" -> 40, "es" -> 20, "zh" -> 20))
      SequencePack.pack(sampled, TextAnalysis.tokenCount(col("text")),
        budget = 1024, shards = 4)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("shard"), col("pack_id"),
          col("pack_offset"))
    }),

    // Incremental crawl dedup: new half (doc_id>=250) against history
    // (doc_id<250) on the 8-token prefix fingerprint — bloom prefilter
    // (map-only) then exact verify, result equals the exact anti-join
    "a_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalDedup(
        docs.filter(col("doc_id") >= 250),
        docs.filter(col("doc_id") < 250),
        TextAnalysis.prefixFingerprint(col("text"), 8))
    }),

    // SemDeDup: embedding near-dups via IVF-cell blocking (content-based,
    // unlike a_cosine_pairs' id-range buckets) resolved to keep/drop
    // clusters — the embedding-space analogue of a_dedup_clusters. The
    // cell count derives from corpus size (k ≈ √N, the r7 10× fix
    // promoted to code); the oracle inlines the same heuristicK(N)
    // centroid literals via QueryContext
    "a_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedupAuto(t(s, dir, "embeddings"), minSim = 0.3)),

    // Cross-document passage (boilerplate) dedup, the CCNet paragraph
    // shape: passages occurring in >= 2 distinct docs are dropped and
    // the survivors reassemble in document order (empty text kept for
    // fully-boilerplate docs)
    "a_passage_dedup" -> ((s, dir) =>
      Boilerplate.removeBoilerplate(t(s, dir, "documents"),
        width = 16, minDocs = 2)),

    // Suffix-array-style exact substring dedup (windowed-hash
    // approximation): stride-1 16-token windows find shared substrings
    // at ANY offset; overlapping duplicated windows fold into spans
    // with exact token coverage
    "a_substring_dedup" -> ((s, dir) =>
      SubstringDedup.substringStats(t(s, dir, "documents"),
        width = 16, minDocs = 2)),

    // KenLM-style corpus-LM quality score: add-one-smoothed bigram
    // probabilities (trained on the corpus itself), per-term quantized
    // to 1e-9 then summed exactly — see LanguageModel for why the score
    // stays in the probability domain
    "a_lm_score" -> ((s, dir) =>
      LanguageModel.bigramScore(t(s, dir, "documents"))),

    // Stupid-Backoff trigram scoring (Brants et al. 2007): LM trained on
    // the even-doc split, applied to the odd-doc split — the CCNet shape
    // (reference-corpus model scoring the crawl), with the backoff paths
    // live (held-out trigrams miss the train counts)
    "a_backoff_trigram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      LanguageModel.stupidBackoffScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    }),

    // Okapi BM25 lexical retrieval (odds-ratio IDF, engine-exact): top-20
    // documents for a query term bag — decontamination probes and corpus
    // slicing, the lexical leg of hybrid retrieval
    "a_bm25_topk" -> ((s, dir) =>
      graft.analytics.Bm25.topK(t(s, dir, "documents"),
        Seq("spark", "merge", "window"), k = 20)),

    // Misra-Gries heavy hitters: per-language top-5 terms through the
    // mergeable bounded-counter summary (exact here — capacity exceeds
    // the per-language vocabulary; the N/(capacity+1) error regime is
    // spec-asserted)
    "a_heavy_hitters" -> ((s, dir) =>
      graft.analytics.HeavyHitters.topTermsByLang(
        t(s, dir, "documents"), k = 5, capacity = 4096)),

    // HDR-histogram length sketch (analytics/Histogram.scala): per-lang
    // token-count distribution as log2/16-sub-bucket rows — one
    // map-side-combinable count agg, bit-identical across engines and
    // merge orders; bounds decoded back for inspection.
    "a_hdr_histogram" -> ((s, dir) => {
      import graft.analytics.Histogram
      Histogram.hdrHistogram(t(s, dir, "documents"), col("lang"),
          TextAnalysis.tokenCount(col("text")), s = 4)
        .select(col("group").as("lang"), col("bucket"),
          Histogram.lowerBound(col("bucket"), 4).as("lo"),
          Histogram.upperBound(col("bucket"), 4).as("hi"), col("n"))
    }),

    // Quantiles from the histogram sketch: nearest-rank p50/p90/p99 per
    // language over ≤ a few hundred bucket rows — the scale path that
    // replaces an exact per-group percentile sort; ≤ 2^-4 relative
    // error by construction, integer-exact cross-engine.
    "a_hdr_quantiles" -> ((s, dir) => {
      import graft.analytics.Histogram
      Histogram.quantiles(
          Histogram.hdrHistogram(t(s, dir, "documents"), col("lang"),
            TextAnalysis.tokenCount(col("text")), s = 4),
          s = 4,
          qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
        .select(col("group").as("lang"), col("qname"), col("est"))
    }),

    // Windowed co-occurrence + PMI (analytics/Cooccurrence.scala):
    // collocation strength over a ±2 token window — pair/unigram hash
    // counts, scalar-total broadcast, min-count pruning before the
    // vocab-bounded joins.
    "a_cooccurrence_pmi" -> ((s, dir) =>
      graft.analytics.Cooccurrence.pmiPairs(
        t(s, dir, "documents"), col("text"), window = 2,
        minPair = 5, minTerm = 10)),

    // Fill-in-the-middle transform (analytics/Fim.scala): PSM/SPM
    // sentinel serialization with md5-derived cut points — map-only,
    // reproducible, the code/text infilling prep of modern pretraining.
    "a_fim_transform" -> ((s, dir) =>
      graft.analytics.Fim.transform(t(s, dir, "documents"),
        col("doc_id"), col("text"))),

    // Deterministic shard manifest (Sampling.shardManifest): the export
    // integrity contract — per-shard doc/token counts + order-
    // insensitive id checksum, reproducible by any engine with md5.
    "a_corpus_shards" -> ((s, dir) =>
      Sampling.shardManifest(t(s, dir, "documents"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")), shards = 16)),

    // Count-Min frequency sketch (analytics/CountMin.scala): 4×1024
    // counter cells over the document tokens — bounded-size point-
    // frequency summary, mergeable by cell sum, register-exact oracle.
    "a_countmin_sketch" -> ((s, dir) =>
      graft.analytics.CountMin.sketch(
        t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("term")),
        col("term"), depth = 4, width = 1024)),

    // CMS probes: min-of-cells estimates for present AND absent terms
    // (overestimate-only contract; the ≤ true + εN bound is
    // spec-asserted against exact counts)
    "a_countmin_estimate" -> ((s, dir) => {
      val sk = graft.analytics.CountMin.sketch(
        t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("term")),
        col("term"), depth = 4, width = 1024)
      graft.analytics.CountMin.estimate(sk,
        Seq("spark", "merge", "window", "table", "row", "key",
          "never_seen_term"), depth = 4, width = 1024)
    }),

    // Near-dup overlap matrix across sources: where is the duplication
    // coming from? (the report a crawl-curation run starts from)
    "a_source_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs,
        TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)
      val src = docs.select(col("doc_id"), col("source"))
      // pair list is tiny relative to the corpus: broadcast it through
      // both id->source lookups so the corpus never shuffles
      broadcast(broadcast(pairs)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          "id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          "id_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"), col("jaccard"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          max(col("jaccard")).as("max_jaccard"))
    }),

    // int8 embedding quantization (absmax symmetric): the 4x storage
    // compression step; codes verified via exact sum + content hash
    "a_embed_quantize" -> ((s, dir) => {
      val q = Similarity.quantizeInt8(col("embedding"))
      t(s, dir, "embeddings").select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          .as("scale"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"),
        md5(concat_ws(",", transform(q, _.cast("string")))).as("q_hash"))
    }),

    // DSIR importance resampling (Xie et al. 2023): hashed-feature
    // target-vs-raw log-likelihood ratio per doc, integer micro-units
    // for exact cross-engine sums; target domain = English docs
    "a_dsir_scores" -> ((s, dir) =>
      graft.analytics.Dsir.importanceScores(
        t(s, dir, "documents"), col("lang") === "en")),

    // Overlapping token-window chunking (window 128, stride 96): the
    // RAG/pretraining chunker as a map-only explode; chunk content
    // addressed by (doc_id, start_tok, n_tokens) + md5 fingerprint
    "a_doc_chunks" -> ((s, dir) =>
      graft.analytics.Chunking.chunk(t(s, dir, "documents"),
        window = 128, stride = 96)),

    // Reproducible global training-order shuffle: seed-keyed md5 order,
    // rerun- and cluster-size-stable, one shuffle
    "a_corpus_shuffle" -> ((s, dir) =>
      graft.analytics.Sampling.deterministicShuffle(
        t(s, dir, "documents"), col("doc_id"), shards = 8, seed = "42")
        .select(col("doc_id"), col("shard"), col("pos"))),

    // Learned quality classifier: 3 full-batch GD steps of logistic
    // regression over hashed token counts, gradients exact-summed in
    // integer micro-units (tree-aggregated — one B+1-number agg per
    // pass); output = the trained weight vector, bit-pinned
    "a_quality_classifier" -> ((s, dir) =>
      graft.analytics.QualityClassifier.trainedWeights(
        t(s, dir, "documents"), col("lang") === "en",
        buckets = 16, iters = 3, lr = 0.1)),

    // Vocabulary induction: top-200 token bigrams by corpus count (the
    // first step of merge-based tokenizer training), deterministic
    // tie-break by the pair itself
    "a_vocab_induction" -> ((s, dir) => {
      val withToks = t(s, dir, "documents")
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2) // sequence(1,0) counts DOWN
      val pairs = withToks.select(
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("w1"), col("w2"))))
        .filter(col("rk") <= 200)
        .select(col("rk").cast("long").as("rk"), col("w1"), col("w2"),
          col("cnt"))
    }),

    // Mixture construction: per-source target weights → deterministic
    // per-document repeat factors hitting the token-budget proportions
    // (sources with index % 4 == 1 upweighted 3:1, budget = 2× corpus)
    "a_mixture_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sources = docs.select(col("source")).distinct()
        .collect().map(_.getString(0))
      val weights = sources.map(src => src ->
        (if (src.stripPrefix("src").toInt % 4 == 1) 3L else 1L)).toMap
      graft.analytics.Mixture.repeatFactors(docs, weights, budgetFactor = 2)
    }),

    // mixture → physical assembly fused with packing: one row per
    // physical copy with its pack id, zero extra shuffles vs packing
    // alone (explode is map-only over the broadcast rate join)
    "a_mixture_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sources = docs.select(col("source")).distinct()
        .collect().map(_.getString(0))
      val weights = sources.map(src => src ->
        (if (src.stripPrefix("src").toInt % 4 == 1) 3L else 1L)).toMap
      graft.analytics.Mixture.packMixture(docs, weights,
        budgetFactor = 2, budget = 2048, shards = 8)
    }),

    // temperature-scaled multilingual sampling (q_l ∝ p_l^0.5): the
    // weight table is DERIVED from per-language token counts instead of
    // hand-written — α = 1/2 rides IEEE sqrt so factors are bit-exact
    // cross-engine (see Mixture.temperatureFactors)
    "a_temperature_mixture" -> ((s, dir) =>
      graft.analytics.Mixture.temperatureFactors(
        t(s, dir, "documents"), budgetFactor = 2)),

    // IVF ANN with pretrained cells: the oracle replays the identical
    // cell-assignment + probe + rank computation from centroid literals
    // (the data-fitted k-means trainer is exercised by CoordinatorIvfSpec,
    // which bounds its recall vs brute force)
    "a_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val centroids = graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64)
      graft.analytics.Ivf.searchTopK(e, e.filter(col("vec_id") % 100 === 0),
        centroids, k = 5, nprobe = 4)
    }),

    // IVF with a MATERIALIZED index: cell-partitioned parquet built
    // once (map-only), searches read ONLY the probed cells' partitions
    // (partition filter — PlanSpec asserts the pruned scan). Same
    // results as the in-memory a_ann_ivf, so the same oracle replays it.
    "a_ann_ivf_index" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val centroids = graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64)
      val idx = java.nio.file.Files.createTempDirectory("ivf-index").toString
      graft.analytics.Ivf.writeIndex(e, centroids, idx)
      graft.analytics.Ivf.searchIndexTopK(s, idx,
        e.filter(col("vec_id") % 100 === 0), centroids, k = 5, nprobe = 4)
    }),

    // Streaming IVF index MAINTENANCE: two thirds of the corpus build the
    // base index; the remaining third arrives as a stream and appends into
    // the cell-partitioned layout per micro-batch (map-only foreachBatch,
    // no rewrite). A search over the maintained index must equal one over
    // an index built from the whole corpus at once.
    "stream_ivf_append" -> ((s, dir) => {
      import graft.analytics.Ivf
      val e = t(s, dir, "embeddings")
      val centroids = Ivf.pretrainedCentroids(k = 16, dims = 64)
      val idx = java.nio.file.Files.createTempDirectory("ivf-stream").toString
      Ivf.writeIndex(e.filter(col("vec_id") % 3 =!= 0), centroids, idx)
      val q = s.readStream.schema(e.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .filter(col("vec_id") % 3 === 0)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Ivf.appendIndex(batch, centroids, idx)
        }
        .option("checkpointLocation", s"$idx-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Ivf.searchIndexTopK(s, idx,
        e.filter(col("vec_id") % 97 === 0), centroids, k = 5, nprobe = 4)
    }),

    // Topic-cluster profile: spherical k-means cell per vector (the IVF
    // geometry), rolled up to cluster size + majority label (purity)
    "a_doc_clusters" -> ((s, dir) =>
      graft.analytics.Ivf.clusterProfile(t(s, dir, "embeddings"),
        graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64))),

    // TF-IDF keyword extraction: top-3 salient terms per document by
    // exact integer tf·idf (reciprocal idf — engine-exact, see TfIdf)
    "a_tfidf_terms" -> ((s, dir) =>
      graft.analytics.TfIdf.topTerms(t(s, dir, "documents"), k = 3)),

    // CCNet-style perplexity bucketing: LM-score every doc, cut each
    // language into head/middle/tail tiles — the published-corpus
    // partition and the standard "drop the tail" mixture axis
    "a_ccnet_buckets" -> ((s, dir) =>
      LanguageModel.ccnetBuckets(t(s, dir, "documents"))),

    // the scale default of the same bucketing: approx_percentile cut
    // scores + map-only bucketing — no per-language row sort anywhere
    // (exact ntile kept above for the bit-exact tile oracle)
    "a_ccnet_buckets_approx" -> ((s, dir) =>
      LanguageModel.ccnetBucketsApprox(t(s, dir, "documents"))),

    // BPE tokenizer training: the merge-learning loop — one corpus scan
    // for word counts, then vocab-sized iterations picking the top
    // adjacent symbol pair; output is the merge table a tokenizer ships
    "a_bpe_merges" -> ((s, dir) =>
      graft.analytics.Vocabulary.bpeMerges(t(s, dir, "documents"),
        nMerges = 6)),

    // Tokenizer application: the 6 trained merges applied corpus-wide
    // via the native BpeEncode expression (map-only, merge table as a
    // codegen reference — no join/explode); per-doc token count + a
    // fingerprint of the full subword stream
    "a_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.analytics.Vocabulary.bpeMerges(docs, nMerges = 6)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.analytics.Vocabulary.bpeTokenize(docs, merges)
        .select(col("doc_id"),
          size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"),
          md5(array_join(col("bpe_tokens"), " ")).as("tok_hash"))
    }),

    // tokenizer fertility by language (subword tokens per word, bytes
    // per subword token) against the corpus-trained merge table — the
    // metric that exposes a vocabulary fragmenting scripts it wasn't
    // trained on
    "a_token_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.analytics.Vocabulary.bpeMerges(docs, nMerges = 6)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.analytics.Vocabulary.tokenFertility(docs, merges)
    }),

    // Product-quantization ANN (the 1B-vector memory path): corpus
    // collapses to m=8 codes/vector via the native codegen PqEncode;
    // search is asymmetric — exact query vs codebook reconstruction
    "a_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cbs = graft.analytics.Pq.pretrainedCodebooks(m = 8, ksub = 16,
        dsub = 8)
      graft.analytics.Pq.searchTopK(e, e.filter(col("vec_id") % 100 === 0),
        cbs, k = 5)
    }),

    // Binary (sign) quantization ANN: 64 dims → one BIGINT signature,
    // ranking is bit_count(xor) — integer-only POPCNT retrieval, the
    // cheapest tier of a binary-rerank stack
    "a_ann_hamming" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.annHamming(e, e.filter(col("vec_id") % 100 === 0),
        dims = 64, k = 5)
    }),

    // IVF-PQ: coarse cells prune (nprobe equi-join), PQ codes bound
    // memory — the corpus join side carries only (cell, 8 code ints)
    "a_ivf_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64)
      val cbs = graft.analytics.Pq.pretrainedCodebooks(m = 8, ksub = 16,
        dsub = 8)
      graft.analytics.Pq.searchTopKIvf(e,
        e.filter(col("vec_id") % 100 === 0), cents, cbs, k = 5, nprobe = 4)
    })
  )

  private val enIn = enList.map(w => s"'$w'").mkString("(", ",", ")")
  private val allStop = TextAnalysis.langStopwords.flatMap(_._2)
    .map(w => s"'$w'").mkString("(", ",", ")")

  /** Exact all-pairs 3-shingle Jaccard — the ground truth `a_minhash_lsh`
    * must equal (its candidates are exact-verified, its bands catch every
    * qualifying pair at these parameters).
    */
  private def minhashOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      | s AS (SELECT doc_id,
      |   list_distinct([array_to_string(toks[i:i+2],' ')
      |     for i in range(1, greatest(len(toks)-2, 1)+1)]) AS sh
      |  FROM t)
      |SELECT id_a, id_b, jaccard FROM (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  floor(len(list_intersect(a.sh, b.sh))::DOUBLE
      |    / len(list_distinct(list_concat(a.sh, b.sh))) * 10000) / 10000.0 AS jaccard
      | FROM s a JOIN s b ON a.doc_id < b.doc_id) p
      |WHERE jaccard >= 0.8""".stripMargin

  /** Bit-exact 32-bit simhash reproduced in SQL: md5-hex token hash →
    * per-bit majority vote → all-pairs hamming <= 3.
    */
  private def simhashOracle: String = {
    val bits = 32
    val votes = (0 until bits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val combine = (0 until bits).map(b =>
      s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id,
       |   unnest(list_distinct(string_split(text,' '))) AS w FROM documents),
       | hh AS (SELECT doc_id,
       |   list_sum([ (strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1)::BIGINT
       |     << ((8-i)*4) for i in range(1, 9)]) AS h FROM tok),
       | v AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
       | s AS (SELECT doc_id, $combine AS simhash FROM v)
       |SELECT id_a, id_b, hamming FROM (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       | FROM s a JOIN s b ON a.doc_id < b.doc_id) p
       |WHERE hamming <= 3""".stripMargin
  }

  /** The full IVF search replayed in SQL from the pretrained-centroid
    * literals: unit-normalize, L2 cell assignment (argmin), nprobe nearest
    * cells, exact cosine within probed cells, per-query ranking — the same
    * computation `Ivf.searchTopK` runs, step for step.
    */
  private def annIvfOracle: String = annIvfOracle("% 100 = 0")

  /** IVF search oracle parameterized by the query-set predicate. */
  private def annIvfOracle(queryPred: String): String = {
    val k = 16; val dims = 64; val nprobe = 4; val topK = 5
    val cents = graft.analytics.Ivf.pretrainedCentroids(k, dims)
    val distList = cents.map { c =>
      val lit = c.mkString("[", ",", "]")
      s"list_sum(list_transform(list_zip(ne, $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
    }.mkString("[", ", ", "]")
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |   list_transform(embedding::DOUBLE[], x ->
       |     x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS ne
       |  FROM embeddings),
       | d AS (SELECT vec_id, emb, $distList AS dists FROM n),
       | cells AS (SELECT vec_id AS neighbor_id, emb AS ce,
       |   list_indexof(dists, list_min(dists)) - 1 AS cell FROM d),
       | probes AS (SELECT vec_id AS query_id, emb AS qe,
       |   unnest(list_transform(list_sort(list_zip(dists, range(0, $k))),
       |     p -> p[2])[1:$nprobe]) AS cell
       |  FROM d WHERE vec_id $queryPred),
       | sc AS (SELECT query_id, neighbor_id,
       |   floor(list_cosine_similarity(ce, qe) * 1000000) / 1000000.0 AS sim
       |  FROM cells JOIN probes USING (cell) WHERE query_id <> neighbor_id)
       |SELECT query_id,
       | CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rk,
       | neighbor_id, sim
       |FROM sc QUALIFY rk <= $topK""".stripMargin
  }

  /** The full SemDeDup computation replayed in SQL: unit-normalize, L2
    * cell assignment from the pretrained-centroid literals, within-cell
    * cosine pairs, then EXACT transitive closure (the oracle's connected
    * components, vs the engine's bounded min-label propagation). The
    * cell count is the SAME size-derived heuristicK(N) the engine uses
    * (N from parquet footers via QueryContext; fallback = the sf0.01
    * fixture's 500 vectors).
    */
  private def semanticDedupOracle: String = {
    val n = QueryContext.parquetRowCount("embeddings", 500L)
    val k = graft.analytics.Ivf.heuristicK(n)
    val dims = 64; val minSim = 0.3
    val cents = graft.analytics.Ivf.pretrainedCentroids(k, dims)
    val distList = cents.map { c =>
      val lit = c.mkString("[", ",", "]")
      s"list_sum(list_transform(list_zip(ne, $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
    }.mkString("[", ", ", "]")
    // Above Ivf.twoLevelCellThreshold the ENGINE assigns cells via the
    // coarse-fine restricted argmin (probeGroups=2); the oracle must
    // replay the SAME restriction or boundary vectors land in different
    // cells exactly in the regime the optimization targets. coarseGroups
    // is deterministic driver-side, so both sides derive identical
    // (coarse means, members) from the same centroid literals.
    val cellsCte =
      if (k < graft.analytics.Ivf.twoLevelCellThreshold)
        s""" d AS (SELECT vec_id, emb, $distList AS dists FROM n),
           | cells AS (SELECT vec_id, emb,
           |   list_indexof(dists, list_min(dists)) - 1 AS cell FROM d),""".stripMargin
      else {
        val (coarse, members) = graft.analytics.Ivf.coarseGroups(cents)
        val g = coarse.length
        val probe = math.min(2, g)
        val cdistList = coarse.map { c =>
          val lit = c.mkString("[", ",", "]")
          s"list_sum(list_transform(list_zip(ne, $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
        }.mkString("[", ", ", "]")
        // group index per cell (literal lookup list, 1-based in SQL)
        val grpOfCell = new Array[Int](k)
        members.zipWithIndex.foreach { case (mem, gi) =>
          mem.foreach(c => grpOfCell(c) = gi) }
        val grpList = grpOfCell.mkString("[", ",", "]")
        // probed groups = the `probe` nearest coarse means by (dist, idx);
        // non-member cells masked to +huge so the flat first-min argmin
        // is restricted to the probed groups' members (engine tie-break:
        // lowest cell index wins — list_indexof returns the first hit)
        s""" d AS (SELECT vec_id, emb, $distList AS dists,
           |   $cdistList AS cdists FROM n),
           | p AS (SELECT vec_id, emb, dists,
           |   list_transform(list_sort(list_zip(cdists, range(0, $g))),
           |     q -> q[2])[1:$probe] AS pg FROM d),
           | msk AS (SELECT vec_id, emb,
           |   list_transform(list_zip(dists, $grpList),
           |     q -> CASE WHEN list_contains(pg, q[2]) THEN q[1]
           |          ELSE 1e308 END) AS m FROM p),
           | cells AS (SELECT vec_id, emb,
           |   list_indexof(m, list_min(m)) - 1 AS cell FROM msk),""".stripMargin
      }
    s"""WITH RECURSIVE n AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |   list_transform(embedding::DOUBLE[], x ->
       |     x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS ne
       |  FROM embeddings),
       |$cellsCte
       | pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE floor(list_cosine_similarity(a.emb, b.emb) * 1000000) / 1000000.0 >= $minSim),
       | e AS (SELECT id_a AS src, id_b AS dst FROM pr
       |  UNION ALL SELECT id_b, id_a FROM pr),
       | reach(id, r) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
       |SELECT v.vec_id,
       | coalesce(min(reach.r), v.vec_id) AS cluster_id,
       | CAST(v.vec_id = coalesce(min(reach.r), v.vec_id) AS INTEGER) AS is_canonical
       |FROM embeddings v LEFT JOIN reach ON reach.id = v.vec_id
       |GROUP BY v.vec_id""".stripMargin
  }

  /** Hyperplane-LSH buckets reproduced with the exact literal hyperplanes
    * the Spark side uses (deterministic fixed-seed LCG), then exact cosine
    * within shared buckets.
    */
  private def annLshOracle: String = {
    val dims = 64
    val nBits = 8
    val bucket = (0 until nBits).map { b =>
      val h = Similarity.hyperplane(b, dims).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(e, $h::DOUBLE[]) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
       |  $bucket AS bucket FROM embeddings)
       |SELECT id_a, id_b, sim, bucket FROM (
       | SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |  floor(list_cosine_similarity(a.e, c.e) * 1000000) / 1000000.0 AS sim, a.bucket AS bucket
       | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) p
       |WHERE sim >= 0.3""".stripMargin
  }

  /** Same cell geometry as annIvfOracle (normalize → L2 distances to the
    * pretrained-centroid literals → first argmin), rolled up to cluster
    * size + majority label.
    */
  private def docClustersOracle: String = {
    val cents = graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64)
    val distList = cents.map { c =>
      val lit = c.mkString("[", ",", "]")
      s"list_sum(list_transform(list_zip(ne, $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
    }.mkString("[", ", ", "]")
    s"""WITH n AS (SELECT vec_id, label,
       |   list_transform(embedding::DOUBLE[], x ->
       |     x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS ne
       |  FROM embeddings),
       | d AS (SELECT vec_id, label, $distList AS dists FROM n),
       | cells AS (SELECT vec_id, label,
       |   CAST(list_indexof(dists, list_min(dists)) - 1 AS INT) AS cluster FROM d),
       | bl AS (SELECT cluster, label, count(*) AS n FROM cells
       |  GROUP BY cluster, label),
       | pr AS (SELECT cluster, label, n,
       |   row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rk,
       |   sum(n) OVER (PARTITION BY cluster) AS n_vecs,
       |   count(*) OVER (PARTITION BY cluster) AS n_labels
       |  FROM bl)
       |SELECT cluster, CAST(n_vecs AS BIGINT) AS n_vecs,
       | CAST(n_labels AS BIGINT) AS n_labels, label AS top_label,
       | CAST(n AS BIGINT) AS top_label_n
       |FROM pr WHERE rk = 1""".stripMargin
  }

  /** The BPE merge loop unrolled to `nMerges` SQL layers: each layer
    * recomputes weighted adjacent-pair counts from the previous symbol
    * state, picks the (n desc, pair asc) winner, and applies it with
    * the same literal space-sentineled `replace` as the engine — both
    * engines scan left-to-right over the pre-replacement string, so the
    * application order is identical by construction. Every layer is
    * MATERIALIZED: each merge CTE is referenced three times by the next
    * layer, and DuckDB's default inlining would re-expand the whole
    * chain ~3^n times (measured: never finishes at n=6; 0.08 s
    * materialized).
    */
  /** Replay of [[graft.analytics.QualityClassifier.train]]: feature
    * counts per md5 bucket, then unrolled GD iterations — each
    * iteration's gradient is a BIGINT sum of per-doc floor-quantized
    * contributions (exact, order-free) and each weight update is scalar
    * double arithmetic in the same pinned order as the Scala trainer.
    */
  private def qualityClassifierOracle(buckets: Int, iters: Int,
                                      lr: String): String = {
    val featCols = (0 until buckets).map(b =>
      s"sum(CASE WHEN bucket=$b THEN 1 ELSE 0 END) AS f$b").mkString(", ")
    def marginExpr(p: String): String =
      (0 until buckets).foldLeft(s"$p.wb") { (acc, j) =>
        s"($acc + f$j*$p.w$j)"
      }
    val w0 = ((0 until buckets).map(j => s"0.0 AS w$j") :+ "0.0 AS wb")
      .mkString(", ")
    val layers = (1 to iters).flatMap { i =>
      val e = s"(1.0/(1.0 + exp(0.0 - ${marginExpr("p")})) - y)"
      val gCols = ((0 until buckets).map(j =>
        s"sum(CAST(floor((1e6 * $e) * f$j) AS BIGINT)) AS g$j") :+
        s"sum(CAST(floor(1e6 * $e) AS BIGINT)) AS gb").mkString(", ")
      val wCols = ((0 until buckets).map(j =>
        s"p.w$j - $lr*((g.g$j/1e6)/nn.n) AS w$j") :+
        s"p.wb - $lr*((g.gb/1e6)/nn.n) AS wb").mkString(", ")
      Seq(
        s"g$i AS MATERIALIZED (SELECT $gCols FROM feat, w${i - 1} p)",
        s"w$i AS MATERIALIZED (SELECT $wCols FROM w${i - 1} p, g$i g, nn)")
    }
    val out = ((0 until buckets).map(j =>
      s"SELECT CAST($j AS BIGINT) AS j, CAST(floor(w$j*1e6) AS BIGINT) AS w_micro FROM w$iters") :+
      s"SELECT CAST($buckets AS BIGINT), CAST(floor(wb*1e6) AS BIGINT) FROM w$iters")
      .mkString(" UNION ALL ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
       |  FROM documents),
       | b AS (SELECT doc_id,
       |   CAST(list_sum([(strpos('0123456789abcdef',
       |       substr(md5(tok), i, 1))-1)::BIGINT << (4*(6-i))
       |       for i in range(1, 7)]) % $buckets AS BIGINT) AS bucket
       |  FROM tok),
       | cnt AS (SELECT doc_id, $featCols FROM b GROUP BY doc_id),
       | feat AS (SELECT d.doc_id,
       |   CASE WHEN d.lang='en' THEN 1.0 ELSE 0.0 END AS y, cnt.*
       |  FROM documents d JOIN cnt USING (doc_id)),
       | nn AS (SELECT count(*) AS n FROM feat),
       | w0 AS (SELECT $w0),
       |${layers.mkString(",\n")}
       |$out""".stripMargin
  }

  /** The shared training ladder (word table → s0 → p_i/m_i/s_i CTEs);
    * `bpeOracle` selects the merge winners, `bpeEncodeOracle` applies
    * them to the documents.
    */
  private def bpeLadder(nMerges: Int): String = {
    def pairCtes(src: String, p: String, m: String) =
      s"""$p AS MATERIALIZED (
         | SELECT w1, w2, CAST(sum(freq) AS BIGINT) AS n FROM (
         |  SELECT freq,
         |   unnest([tk[i] for i in range(1, len(tk))]) AS w1,
         |   unnest([tk[i+1] for i in range(1, len(tk))]) AS w2
         |  FROM (SELECT freq, string_split(trim(syms),' ') AS tk FROM $src))
         | GROUP BY w1, w2),
         |$m AS MATERIALIZED (SELECT w1, w2, n FROM $p ORDER BY n DESC, w1, w2 LIMIT 1)""".stripMargin
    def mergeCte(src: String, m: String, s: String) =
      s"""$s AS MATERIALIZED (SELECT word, freq,
         | replace(syms, ' '||(SELECT w1 FROM $m)||' '||(SELECT w2 FROM $m)||' ',
         |               ' '||(SELECT w1 FROM $m)||(SELECT w2 FROM $m)||' ') AS syms
         | FROM $src)""".stripMargin
    val base =
      """w AS (
        | SELECT term AS word, count(*) AS freq
        | FROM (SELECT unnest(string_split(text,' ')) AS term FROM documents)
        | GROUP BY term),
        |s0 AS MATERIALIZED (SELECT word, freq,
        | ' ' || array_to_string(string_split(word,''),' ') || ' ' AS syms
        | FROM w)""".stripMargin
    val layers = (1 to nMerges).flatMap { i =>
      Seq(pairCtes(s"s${i - 1}", s"p$i", s"m$i")) ++
        (if (i < nMerges) Seq(mergeCte(s"s${i - 1}", s"m$i", s"s$i")) else Nil)
    }
    (base +: layers).mkString(",\n")
  }

  private def bpeOracle(nMerges: Int): String = {
    val sel = (1 to nMerges)
      .map(i => s"SELECT $i AS step, w1, w2, w1||w2 AS merged, n FROM m$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeLadder(nMerges)}\n$sel ORDER BY step"
  }

  /** Tokenizer application: the same merge winners applied to each
    * document as chained `replace` over per-word space-sentineled char
    * strings (words joined directly — the doubled boundary space blocks
    * cross-word merges), exactly the native expression's contract.
    */
  private def bpeEncodeOracle(nMerges: Int): String = {
    val d0 =
      """d0 AS (SELECT doc_id,
        | array_to_string(list_transform(string_split(text,' '),
        |   w -> ' ' || array_to_string(string_split(w,''),' ') || ' '), '')
        |   AS syms
        | FROM documents)""".stripMargin
    val dLayers = (1 to nMerges).map { i =>
      s"""d$i AS MATERIALIZED (SELECT doc_id,
         | replace(syms,
         |  ' '||(SELECT w1 FROM m$i)||' '||(SELECT w2 FROM m$i)||' ',
         |  ' '||(SELECT w1 FROM m$i)||(SELECT w2 FROM m$i)||' ') AS syms
         | FROM d${i - 1})""".stripMargin
    }
    s"""WITH ${bpeLadder(nMerges)},
       |$d0,
       |${dLayers.mkString(",\n")}
       |SELECT doc_id,
       | CAST(len(list_filter(string_split(syms,' '), x -> x <> ''))
       |   AS BIGINT) AS n_bpe_tokens,
       | md5(array_to_string(list_filter(string_split(syms,' '),
       |   x -> x <> ''), ' ')) AS tok_hash
       |FROM d$nMerges""".stripMargin
  }

  /** Fertility = the bpeEncodeOracle ladder carried per (doc, lang,
    * word-count, byte-count) and aggregated per language: sums are exact
    * BIGINTs, each ratio one floor-quantized double division.
    */
  private def tokenFertilityOracle(nMerges: Int): String = {
    val d0 =
      """d0 AS (SELECT doc_id, lang,
        | len(string_split(text,' '))::BIGINT AS n_words,
        | strlen(text)::BIGINT AS n_bytes,
        | array_to_string(list_transform(string_split(text,' '),
        |   w -> ' ' || array_to_string(string_split(w,''),' ') || ' '), '')
        |   AS syms
        | FROM documents)""".stripMargin
    val dLayers = (1 to nMerges).map { i =>
      s"""d$i AS MATERIALIZED (SELECT doc_id, lang, n_words, n_bytes,
         | replace(syms,
         |  ' '||(SELECT w1 FROM m$i)||' '||(SELECT w2 FROM m$i)||' ',
         |  ' '||(SELECT w1 FROM m$i)||(SELECT w2 FROM m$i)||' ') AS syms
         | FROM d${i - 1})""".stripMargin
    }
    s"""WITH ${bpeLadder(nMerges)},
       |$d0,
       |${dLayers.mkString(",\n")},
       |agg AS (SELECT lang, CAST(sum(n_words) AS BIGINT) AS words,
       |  CAST(sum(n_bytes) AS BIGINT) AS bytes,
       |  CAST(sum(len(list_filter(string_split(syms,' '), x -> x <> '')))
       |    AS BIGINT) AS bpe_tokens
       | FROM d$nMerges GROUP BY lang)
       |SELECT lang, words, bytes, bpe_tokens,
       | floor(bpe_tokens::DOUBLE / words::DOUBLE * 10000) / 10000.0
       |   AS fertility,
       | floor(bytes::DOUBLE / bpe_tokens::DOUBLE * 10000) / 10000.0
       |   AS bytes_per_token
       |FROM agg""".stripMargin
  }

  /** PQ encode + ADC search replayed from the codebook literals: per
    * subspace, L2 distances of the normalized subvector slice to the 16
    * centroid literals → first argmin is the code; reconstruction
    * concatenates the coded centroids; scoring/ranking mirror
    * annIvfOracle's cosine conventions.
    */
  private def pqTopkOracle: String = {
    val m = 8; val dsub = 8; val topK = 5
    val cbs = graft.analytics.Pq.pretrainedCodebooks(m, ksub = 16, dsub)
    val distCols = (0 until m).map { s =>
      val dists = cbs(s).map { c =>
        val lit = c.mkString("[", ",", "]")
        s"list_sum(list_transform(list_zip(ne[${s * dsub + 1}:${(s + 1) * dsub}], $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
      }.mkString("[", ", ", "]")
      s"list_indexof($dists, list_min($dists)) - 1 AS c$s"
    }.mkString(",\n   ")
    val recon = (0 until m).map { s =>
      val cbLit = cbs(s).map(_.mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"($cbLit::DOUBLE[][])[c$s + 1]"
    }.mkString(" || ")
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |   list_transform(embedding::DOUBLE[], x ->
       |     x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS ne
       |  FROM embeddings),
       | enc AS (SELECT vec_id, emb,
       |   $distCols
       |  FROM n),
       | rec AS (SELECT vec_id, $recon AS recon FROM enc),
       | q AS (SELECT vec_id AS query_id, emb AS qe FROM n
       |  WHERE vec_id % 100 = 0),
       | sc AS (SELECT query_id, vec_id AS neighbor_id,
       |   floor(list_cosine_similarity(qe, recon) * 1000000) / 1000000.0 AS sim_pq
       |  FROM rec, q WHERE vec_id <> query_id)
       |SELECT query_id,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY sim_pq DESC, neighbor_id) AS INT) AS rk,
       | neighbor_id, sim_pq
       |FROM sc QUALIFY rk <= $topK""".stripMargin
  }

  /** Sign-bit signature + hamming top-k replayed in SQL. The signature
    * is an XOR fold of distinct powers of two (bit 63 spelled as the
    * Long.MinValue literal — DuckDB raises on `1::BIGINT << 63` where
    * Spark's shiftleft wraps); everything downstream is integer, so
    * parity is exact with no quantization convention at all.
    */
  private def annHammingOracle: String = {
    val dims = 64; val topK = 5
    // NULL contract mirrors Similarity.signBits: a NULL or missing
    // element in the first `dims` positions nulls the signature and the
    // vector drops out of both sides (bit_xor would silently SKIP a
    // NULL term, setting the bit — the r5 ADVICE parity gap)
    s"""WITH s0 AS (SELECT vec_id, CASE
       |  WHEN len(list_filter(embedding[1:$dims], x -> x IS NOT NULL))
       |       < $dims THEN NULL
       |  ELSE list_aggregate(
       |  [CASE WHEN embedding[i+1] < 0 THEN 0::BIGINT
       |        WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |        ELSE CAST(1 AS BIGINT) << i END
       |   for i in range(0, $dims)], 'bit_xor') END AS sig
       |  FROM embeddings),
       | s AS (SELECT vec_id, sig FROM s0 WHERE sig IS NOT NULL),
       | q AS (SELECT vec_id AS query_id, sig AS qsig FROM s
       |  WHERE vec_id % 100 = 0),
       | sc AS (SELECT query_id, vec_id AS neighbor_id,
       |   bit_count(xor(sig, qsig)) AS hamming
       |  FROM s, q WHERE vec_id <> query_id)
       |SELECT query_id,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY hamming, neighbor_id) AS INT) AS rk,
       | neighbor_id, hamming
       |FROM sc QUALIFY rk <= $topK""".stripMargin
  }

  /** IVF-PQ replayed in SQL: annIvfOracle's cell assignment + nprobe
    * probe list composed with pqTopkOracle's encode/reconstruct/ADC
    * scoring — candidates come from the probed-cell equi-join instead of
    * the cross join, everything else (normalization, argmin tie order,
    * floor-quantized cosine, rank) is shared convention.
    */
  private def ivfPqTopkOracle: String = {
    val k = 16; val dims = 64; val nprobe = 4; val topK = 5
    val m = 8; val dsub = 8
    val cents = graft.analytics.Ivf.pretrainedCentroids(k, dims)
    val cbs = graft.analytics.Pq.pretrainedCodebooks(m, ksub = 16, dsub)
    val distList = cents.map { c =>
      val lit = c.mkString("[", ",", "]")
      s"list_sum(list_transform(list_zip(ne, $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
    }.mkString("[", ", ", "]")
    val distCols = (0 until m).map { s =>
      val dists = cbs(s).map { c =>
        val lit = c.mkString("[", ",", "]")
        s"list_sum(list_transform(list_zip(ne[${s * dsub + 1}:${(s + 1) * dsub}], $lit::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])))"
      }.mkString("[", ", ", "]")
      s"list_indexof($dists, list_min($dists)) - 1 AS c$s"
    }.mkString(",\n   ")
    val recon = (0 until m).map { s =>
      val cbLit = cbs(s).map(_.mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"($cbLit::DOUBLE[][])[c$s + 1]"
    }.mkString(" || ")
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |   list_transform(embedding::DOUBLE[], x ->
       |     x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS ne
       |  FROM embeddings),
       | d AS (SELECT vec_id, emb, ne, $distList AS dists FROM n),
       | enc AS (SELECT vec_id AS neighbor_id,
       |   list_indexof(dists, list_min(dists)) - 1 AS cell,
       |   $distCols
       |  FROM d),
       | rec AS (SELECT neighbor_id, cell, $recon AS recon FROM enc),
       | probes AS (SELECT vec_id AS query_id, emb AS qe,
       |   unnest(list_transform(list_sort(list_zip(dists, range(0, $k))),
       |     p -> p[2])[1:$nprobe]) AS cell
       |  FROM d WHERE vec_id % 100 = 0),
       | sc AS (SELECT query_id, neighbor_id,
       |   floor(list_cosine_similarity(qe, recon) * 1000000) / 1000000.0 AS sim_pq
       |  FROM rec JOIN probes USING (cell) WHERE query_id <> neighbor_id)
       |SELECT query_id,
       | CAST(row_number() OVER (PARTITION BY query_id
       |   ORDER BY sim_pq DESC, neighbor_id) AS INT) AS rk,
       | neighbor_id, sim_pq
       |FROM sc QUALIFY rk <= $topK""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "a_text_stats" ->
      s"""SELECT doc_id,
         | len(string_split(text,' ')) AS n_tokens,
         | floor((length(text) - len(string_split(text,' ')) + 1)::DOUBLE
         |   / len(string_split(text,' ')) * 10000) / 10000.0 AS avg_token_len,
         | len(list_filter(string_split(text,' '), w -> w IN $enIn)) AS stop_hits_en,
         | CAST(list_sum(list_transform(string_split(text,' '),
         |   w -> 1 + CAST(floor(length(w)/5.0) AS BIGINT))) AS BIGINT) AS bpe_ish_tokens
         |FROM documents""".stripMargin,

    "a_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS bucket,
        |  list_distinct(list_transform(range(1, greatest(length(text)-2, 1)+1),
        |    i -> substring(text, i::INT, 3))) AS gs
        | FROM documents)
        |SELECT * FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor(len(list_intersect(a.gs, b.gs))*1.0
        |    / len(list_distinct(list_concat(a.gs, b.gs))) * 10000) / 10000.0 AS jaccard
        | FROM t a JOIN t b ON a.bucket = b.bucket AND a.doc_id < b.doc_id) p
        |WHERE jaccard >= 0.8""".stripMargin,

    "a_lang_id" ->
      """WITH sc AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), w -> w IN ('the','a','and','of','to'))) AS en,
        |  len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS de,
        |  len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les','des'))) AS fr,
        |  len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','una','por'))) AS es
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN en>0 AND en>=de AND en>=fr AND en>=es THEN 'en'
        |      WHEN de>0 AND de>=fr AND de>=es THEN 'de'
        |      WHEN fr>0 AND fr>=es THEN 'fr'
        |      WHEN es>0 THEN 'es' ELSE 'unknown' END AS lang_pred
        |FROM sc""".stripMargin,

    "a_quality_score" ->
      s"""WITH b AS (SELECT doc_id,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents)
         |SELECT doc_id, floor((
         |  least(nt/50.0, 1.0)*0.4
         |  + least((sh/nt)*5.0, 1.0)*0.3
         |  + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3) * 10000) / 10000.0 AS quality
         |FROM b""".stripMargin,

    "a_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        | md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS prefix_fp
        |FROM documents""".stripMargin,

    "a_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "a_jaccard_pairs" ->
      """WITH s AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents)
        |SELECT id_a, id_b, jaccard FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(list_distinct(list_concat(a.toks, b.toks))) * 10000) / 10000.0 AS jaccard
        | FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id) p
        |WHERE jaccard >= 0.9""".stripMargin,

    "a_source_caps" ->
      s"""WITH b AS (SELECT doc_id, source,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents),
         | q AS (SELECT doc_id, source, floor((
         |  least(nt/50.0, 1.0)*0.4
         |  + least((sh/nt)*5.0, 1.0)*0.3
         |  + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3) * 10000) / 10000.0 AS quality
         | FROM b)
         |SELECT doc_id, source, quality,
         | CAST(row_number() OVER (PARTITION BY source
         |   ORDER BY quality DESC, doc_id) AS INT) AS src_rank
         |FROM q QUALIFY src_rank <= 10""".stripMargin,

    "a_containment_pairs" ->
      """WITH s AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents)
        |SELECT id_a, id_b, containment_a, containment_b FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(a.toks) * 10000) / 10000.0 AS containment_a,
        |  floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(b.toks) * 10000) / 10000.0 AS containment_b
        | FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id) p
        |WHERE greatest(containment_a, containment_b) >= 0.9""".stripMargin,

    "a_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(
        |   [array_to_string(tk[i:i+4],' ')
        |    for i in range(1, greatest(len(tk)-4, 1)+1)])) AS sh FROM tk),
        | bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id%11=0)
        |SELECT s.doc_id, count(*) AS contaminated_shingles
        |FROM sh s JOIN bench USING (sh) WHERE s.doc_id%11<>0
        |GROUP BY s.doc_id""".stripMargin,

    "a_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | g AS (SELECT doc_id, tk,
        |   [array_to_string(tk[i:i+1],' ')
        |    for i in range(1, greatest(len(tk)-1, 1)+1)] AS g2 FROM t)
        |SELECT doc_id,
        | floor((1.0 - len(list_distinct(tk))*1.0/len(tk)) * 10000)/10000.0
        |   AS dup_token_frac,
        | floor((list_max(list_transform(list_distinct(tk),
        |     w -> len(list_filter(tk, x -> x = w))))*1.0/len(tk)) * 10000)/10000.0
        |   AS top_token_frac,
        | floor((1.0 - len(list_distinct(g2))*1.0/len(g2)) * 10000)/10000.0
        |   AS dup_2gram_frac
        |FROM g""".stripMargin,

    "a_sequence_pack" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |  len(string_split(text,' '))::BIGINT AS n_tokens FROM documents),
        | c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
        |SELECT doc_id, shard, n_tokens,
        | CAST(floor((cum - n_tokens)/2048) AS BIGINT) AS pack_id,
        | (cum - n_tokens) % 2048 AS pack_offset
        |FROM c""".stripMargin,

    "a_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 100 AS bucket
        | FROM documents)
        |SELECT doc_id, lang, bucket FROM h
        |WHERE bucket < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40
        |  WHEN 'fr' THEN 40 WHEN 'es' THEN 20 WHEN 'zh' THEN 20
        |  ELSE -1 END""".stripMargin,

    "a_train_split" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 100 AS bucket
        | FROM documents)
        |SELECT CASE WHEN bucket < 5 THEN 'valid' WHEN bucket < 10 THEN 'test'
        |  ELSE 'train' END AS split, count(*) AS n_docs
        |FROM h GROUP BY 1""".stripMargin,

    "a_embed_norms" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        | floor(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) * 1000000) / 1000000.0 AS norm
        |FROM embeddings""".stripMargin,

    "a_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id%100 = 0),
        | sc AS (SELECT qid, vec_id AS neighbor_id,
        |   floor(list_cosine_similarity(embedding::DOUBLE[], qe) * 1000000) / 1000000.0 AS sim
        |  FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid AS query_id,
        | CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk,
        | neighbor_id, sim
        |FROM sc
        |QUALIFY rk <= 5""".stripMargin,

    "a_matryoshka_topk" ->
      """WITH q AS (SELECT vec_id AS qid, (embedding::DOUBLE[])[1:32] AS qe
        |  FROM embeddings WHERE vec_id%100 = 0),
        | sc AS (SELECT qid, vec_id AS neighbor_id,
        |   floor(list_cosine_similarity((embedding::DOUBLE[])[1:32], qe) * 1000000) / 1000000.0 AS sim
        |  FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid AS query_id,
        | CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk,
        | neighbor_id, sim
        |FROM sc
        |QUALIFY rk <= 5""".stripMargin,

    "a_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id%100 = 0),
        | sc AS (SELECT qid, vec_id AS neighbor_id,
        |   floor(list_cosine_similarity(embedding::DOUBLE[], qe) * 1000000) / 1000000.0 AS sim
        |  FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid AS query_id,
        | CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk,
        | neighbor_id, sim
        |FROM sc WHERE sim >= 0.1 AND sim < 0.5
        |QUALIFY rk <= 5""".stripMargin,

    "a_cosine_pairs" ->
      """WITH b AS (SELECT CAST(floor(vec_id/50) AS BIGINT) AS bucket, vec_id,
        |  embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT id_a, id_b, sim FROM (
        | SELECT a.vec_id AS id_a, c.vec_id AS id_b,
        |  floor(list_cosine_similarity(a.e, c.e) * 1000000) / 1000000.0 AS sim
        | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) p
        |WHERE sim >= 0.3""".stripMargin,

    // Components via transitive closure: `reach` enumerates every node
    // reachable from each node (bounded by the tiny cluster sizes);
    // cluster = min reachable id. Same pair derivation as a_jaccard_pairs.
    "a_dedup_clusters" ->
      """WITH RECURSIVE s AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents),
        | pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id
        |  WHERE floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(list_distinct(list_concat(a.toks, b.toks))) * 10000) / 10000.0 >= 0.9),
        | e AS (SELECT id_a AS src, id_b AS dst FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr),
        | reach(id, r) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
        |SELECT d.doc_id,
        | coalesce(min(reach.r), d.doc_id) AS cluster_id,
        | CAST(d.doc_id = coalesce(min(reach.r), d.doc_id) AS INTEGER) AS is_canonical
        |FROM documents d LEFT JOIN reach ON reach.id = d.doc_id
        |GROUP BY d.doc_id""".stripMargin,

    // clusters replayed as in a_dedup_clusters, quality as in
    // a_quality_score; representative = row_number() = 1 over
    // (quality DESC, doc_id ASC) within the cluster
    "a_dedup_keep_best" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id,
         |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
         |  list_distinct(string_split(text,' ')) AS toks FROM documents),
         | pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id
         |  WHERE floor(len(list_intersect(a.toks, b.toks))::DOUBLE
         |    / len(list_distinct(list_concat(a.toks, b.toks))) * 10000) / 10000.0 >= 0.9),
         | e AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         | reach(id, r) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
         | cl AS (SELECT d.doc_id,
         |  coalesce(min(reach.r), d.doc_id) AS cluster_id
         | FROM documents d LEFT JOIN reach ON reach.id = d.doc_id
         | GROUP BY d.doc_id),
         | qb AS (SELECT doc_id,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents),
         | q AS (SELECT doc_id, floor((
         |  least(nt/50.0, 1.0)*0.4
         |  + least((sh/nt)*5.0, 1.0)*0.3
         |  + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3) * 10000) / 10000.0 AS quality
         | FROM qb)
         |SELECT cl.doc_id, cl.cluster_id, q.quality,
         | CAST(row_number() OVER (PARTITION BY cl.cluster_id
         |   ORDER BY q.quality DESC, cl.doc_id ASC) = 1 AS INTEGER) AS kept
         |FROM cl JOIN q USING (doc_id)""".stripMargin,

    "a_leakfree_split" ->
      """WITH RECURSIVE s AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents),
        | pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id
        |  WHERE floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(list_distinct(list_concat(a.toks, b.toks))) * 10000) / 10000.0 >= 0.9),
        | e AS (SELECT id_a AS src, id_b AS dst FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr),
        | reach(id, r) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        | cl AS (SELECT d.doc_id,
        |  coalesce(min(reach.r), d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN reach ON reach.id = d.doc_id
        | GROUP BY d.doc_id),
        | h AS (SELECT doc_id, cluster_id,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(cluster_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 100 AS bucket
        | FROM cl)
        |SELECT CASE WHEN bucket < 5 THEN 'valid' WHEN bucket < 10 THEN 'test'
        |  ELSE 'train' END AS split, count(*) AS n_docs,
        | count(DISTINCT cluster_id) AS n_clusters
        |FROM h GROUP BY 1""".stripMargin,

    "a_budget_select" ->
      s"""WITH qb AS (SELECT doc_id, source,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents),
         | d AS (SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens,
         |  CAST(floor(floor((
         |    least(nt/50.0, 1.0)*0.4
         |    + least((sh/nt)*5.0, 1.0)*0.3
         |    + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3
         |    ) * 10000) / 10000.0 / CAST(nt AS BIGINT) * 1000000) AS BIGINT) AS qd
         | FROM qb),
         | h AS (SELECT qd, sum(n_tokens) AS bt FROM d GROUP BY qd),
         | c AS (SELECT qd, bt, coalesce(sum(bt) OVER (ORDER BY qd DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_bt
         |  FROM h),
         | fullb AS (SELECT qd FROM c WHERE before_bt + bt <= 12000),
         | bound AS (SELECT qd, 12000 - before_bt AS slack FROM c
         |  WHERE before_bt <= 12000 AND before_bt + bt > 12000),
         | bsel AS (SELECT doc_id, source, n_tokens, qd FROM (
         |   SELECT d.doc_id, d.source, d.n_tokens, d.qd, bound.slack,
         |    sum(d.n_tokens) OVER (PARTITION BY d.qd ORDER BY d.doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |   FROM d JOIN bound USING (qd)) x WHERE cum <= slack),
         | sel AS (SELECT d.doc_id, d.source, d.n_tokens, d.qd
         |   FROM d JOIN fullb USING (qd)
         |  UNION ALL SELECT * FROM bsel)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM sel GROUP BY source""".stripMargin,

    "a_minhash_lsh" -> minhashOracle,

    // candidates differ (OPH banding) but the exact-verified output is
    // the same ground truth
    "a_minhash_oph" -> minhashOracle,

    // cross-side restriction + per-training-doc aggregation of the exact
    // all-pairs computation a_minhash_lsh equals
    "a_neardup_decontaminate" ->
      s"""SELECT CASE WHEN id_a%11=0 THEN id_b ELSE id_a END AS doc_id,
         | count(*) AS n_matches, max(jaccard) AS max_jaccard
         |FROM ($minhashOracle) p
         |WHERE (id_a%11=0) <> (id_b%11=0)
         |GROUP BY 1""".stripMargin,

    "a_semantic_dedup" -> semanticDedupOracle,

    "a_vocab_coverage" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |  FROM documents),
        | tf AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
        | top AS (SELECT w FROM (SELECT w,
        |   row_number() OVER (ORDER BY cnt DESC, w) AS rk FROM tf)
        |  WHERE rk <= 10)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN cnt < 200 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS rare_tokens,
        | CAST(sum(CASE WHEN w IN (SELECT w FROM top) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS top_hits
        |FROM tok JOIN tf USING (w) GROUP BY doc_id""".stripMargin,

    "a_pii_redact" ->
      """WITH raw AS (SELECT doc_id, text ||
        |  (CASE WHEN doc_id%7=0
        |     THEN ' contact user'||doc_id||'@example.com' ELSE '' END) ||
        |  (CASE WHEN doc_id%13=0
        |     THEN ' call +1 555 0123 4567 or 10.0.0.'||(doc_id%256)
        |     ELSE '' END) AS r
        | FROM documents),
        | red AS (SELECT doc_id, r,
        |  regexp_replace(regexp_replace(regexp_replace(r,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS clean
        | FROM raw)
        |SELECT doc_id, clean, CAST(r <> clean AS INT) AS had_pii
        |FROM red""".stripMargin,

    "a_corpus_stats" ->
      s"""WITH b AS (SELECT lang, source,
         |  len(string_split(text,' ')) AS nt_i,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents),
         | q AS (SELECT lang, source, nt_i,
         |  floor((least(nt/50.0, 1.0)*0.4 + least((sh/nt)*5.0, 1.0)*0.3
         |   + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3)
         |   * 10000) / 10000.0 AS quality FROM b)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(nt_i) AS BIGINT) AS total_tokens,
         | CAST(max(nt_i) AS BIGINT) AS max_tokens,
         | count(DISTINCT source) AS n_sources,
         | CAST(sum(CAST(floor(quality*10000) AS BIGINT)) AS BIGINT)
         |   AS quality_sum_q4
         |FROM q GROUP BY lang""".stripMargin,

    "a_curation_pipeline" ->
      s"""WITH b AS (SELECT doc_id, lang, text,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents),
         | q AS (SELECT doc_id, lang, text FROM b
         |  WHERE floor((least(nt/50.0, 1.0)*0.4 + least((sh/nt)*5.0, 1.0)*0.3
         |   + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3)
         |   * 10000) / 10000.0 >= 0.6),
         | fp AS (SELECT doc_id, lang, text,
         |   md5(array_to_string(string_split(text,' ')[1:8],' ')) AS fp FROM q),
         | ded AS (SELECT doc_id, lang, text FROM (
         |   SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
         |   FROM fp) WHERE rk = 1),
         | samp AS (SELECT doc_id, lang, text FROM ded
         |  WHERE CAST(list_sum([(strpos('0123456789abcdef',
         |      substr(md5(doc_id::VARCHAR), i, 1))-1)::BIGINT
         |      << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 100
         |    < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40
         |      WHEN 'fr' THEN 40 WHEN 'es' THEN 20 WHEN 'zh' THEN 20
         |      ELSE -1 END),
         | tok AS (SELECT doc_id, lang, doc_id % 4 AS shard,
         |   len(string_split(text,' '))::BIGINT AS n_tokens FROM samp),
         | c AS (SELECT doc_id, lang, shard, n_tokens,
         |   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM tok)
         |SELECT doc_id, lang, shard,
         | CAST(floor((cum - n_tokens)/1024) AS BIGINT) AS pack_id,
         | (cum - n_tokens) % 1024 AS pack_offset
         |FROM c""".stripMargin,

    "a_incremental_dedup" ->
      """WITH f AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text,' ')[1:8],' ')) AS fp
        | FROM documents),
        | h AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250)
        |SELECT doc_id, CAST(fp IN (SELECT fp FROM h) AS INT) AS is_dup
        |FROM f WHERE doc_id >= 250""".stripMargin,

    "a_ann_ivf" -> annIvfOracle,
    // index-backed search returns exactly the in-memory IVF results
    "a_ann_ivf_index" -> annIvfOracle,
    // maintained index == whole-corpus index: same search oracle, the
    // stream query set
    "stream_ivf_append" -> annIvfOracle("% 97 = 0"),

    "a_simhash_pairs" -> simhashOracle,

    "a_ann_lsh" -> annLshOracle,

    // 16-token windows; a window text seen in >= 2 distinct docs is
    // boilerplate; survivors string_agg back in window order
    "a_passage_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | w AS (SELECT doc_id,
        |   unnest(range(0, CAST(ceil(len(tk)/16.0) AS BIGINT))) AS widx,
        |   unnest([array_to_string(tk[(i*16+1):(i*16+16)],' ')
        |     for i in range(0, CAST(ceil(len(tk)/16.0) AS BIGINT))]) AS wtext
        |  FROM t),
        | c AS (SELECT wtext, count(DISTINCT doc_id) AS nd FROM w GROUP BY wtext),
        | kept AS (SELECT doc_id, widx, wtext
        |  FROM w JOIN c USING (wtext) WHERE nd < 2),
        | rb AS (SELECT doc_id, string_agg(wtext, ' ' ORDER BY widx) AS clean_text,
        |   count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(rb.clean_text, '') AS clean_text,
        | CAST(ceil(len(t.tk)/16.0) AS BIGINT) AS n_windows,
        | CAST(ceil(len(t.tk)/16.0) AS BIGINT) - coalesce(rb.n_kept, 0) AS n_dropped
        |FROM t LEFT JOIN rb USING (doc_id)""".stripMargin,

    // stride-1 window duplication joins on window TEXT (md5 collision-
    // free at this scale); islands via the same lag/sum gaps pattern
    "a_substring_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | b AS (SELECT doc_id, len(tk) AS n, tk FROM t),
        | w AS (SELECT doc_id,
        |   unnest(range(0, n - 15)) AS o,
        |   unnest([array_to_string(tk[(i+1):(i+16)],' ')
        |     for i in range(0, n - 15)]) AS wtext
        |  FROM b WHERE n >= 16),
        | c AS (SELECT wtext, count(DISTINCT doc_id) AS nd FROM w GROUP BY wtext),
        | d AS (SELECT doc_id, o FROM w JOIN c USING (wtext) WHERE nd >= 2),
        | m AS (SELECT doc_id, o, CASE WHEN o - lag(o) OVER
        |     (PARTITION BY doc_id ORDER BY o) <= 16 THEN 0 ELSE 1 END AS brk
        |  FROM d),
        | g AS (SELECT doc_id, o, sum(brk) OVER
        |     (PARTITION BY doc_id ORDER BY o) AS grp FROM m),
        | isl AS (SELECT doc_id, grp, min(o) AS s, max(o) AS e
        |  FROM g GROUP BY doc_id, grp),
        | cov AS (SELECT doc_id, count(*) AS n_dup_spans,
        |   CAST(sum(e - s + 16) AS BIGINT) AS dup_tokens
        |  FROM isl GROUP BY doc_id),
        | cnt AS (SELECT doc_id, count(*) AS n_dup_windows FROM d GROUP BY doc_id)
        |SELECT b.doc_id, CAST(greatest(n - 15, 0) AS BIGINT) AS n_windows,
        | coalesce(cnt.n_dup_windows, 0) AS n_dup_windows,
        | coalesce(cov.n_dup_spans, 0) AS n_dup_spans,
        | coalesce(cov.dup_tokens, 0) AS dup_tokens
        |FROM b LEFT JOIN cnt USING (doc_id) LEFT JOIN cov USING (doc_id)""".stripMargin,

    // identical add-one bigram model: integer counts, one IEEE division
    // per term, floor-quantize at 1e-9, exact integer sums
    "a_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
        | cu AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
        | v AS (SELECT count(*) AS v FROM cu),
        | bg AS (SELECT doc_id,
        |   unnest([tk[i] for i in range(1, len(tk))]) AS w1,
        |   unnest([tk[i+1] for i in range(1, len(tk))]) AS w2
        |  FROM t),
        | cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        | q AS (SELECT bg.doc_id,
        |   CAST(floor((cb.cb + 1)::DOUBLE / (cu.cu + v.v) * 1e9) AS BIGINT) AS q
        |  FROM bg JOIN cb USING (w1, w2) JOIN cu ON bg.w1 = cu.w, v),
        | agg AS (SELECT doc_id, count(*) AS n_bigrams,
        |   CAST(sum(q) AS BIGINT) AS prob_q9_sum FROM q GROUP BY doc_id)
        |SELECT t.doc_id,
        | coalesce(agg.n_bigrams, 0) AS n_bigrams,
        | coalesce(agg.prob_q9_sum, 0) AS prob_q9_sum,
        | CAST(floor(coalesce(agg.prob_q9_sum, 0)::DOUBLE
        |   / greatest(coalesce(agg.n_bigrams, 0), 1)) AS BIGINT) AS avg_prob_q9
        |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,

    // train counts from even docs, positions from odd docs; each backoff
    // path is one integer-count division times an exact constant
    // (1e9 / 4e8 / 1.6e8), floored before the per-doc sum
    "a_backoff_trigram" ->
      """WITH tr AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents WHERE doc_id % 2 = 0),
        | tg AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents WHERE doc_id % 2 = 1),
        | tok AS (SELECT unnest(tk) AS w FROM tr),
        | cu AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
        | total AS (SELECT count(*) AS n_tokens FROM tok),
        | bg AS (SELECT unnest([tk[i] for i in range(1, len(tk))]) AS w1,
        |        unnest([tk[i+1] for i in range(1, len(tk))]) AS w2 FROM tr),
        | cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        | tgm AS (SELECT unnest([tk[i] for i in range(1, len(tk)-1)]) AS w1,
        |         unnest([tk[i+1] for i in range(1, len(tk)-1)]) AS w2,
        |         unnest([tk[i+2] for i in range(1, len(tk)-1)]) AS w3 FROM tr),
        | ct AS (SELECT w1, w2, w3, count(*) AS ct FROM tgm GROUP BY w1, w2, w3),
        | pos AS (SELECT doc_id,
        |         unnest([tk[i] for i in range(1, len(tk)-1)]) AS w1,
        |         unnest([tk[i+1] for i in range(1, len(tk)-1)]) AS w2,
        |         unnest([tk[i+2] for i in range(1, len(tk)-1)]) AS w3 FROM tg),
        | sc AS (SELECT pos.doc_id,
        |   CASE WHEN ct.ct IS NOT NULL THEN CAST(floor(ct.ct::DOUBLE / cb1.cb * 1e9) AS BIGINT)
        |        WHEN cb2.cb IS NOT NULL THEN CAST(floor(cb2.cb::DOUBLE / cu2.cu * 4e8) AS BIGINT)
        |        WHEN cu3.cu IS NOT NULL THEN CAST(floor(cu3.cu::DOUBLE / total.n_tokens * 1.6e8) AS BIGINT)
        |        ELSE 0 END AS s_q9,
        |   CASE WHEN ct.ct IS NOT NULL THEN 0 WHEN cb2.cb IS NOT NULL THEN 1
        |        WHEN cu3.cu IS NOT NULL THEN 2 ELSE 3 END AS depth
        |  FROM pos
        |  LEFT JOIN ct ON pos.w1=ct.w1 AND pos.w2=ct.w2 AND pos.w3=ct.w3
        |  LEFT JOIN cb cb1 ON pos.w1=cb1.w1 AND pos.w2=cb1.w2
        |  LEFT JOIN cb cb2 ON pos.w2=cb2.w1 AND pos.w3=cb2.w2
        |  LEFT JOIN cu cu2 ON pos.w2=cu2.w
        |  LEFT JOIN cu cu3 ON pos.w3=cu3.w, total),
        | agg AS (SELECT doc_id, count(*) AS n_scored,
        |         CAST(sum(s_q9) AS BIGINT) AS backoff_q9_sum,
        |         CAST(sum(depth) AS BIGINT) AS backoff_depth_sum FROM sc GROUP BY doc_id)
        |SELECT tg.doc_id, coalesce(agg.n_scored, 0) AS n_scored,
        | coalesce(agg.backoff_q9_sum, 0) AS backoff_q9_sum,
        | coalesce(agg.backoff_depth_sum, 0) AS backoff_depth_sum
        |FROM tg LEFT JOIN agg USING (doc_id)""".stripMargin,

    // capacity > per-language vocabulary => the MG summary is exact and
    // the oracle is the exact per-language term ranking
    "a_heavy_hitters" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
        | c AS (SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term),
        | r AS (SELECT lang, term, n,
        |   CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS INT) AS rk
        |  FROM c)
        |SELECT lang, rk, term, n FROM r WHERE rk <= 5""".stripMargin,

    // cut points = 32-bit md5 prefixes of seeded ids mod (len-1), + 1
    "a_fim_transform" ->
      """WITH h AS (SELECT doc_id, text, length(text) AS len,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5('fim-a:'||doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(8-i)) for i in range(1, 9)]) AS BIGINT) AS ha,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5('fim-b:'||doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(8-i)) for i in range(1, 9)]) AS BIGINT) AS hb,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5('fim-m:'||doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(8-i)) for i in range(1, 9)]) AS BIGINT) AS hm
        | FROM documents),
        | c AS (SELECT doc_id, text, len, hm,
        |   least(ha % greatest(len-1, 1) + 1, hb % greatest(len-1, 1) + 1) AS c1,
        |   greatest(ha % greatest(len-1, 1) + 1, hb % greatest(len-1, 1) + 1) AS c2
        |  FROM h)
        |SELECT doc_id,
        | CASE WHEN len IS NULL OR len < 3 THEN 'raw'
        |      WHEN hm % 2 = 0 THEN 'spm' ELSE 'psm' END AS mode,
        | CASE WHEN len IS NULL OR len < 3 THEN text
        |      WHEN hm % 2 = 0 THEN
        |        '<SUF>' || substr(text, c2+1, len-c2) || '<PRE>' ||
        |        substr(text, 1, c1) || '<MID>' || substr(text, c1+1, c2-c1)
        |      ELSE
        |        '<PRE>' || substr(text, 1, c1) || '<SUF>' ||
        |        substr(text, c2+1, len-c2) || '<MID>' || substr(text, c1+1, c2-c1)
        | END AS fim
        |FROM c""".stripMargin,

    "a_corpus_shards" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 16 AS shard,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(md5(doc_id::VARCHAR), i, 1))-1)::BIGINT
        |      << (4*(8-i)) for i in range(1, 9)]) AS BIGINT) AS ck
        | FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | CAST(sum(ck) AS BIGINT) AS id_checksum
        |FROM d GROUP BY 1""".stripMargin,

    // CMS cells recomputed: bucket = 32-bit md5 hex prefix of
    // 'row:term' mod width, via the strpos nibble trick
    "a_countmin_sketch" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS term FROM documents),
        | cells AS (SELECT i AS row,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(CAST(i AS VARCHAR)||':'||term), j, 1))-1)::BIGINT
        |       << (4*(8-j)) for j in range(1, 9)]) AS BIGINT) % 1024 AS bucket
        |  FROM tok CROSS JOIN (VALUES (0),(1),(2),(3)) t(i))
        |SELECT row, bucket, count(*) AS n FROM cells GROUP BY 1, 2""".stripMargin,

    "a_countmin_estimate" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS term FROM documents),
        | cells AS (SELECT i AS row,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(CAST(i AS VARCHAR)||':'||term), j, 1))-1)::BIGINT
        |       << (4*(8-j)) for j in range(1, 9)]) AS BIGINT) % 1024 AS bucket
        |  FROM tok CROSS JOIN (VALUES (0),(1),(2),(3)) t(i)),
        | sk AS (SELECT row, bucket, count(*) AS n FROM cells GROUP BY 1, 2),
        | probes AS (SELECT term, i AS row,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(CAST(i AS VARCHAR)||':'||term), j, 1))-1)::BIGINT
        |       << (4*(8-j)) for j in range(1, 9)]) AS BIGINT) % 1024 AS bucket
        |  FROM (VALUES ('spark'),('merge'),('window'),('table'),('row'),
        |        ('key'),('never_seen_term')) p(term)
        |   CROSS JOIN (VALUES (0),(1),(2),(3)) t(i))
        |SELECT probes.term, min(coalesce(sk.n, 0)) AS est
        |FROM probes LEFT JOIN sk
        |  ON sk.row = probes.row AND sk.bucket = probes.bucket
        |GROUP BY 1""".stripMargin,

    // pair construction mirrored: list zipped against itself at shift 1
    // and 2, unordered (least/greatest), self-pairs dropped; each PMI
    // count casts to DOUBLE before multiplying (no int64 product — it
    // would wrap at real corpus scale), floored after a single ln —
    // operation order matches the Scala side exactly
    "a_cooccurrence_pmi" ->
      """WITH t AS (SELECT string_split(text,' ') AS tk FROM documents),
        | pr AS (SELECT unnest(flatten([
        |   [struct_pack(a := least(tk[i], tk[i+1]), b := greatest(tk[i], tk[i+1]))
        |      for i in range(1, len(tk))],
        |   [struct_pack(a := least(tk[i], tk[i+2]), b := greatest(tk[i], tk[i+2]))
        |      for i in range(1, len(tk)-1)]])) AS p FROM t),
        | pc AS (SELECT p.a AS a, p.b AS b, count(*) AS n_ab FROM pr
        |   WHERE p.a <> p.b GROUP BY 1, 2 HAVING count(*) >= 5),
        | uni AS (SELECT unnest(tk) AS term FROM t),
        | uc AS (SELECT term, count(*) AS n_t FROM uni GROUP BY 1),
        | tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS total FROM uc)
        |SELECT a, b, n_ab,
        | floor(ln((n_ab::DOUBLE * total::DOUBLE)
        |           / (ua.n_t::DOUBLE * ub.n_t::DOUBLE)) * 10000)
        |   / 10000.0 AS pmi_q4
        |FROM pc
        | JOIN uc ua ON ua.term = pc.a
        | JOIN uc ub ON ub.term = pc.b
        | CROSS JOIN tot
        |WHERE ua.n_t >= 10 AND ub.n_t >= 10""".stripMargin,

    // HDR bucket math recomputed in integer SQL: e = bitlength-1 via
    // length(bin(x)); s = 4 sub-bucket bits (exact region x < 32)
    "a_hdr_histogram" ->
      """WITH v AS (SELECT lang, CAST(len(string_split(text,' ')) AS BIGINT) AS x FROM documents),
        | b AS (SELECT lang, CASE WHEN x < 32 THEN x
        |   ELSE (length(bin(x))-1-4)*16 + (x >> (length(bin(x))-1-4)) END AS bucket FROM v),
        | h AS (SELECT lang, bucket, count(*) AS n FROM b GROUP BY 1, 2)
        |SELECT lang, bucket,
        | CASE WHEN bucket < 32 THEN bucket
        |  ELSE (bucket - ((bucket//16)-1)*16) << ((bucket//16)-1) END AS lo,
        | CASE WHEN bucket < 32 THEN bucket
        |  ELSE ((bucket - ((bucket//16)-1)*16) << ((bucket//16)-1))
        |       + (1 << ((bucket//16)-1)) - 1 END AS hi,
        | n
        |FROM h""".stripMargin,

    "a_hdr_quantiles" ->
      """WITH v AS (SELECT lang, CAST(len(string_split(text,' ')) AS BIGINT) AS x FROM documents),
        | b AS (SELECT lang, CASE WHEN x < 32 THEN x
        |   ELSE (length(bin(x))-1-4)*16 + (x >> (length(bin(x))-1-4)) END AS bucket FROM v),
        | h AS (SELECT lang, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        | tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total FROM h GROUP BY 1),
        | cum AS (SELECT lang, bucket, sum(n) OVER (PARTITION BY lang ORDER BY bucket) AS cum FROM h),
        | t AS (SELECT lang, qname, (num*total + den - 1) // den AS target
        |   FROM tot CROSS JOIN (VALUES ('p50',1,2),('p90',9,10),('p99',99,100)) AS q(qname,num,den)),
        | pick AS (SELECT t.lang, t.qname, min(cum.bucket) AS bucket
        |   FROM t JOIN cum ON cum.lang = t.lang AND cum.cum >= t.target
        |   GROUP BY 1, 2)
        |SELECT lang, qname,
        | CASE WHEN bucket < 32 THEN bucket
        |  ELSE (bucket - ((bucket//16)-1)*16) << ((bucket//16)-1) END AS est
        |FROM pick""".stripMargin,

    // expression tree mirrored op-for-op from Bm25.topK; every decimal
    // literal cast to DOUBLE (bare decimals are DECIMAL in DuckDB)
    "a_bm25_topk" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM t),
        | corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM lens),
        | tok AS (SELECT doc_id, unnest(tk) AS term FROM t),
        | hit AS (SELECT doc_id, term FROM tok WHERE term IN ('spark','merge','window')),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM hit GROUP BY doc_id, term),
        | dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        | contrib AS (SELECT tf.doc_id,
        |   CAST(floor(
        |     ((2*(c.n_docs - dfx.df) + 1)::DOUBLE / (2*dfx.df + 1))
        |     * (tf.tf * CAST(2.2 AS DOUBLE))
        |     / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |        + CAST(0.75 AS DOUBLE) * ((lens.dl * c.n_docs)::DOUBLE / c.total_tokens)))
        |     * 1e6) AS BIGINT) AS c_q6
        |  FROM tf JOIN dfx USING (term) JOIN lens USING (doc_id), corpus c),
        | perdoc AS (SELECT doc_id, count(*) AS n_terms,
        |            CAST(sum(c_q6) AS BIGINT) AS score_q6 FROM contrib GROUP BY doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY score_q6 DESC, doc_id) AS INT) AS rk,
        | doc_id, n_terms, score_q6
        |FROM perdoc ORDER BY score_q6 DESC, doc_id LIMIT 20""".stripMargin,

    // identical absmax arithmetic: x*127/scale + 0.5 floored, in that
    // operation order (a different order rounds differently)
    "a_embed_quantize" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        | s AS (SELECT vec_id, e,
        |   list_max(list_transform(e, x -> abs(x))) AS scale FROM n),
        | q AS (SELECT vec_id, e, scale,
        |   CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
        |        ELSE list_transform(e, x ->
        |          CAST(floor(x*127/scale + 0.5) AS INT)) END AS qv
        |  FROM s)
        |SELECT vec_id, len(e) AS dim, scale,
        | CAST(list_sum(qv) AS BIGINT) AS q_sum,
        | md5(array_to_string(qv, ',')) AS q_hash
        |FROM q""".stripMargin,

    // same md5-bucket hash, same add-1 smoothing, and the same
    // integer-micro quantization BEFORE the per-doc sum (sum of BIGINTs
    // is order-exact; a float sum would not be)
    "a_dsir_scores" ->
      """WITH toks AS (SELECT doc_id, lang,
        |   unnest(string_split(text,' ')) AS tok FROM documents),
        | b AS (SELECT doc_id, lang,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(tok), i, 1))-1)::BIGINT << (4*(6-i))
        |       for i in range(1, 7)]) % 64 AS BIGINT) AS bucket
        |  FROM toks),
        | cnt AS (SELECT bucket, count(*) AS raw_c,
        |   count(*) FILTER (lang = 'en') AS tgt_c FROM b GROUP BY 1),
        | tot AS (SELECT sum(raw_c) AS n_raw, sum(tgt_c) AS n_tgt FROM cnt),
        | lr AS (SELECT bucket,
        |   CAST(floor(1e6 * (ln(tgt_c + 1.0) - ln(n_tgt + 64.0)
        |     - ln(raw_c + 1.0) + ln(n_raw + 64.0))) AS BIGINT) AS lr_micro
        |  FROM cnt, tot),
        | scored AS (SELECT b.doc_id, sum(lr.lr_micro) AS s
        |  FROM b JOIN lr USING (bucket) GROUP BY 1)
        |SELECT d.doc_id, d.lang,
        | len(string_split(d.text,' '))::BIGINT AS n_tokens,
        | CAST(s.s AS BIGINT) AS score_micro, s.s > 0 AS selected
        |FROM documents d JOIN scored s USING (doc_id)""".stripMargin,

    "a_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | s AS (SELECT doc_id, tk,
        |   unnest(range(0, len(tk), 96)) AS start FROM t)
        |SELECT doc_id,
        | CAST(floor(start/96.0) AS BIGINT) AS chunk_idx, start AS start_tok,
        | CAST(least(128, len(tk) - start) AS BIGINT) AS n_tokens,
        | md5(array_to_string(tk[start+1:start+128], ' ')) AS chunk_md5
        |FROM s""".stripMargin,

    "a_vocab_induction" ->
      """WITH t AS (SELECT string_split(text,' ') AS tk FROM documents),
        | bg AS (SELECT
        |   unnest([tk[i] for i in range(1, len(tk))]) AS w1,
        |   unnest([tk[i+1] for i in range(1, len(tk))]) AS w2
        |  FROM t),
        | c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, w1, w2) AS BIGINT)
        |   AS rk, w1, w2, cnt
        |FROM c QUALIFY rk <= 200""".stripMargin,

    // identical integer-exact mixture arithmetic: one IEEE division per
    // source, floor-quantized fractional threshold, md5 bucket
    "a_mixture_sample" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(string_split(text,' '))::BIGINT AS n_tokens FROM documents),
        | ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s
        |  FROM t GROUP BY source),
        | tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS ttot FROM ps),
        | ws AS (SELECT source,
        |   CASE WHEN CAST(substr(source, 4, 10) AS INT) % 4 = 1
        |        THEN 3 ELSE 1 END AS w FROM ps),
        | wsum AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM ws),
        | r AS (SELECT ps.source,
        |   (ws.w * 2 * tot.ttot)::DOUBLE / (ps.t_s * wsum.wsum) AS rate
        |  FROM ps JOIN ws USING (source), tot, wsum),
        | b AS (SELECT t.doc_id, t.source, t.n_tokens, r.rate,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(t.doc_id::VARCHAR), i, 1))-1)::BIGINT
        |       << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 10000 AS bucket
        |  FROM t JOIN r USING (source))
        |SELECT doc_id, source, n_tokens,
        | CAST(floor(rate) + (CASE WHEN bucket <
        |   floor((rate - floor(rate)) * 10000) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_repeats
        |FROM b""".stripMargin,

    // α = 1/2 smoothing: the per-language weight is floor(sqrt(T_l)·1e6)
    // (IEEE sqrt is correctly rounded by spec, so both engines floor the
    // same bits); the rate is one division of two exact int64 products
    "a_temperature_mixture" ->
      """WITH t AS (SELECT doc_id, lang,
        |  len(string_split(text,' '))::BIGINT AS n_tokens FROM documents),
        | ps AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t_s
        |  FROM t GROUP BY lang),
        | sl AS (SELECT lang, t_s,
        |   CAST(floor(sqrt(t_s::DOUBLE) * 1000000.0) AS BIGINT) AS s_l
        |  FROM ps),
        | tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS ttot FROM sl),
        | ssum AS (SELECT CAST(sum(s_l) AS BIGINT) AS s FROM sl),
        | r AS (SELECT sl.lang,
        |   (sl.s_l::DOUBLE * (2 * tot.ttot)::DOUBLE)
        |     / (ssum.s::DOUBLE * sl.t_s::DOUBLE) AS rate
        |  FROM sl, tot, ssum),
        | b AS (SELECT t.doc_id, t.lang, t.n_tokens, r.rate,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(t.doc_id::VARCHAR), i, 1))-1)::BIGINT
        |       << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 10000 AS bucket
        |  FROM t JOIN r USING (lang))
        |SELECT doc_id, lang, n_tokens,
        | CAST(floor(rate) + (CASE WHEN bucket <
        |   floor((rate - floor(rate)) * 10000) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_repeats
        |FROM b""".stripMargin,

    // the mixture CTEs compose with the pack CTEs: copies unnest from
    // the factor table, the pack window orders by (doc_id, copy)
    "a_mixture_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(string_split(text,' '))::BIGINT AS n_tokens FROM documents),
        | ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s
        |  FROM t GROUP BY source),
        | tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS ttot FROM ps),
        | ws AS (SELECT source,
        |   CASE WHEN CAST(substr(source, 4, 10) AS INT) % 4 = 1
        |        THEN 3 ELSE 1 END AS w FROM ps),
        | wsum AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM ws),
        | r AS (SELECT ps.source,
        |   (ws.w * 2 * tot.ttot)::DOUBLE / (ps.t_s * wsum.wsum) AS rate
        |  FROM ps JOIN ws USING (source), tot, wsum),
        | b AS (SELECT t.doc_id, t.source, t.n_tokens, r.rate,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(md5(t.doc_id::VARCHAR), i, 1))-1)::BIGINT
        |       << (4*(6-i)) for i in range(1, 7)]) AS BIGINT) % 10000 AS bucket
        |  FROM t JOIN r USING (source)),
        | mr AS (SELECT doc_id, source, n_tokens,
        |   CAST(floor(rate) + (CASE WHEN bucket <
        |     floor((rate - floor(rate)) * 10000) THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_repeats FROM b),
        | cp AS (SELECT doc_id, source, n_tokens,
        |   unnest(range(1, n_repeats + 1)) AS copy
        |  FROM mr WHERE n_repeats > 0),
        | c AS (SELECT doc_id, source, copy, doc_id % 8 AS shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY doc_id % 8
        |    ORDER BY doc_id, copy ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM cp)
        |SELECT doc_id, source, copy, shard, n_tokens,
        | CAST(floor((cum - n_tokens)/2048) AS BIGINT) AS pack_id,
        | (cum - n_tokens) % 2048 AS pack_offset
        |FROM c""".stripMargin,

    // same pair derivation as a_jaccard_pairs, rolled up by source pair
    "a_source_overlap" ->
      """WITH s AS (SELECT doc_id, source,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents),
        | pr AS (SELECT a.source AS sa, b.source AS sb,
        |  floor(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / len(list_distinct(list_concat(a.toks, b.toks))) * 10000) / 10000.0 AS jaccard
        | FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id)
        |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
        | count(*) AS n_pairs, max(jaccard) AS max_jaccard
        |FROM pr WHERE jaccard >= 0.9
        |GROUP BY 1, 2""".stripMargin,

    "a_doc_clusters" -> docClustersOracle,

    "a_bpe_merges" -> bpeOracle(6),

    "a_bpe_encode" -> bpeEncodeOracle(6),

    "a_token_fertility" -> tokenFertilityOracle(6),

    "a_quality_classifier" -> qualityClassifierOracle(16, 3, "0.1"),

    "a_corpus_shuffle" ->
      """WITH k AS (SELECT doc_id, md5('42:'||doc_id) AS h FROM documents),
        | s AS (SELECT doc_id, h,
        |   CAST(list_sum([(strpos('0123456789abcdef',
        |       substr(h, i, 1))-1)::BIGINT << (4*(6-i))
        |       for i in range(1, 7)]) % 8 AS BIGINT) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |   AS BIGINT) AS pos
        |FROM s""".stripMargin,

    "a_pq_topk" -> pqTopkOracle,

    "a_ivf_pq_topk" -> ivfPqTopkOracle,

    "a_ann_hamming" -> annHammingOracle,

    // identical integer tf·idf: counts, one exact-quantized reciprocal
    // idf (no libm log at the boundary), integer score, (score, term)
    // deterministic rank
    "a_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  GROUP BY doc_id, term),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | sc AS (SELECT doc_id, term, tf, df,
        |   CAST(floor((n_docs + 1)::DOUBLE / (df + 1) * 1e6) AS BIGINT) AS idf_q6
        |  FROM tf JOIN df USING (term), n),
        | r AS (SELECT doc_id, term, tf, df, tf * idf_q6 AS score,
        |   CAST(row_number() OVER (PARTITION BY doc_id
        |     ORDER BY tf * idf_q6 DESC, term) AS INT) AS rk
        |  FROM sc)
        |SELECT doc_id, rk, term, CAST(tf AS BIGINT) AS tf,
        | CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score
        |FROM r WHERE rk <= 3""".stripMargin,

    // the a_lm_score model verbatim, then per-language ntile(3) on
    // (avg score desc, doc_id) and the head/middle/tail roll-up
    "a_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
        | cu AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
        | v AS (SELECT count(*) AS v FROM cu),
        | bg AS (SELECT doc_id,
        |   unnest([tk[i] for i in range(1, len(tk))]) AS w1,
        |   unnest([tk[i+1] for i in range(1, len(tk))]) AS w2
        |  FROM t),
        | cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        | q AS (SELECT bg.doc_id,
        |   CAST(floor((cb.cb + 1)::DOUBLE / (cu.cu + v.v) * 1e9) AS BIGINT) AS q
        |  FROM bg JOIN cb USING (w1, w2) JOIN cu ON bg.w1 = cu.w, v),
        | agg AS (SELECT doc_id, count(*) AS n_bigrams,
        |   CAST(sum(q) AS BIGINT) AS prob_q9_sum FROM q GROUP BY doc_id),
        | sc AS (SELECT t.doc_id,
        |   CAST(floor(coalesce(agg.prob_q9_sum, 0)::DOUBLE
        |     / greatest(coalesce(agg.n_bigrams, 0), 1)) AS BIGINT) AS avg_q9,
        |   len(tk) AS n_tokens
        |  FROM t LEFT JOIN agg USING (doc_id)),
        | lb AS (SELECT d.lang, sc.avg_q9, sc.n_tokens,
        |   ntile(3) OVER (PARTITION BY d.lang
        |     ORDER BY sc.avg_q9 DESC, sc.doc_id) AS tile
        |  FROM sc JOIN documents d USING (doc_id))
        |SELECT lang,
        | CASE WHEN tile = 1 THEN 'head' WHEN tile = 3 THEN 'tail'
        |      ELSE 'middle' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | min(avg_q9) AS min_q9, max(avg_q9) AS max_q9
        |FROM lb GROUP BY 1, 2""".stripMargin,

    // same LM model; cut scores = the ceil(p·n)-th smallest per
    // language (what approx_percentile at accuracy 1e6 returns exactly
    // while the per-language target rank error stays below one — n up
    // to ~500k), then the map-only tie-collapsing bucket rule
    "a_ccnet_buckets_approx" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        | tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
        | cu AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
        | v AS (SELECT count(*) AS v FROM cu),
        | bg AS (SELECT doc_id,
        |   unnest([tk[i] for i in range(1, len(tk))]) AS w1,
        |   unnest([tk[i+1] for i in range(1, len(tk))]) AS w2
        |  FROM t),
        | cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        | q AS (SELECT bg.doc_id,
        |   CAST(floor((cb.cb + 1)::DOUBLE / (cu.cu + v.v) * 1e9) AS BIGINT) AS q
        |  FROM bg JOIN cb USING (w1, w2) JOIN cu ON bg.w1 = cu.w, v),
        | agg AS (SELECT doc_id, count(*) AS n_bigrams,
        |   CAST(sum(q) AS BIGINT) AS prob_q9_sum FROM q GROUP BY doc_id),
        | sc AS (SELECT t.doc_id,
        |   CAST(floor(coalesce(agg.prob_q9_sum, 0)::DOUBLE
        |     / greatest(coalesce(agg.n_bigrams, 0), 1)) AS BIGINT) AS avg_q9,
        |   len(tk) AS n_tokens
        |  FROM t LEFT JOIN agg USING (doc_id)),
        | lb AS (SELECT d.lang, sc.avg_q9, sc.n_tokens
        |  FROM sc JOIN documents d USING (doc_id)),
        | rk AS (SELECT lang, avg_q9,
        |   row_number() OVER (PARTITION BY lang ORDER BY avg_q9) AS rk,
        |   count(*) OVER (PARTITION BY lang) AS n FROM lb),
        | cuts AS (SELECT lang,
        |   max(CASE WHEN rk = CAST(ceil(n * (1.0/3)) AS BIGINT)
        |       THEN avg_q9 END) AS c1,
        |   max(CASE WHEN rk = CAST(ceil(n * (2.0/3)) AS BIGINT)
        |       THEN avg_q9 END) AS c2
        |  FROM rk GROUP BY lang)
        |SELECT lb.lang,
        | CASE WHEN avg_q9 > c2 THEN 'head'
        |      WHEN avg_q9 > c1 THEN 'middle' ELSE 'tail' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | min(avg_q9) AS min_q9, max(avg_q9) AS max_q9
        |FROM lb JOIN cuts USING (lang) GROUP BY 1, 2""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set(
    "a_text_stats", "a_lang_id", "a_quality_score", "a_fingerprint",
    "a_jaccard_pairs", "a_ngram_jaccard", "a_containment_pairs",
    "a_source_caps", "a_dedup_clusters",
    "a_decontaminate", "a_neardup_decontaminate", "a_incremental_dedup",
    "a_repetition_stats",
    "a_sequence_pack", "a_pii_redact", "a_corpus_stats",
    "a_curation_pipeline", "a_vocab_coverage",
    "a_stratified_sample", "a_train_split",
    "a_embed_norms", "a_ann_topk", "a_hard_negatives", "a_matryoshka_topk",
    "a_cosine_pairs", "a_minhash_lsh", "a_minhash_oph", "a_simhash_pairs",
    "a_ann_lsh",
    "a_ann_ivf", "a_ann_ivf_index", "a_semantic_dedup",
    "a_passage_dedup", "a_substring_dedup", "a_lm_score", "a_source_overlap",
    "a_mixture_sample", "a_mixture_pack", "a_embed_quantize",
    "a_vocab_induction", "a_doc_clusters", "a_tfidf_terms",
    "a_ccnet_buckets", "a_ccnet_buckets_approx", "a_bpe_merges",
    "a_pq_topk", "a_ivf_pq_topk", "a_ann_hamming",
    "a_dsir_scores", "a_doc_chunks", "a_bpe_encode", "a_token_fertility",
    "a_temperature_mixture", "a_dedup_keep_best",
    "a_leakfree_split", "a_budget_select",
    "a_quality_classifier", "a_corpus_shuffle",
    "a_backoff_trigram", "a_bm25_topk", "stream_ivf_append",
    "a_heavy_hitters", "a_hdr_histogram", "a_hdr_quantiles",
    "a_cooccurrence_pmi", "a_countmin_sketch", "a_countmin_estimate",
    "a_corpus_shards", "a_fim_transform")
}
