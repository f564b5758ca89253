package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * scale-path complement to the reference's embedding enrichment
  * (`debezium-ai/debezium-ai-embeddings/.../FieldToEmbedding.java:51-72`).
  *
  * Dot products cast each float to double BEFORE multiplying and fold
  * sequentially (deterministic, engine-comparable). At 100 TB the
  * brute-force form is a broadcast-join of a small query set against the
  * corpus — one scan, no shuffle of the big side; the LSH form buckets the
  * corpus once and joins bucket-to-bucket.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (norm(a) * norm(b))

  /** Floor-quantize to 6 decimals — the repo's cross-engine convention
    * for float comparison boundaries: both engines compute the identical
    * IEEE product/floor/quotient, whereas `round()` half-up on a
    * shortest-representation .xxxxx5 boundary can differ between Spark
    * and DuckDB (NOTES "round-vs-floor"). Every similarity emitted at an
    * oracle boundary goes through this.
    */
  def q6(c: Column): Column = floor(c * 1000000) / 1000000.0

  /** Native-expression cosine (graft.expressions.CosineSimilarity): same
    * double-sequential accumulation as `cosine`, evaluated as a codegen
    * loop — use on hot paths. Registers the function on first use.
    */
  def cosineNative(df: DataFrame)(a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    graft.expressions.GraftFunctions.cosine(a, b)
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * storage/serving compression at corpus scale (4x smaller than
    * float32 before encoding; the dequantized error bound is
    * scale/254). Per-vector absmax scale, `q = floor(x·127/scale + ½)`
    * — every step is a correctly-rounded IEEE op on exact inputs, so
    * the quantized codes reproduce bit-for-bit on any engine. Map-only.
    */
  def quantizeInt8(emb: Column): Column = {
    val scale = array_max(transform(emb, x => abs(x.cast("double"))))
    when(scale === 0.0, transform(emb, _ => lit(0).cast("int")))
      .otherwise(transform(emb,
        x => floor(x.cast("double") * 127 / scale + 0.5).cast("int")))
  }

  /** SemDeDup-style embedding near-dup resolution: IVF cells provide
    * CONTENT-based blocking (vectors land with their geometric
    * neighbours regardless of id order), candidate pairs are the
    * within-cell combinations above `minSim` cosine, and the pair graph
    * resolves to keep/drop clusters via [[Dedup.dedupClusters]]
    * (canonical = min vec_id).
    *
    * 100 TB shape: cell assignment is the native codegen `NearestCell`
    * expression (map-only), the self-join shuffles once on the cell id,
    * and the quadratic term is bounded by cell size — cells are the
    * k-means partition, so growing the corpus grows k, not the
    * per-cell pair count. No all-pairs stage anywhere.
    */
  /** The candidate stage of [[semanticDedup]]: within-cell cosine pairs
    * above `minSim` — exposed separately so callers (and plan guards)
    * can audit the pair computation before cluster resolution.
    *
    * CACHE CONTRACT: the returned frame is LAZY and reads a persisted
    * cell-assignment frame that stays cached until the session evicts
    * it. A long-lived session should consume it the way
    * [[semanticDedup]] does — materialize, then unpersist the returned
    * handle's cache via the composite — or clear the cache between
    * pipeline stages. (The lazy form is deliberate: the plan guards
    * audit the cell computation, which an eager checkpoint would hide.)
    */
  def semanticPairs(corpus: DataFrame, centroids: Seq[Ivf.Centroid],
                    minSim: Double): DataFrame =
    semanticPairsWithCache(corpus, centroids, minSim)._1

  /** [[semanticPairs]] plus the persisted cell frame, so composites can
    * unpersist once the pairs are materialized.
    */
  private def semanticPairsWithCache(
      corpus: DataFrame, centroids: Seq[Ivf.Centroid], minSim: Double)
      : (DataFrame, DataFrame) = {
    // persist the per-vector cell assignment: both legs of the
    // self-join consume it, and without the cache each leg re-runs the
    // assignment loop over the corpus (same rationale as the simhash
    // signature persist). Above twoLevelCellThreshold cells the
    // assignment goes COARSE-FINE (O(√k·d)/row, see
    // Ivf.cellOfTwoLevelNative) — with k following the corpus, the flat
    // scan is otherwise the dominant N^1.5 term
    val assign =
      if (centroids.length >= Ivf.twoLevelCellThreshold)
        Ivf.cellOfTwoLevelNative(corpus)(col("embedding"), centroids)
      else Ivf.cellOfNative(corpus)(col("embedding"), centroids)
    val cells = corpus.select(col("vec_id"), col("embedding"),
      assign.as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = cells.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val r = cells.select(col("cell").as("cell_r"), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    val pairs = l.join(r,
      col("cell") === col("cell_r") && col("id_a") < col("id_b"))
      .withColumn("sim", q6(cosineNative(corpus)(col("ea"), col("eb"))))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
    (pairs, cells)
  }

  def semanticDedup(corpus: DataFrame, centroids: Seq[Ivf.Centroid],
                    minSim: Double): DataFrame = {
    val (pairs0, cells) = semanticPairsWithCache(corpus, centroids, minSim)
    val pairs = pairs0.select(col("id_a"), col("id_b"))
    try {
      // dedupClusters eagerly checkpoints the edge list up front — after
      // it returns, nothing references the cell cache any more
      Dedup.dedupClusters(corpus.select(col("vec_id").as("doc_id")), pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"),
          col("is_canonical").cast("int").as("is_canonical"))
    } finally cells.unpersist()
  }

  /** [[semanticDedup]] with the cell count DERIVED FROM CORPUS SIZE —
    * the default entry point. The r7 10× scale step showed the failure
    * mode of a pinned k: cells are the quadratic bound, so holding k
    * while the corpus grows makes within-cell pairs grow ~N²/k (measured
    * 4.9× for 10× data at k=16). `Ivf.heuristicK` (k ≈ √N) keeps the
    * EXPECTED per-cell population ≈ √N, so pair volume stays ~N·√N/2
    * instead of N²/k. One `count()` job sizes k; the cells themselves
    * are the deterministic pretrained (fixed-seed) centroids — blocking
    * needs a stable space partition, not data-fitted quality; use
    * [[Ivf.fitCentroidsAuto]] + [[semanticDedup]] when fitted cells are
    * worth their training cost (tighter cells → fewer cross-cell missed
    * pairs at the same minSim).
    */
  def semanticDedupAuto(corpus: DataFrame, minSim: Double,
                        dims: Int = 64): DataFrame = {
    val k = Ivf.heuristicK(corpus.count())
    semanticDedup(corpus, Ivf.pretrainedCentroids(k, dims), minSim)
  }

  /** Brute-force cosine top-k: a small query set against the full corpus.
    * The query side is broadcast; the corpus is scanned once; ranking is a
    * per-query window (k small ⇒ tiny state).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", q6(cosineNative(corpus)(col("qe"), col("ce"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }

  /** Semi-hard negative mining for contrastive/embedding training: for
    * each query, the top-k most-similar corpus vectors whose cosine
    * falls in [lo, hi) — similar enough to be informative negatives,
    * capped below the near-duplicate band so positives never leak into
    * the negative set. Same 100 TB shape as [[bruteForceTopK]]: the
    * query side broadcasts, the corpus scans once without shuffling,
    * and the band filter runs BEFORE the per-query ranking window so
    * window state holds only in-band candidates.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    lo: Double, hi: Double): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", q6(cosineNative(corpus)(col("qe"), col("ce"))))
      .filter(col("sim") >= lo && col("sim") < hi)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }

  /** Random-hyperplane LSH bucketing: `nBits` deterministic pseudo-random
    * hyperplanes (component h_{b,d} derived from xxhash64(b,d), zero-mean);
    * the bucket id is the sign pattern. Candidate pairs share a bucket —
    * the scale path: one shuffle on bucket id instead of a cross join.
    */
  /** Deterministic pseudo-random hyperplane components in [-0.5, 0.5),
    * generated driver-side by a fixed LCG (no data dependence, fixed seed).
    * Public so oracles can inline the exact same literals.
    */
  def hyperplane(bit: Int, dims: Int): Seq[Double] = {
    var s = 0x9E3779B97F4A7C15L ^ (bit * 0x5851F42D4C957F2DL)
    Seq.fill(dims) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
  }

  def lshBucket(e: Column, dims: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      // one array literal + one fold per bit (compact expression tree;
      // the naive per-dimension form is dims×nBits nodes and kills codegen)
      val h = typedLit(hyperplane(b, dims))
      val proj = aggregate(
        zip_with(e, h, (x, hc) => x.cast("double") * hc),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN via LSH: exact cosine only within shared buckets.
    *
    * CACHE CONTRACT: same as [[semanticPairs]] — the lazy result reads a
    * persisted bucket frame that outlives this call; long-lived sessions
    * unpersist (or clear the cache) after materializing.
    */
  def annLsh(corpus: DataFrame, dims: Int, nBits: Int, minSim: Double): DataFrame = {
    // persist: both join legs read the bucketed frame, and the nBits ×
    // dims projection is the expensive stage (see semanticPairs)
    val b = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dims, nBits).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = b.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val r = b.select(col("bucket").as("bucket_r"), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    l.join(r, col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
      .withColumn("sim", q6(cosineNative(corpus)(col("ea"), col("eb"))))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"), col("bucket"))
  }

  /** 1-bit (sign) quantization: `dims` sign bits packed into one BIGINT
    * — 64 float dims (256 B) collapse to 8 bytes, the most aggressive
    * published embedding-compression point (the cheap first tier of a
    * binary-rerank retrieval stack). XOR-fold of distinct powers (not a
    * sum) so bit 63's sign wrap needs no special case on either engine.
    * Integer-only: cross-engine parity is exact by construction.
    *
    * NULL contract (matches PqEncode's dim-mismatch convention): a NULL
    * or missing element anywhere in the first `dims` positions nulls
    * the whole signature — there is no silent "treat as positive"
    * bit, and [[annHamming]] then excludes such vectors from both
    * sides rather than ranking them at an arbitrary distance.
    */
  def signBits(emb: Column, dims: Int): Column = {
    require(dims <= 64, s"signBits packs into one long; dims $dims > 64")
    aggregate(sequence(lit(0), lit(dims - 1)), lit(0L),
      (acc, i) => {
        val e = element_at(emb, (i + 1).cast("int"))
        // no otherwise(): a NULL element falls through both branches,
        // XORs NULL into the accumulator and stays NULL to the end
        acc.bitwiseXOR(
          when(e >= 0, call_function("shiftleft", lit(1L), i))
            .when(e < 0, lit(0L)))
      })
  }

  /** Hamming-distance ANN over sign-quantized embeddings: corpus and
    * queries collapse to one BIGINT signature each (map-only), the
    * query side broadcasts, and ranking is `bit_count(xor)` — a POPCNT
    * per candidate, no floats anywhere. At 100 TB the signature table
    * is ~30× smaller than the raw corpus and the scan is pure
    * whole-stage-codegen integer work; compose with IVF cells (like
    * [[graft.analytics.Pq.searchTopKIvf]]) when even the signature
    * cross-product is too wide. Output (query_id, rk, neighbor_id,
    * hamming), deterministic via (hamming, neighbor_id) order.
    */
  def annHamming(corpus: DataFrame, queries: DataFrame, dims: Int,
                 k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      signBits(col("embedding"), dims).as("csig"))
      .filter(col("csig").isNotNull)
    val q = queries.select(col("vec_id").as("query_id"),
      signBits(col("embedding"), dims).as("qsig"))
      .filter(col("qsig").isNotNull)
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        bit_count(col("csig").bitwiseXOR(col("qsig"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("hamming"))
  }
}
