package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share any `n`-token shingle with an evaluation set
  * (the n-gram-collision rule used to scrub eval benchmarks out of
  * pretraining data).
  *
  * 100 TB shape: the benchmark side is the SMALL side (eval suites are
  * a few thousand documents) — its distinct shingles are broadcast, so
  * the 100 TB training side is a single map-side semi-join pass with no
  * shuffle of the corpus; the only aggregation is per-doc hit counting,
  * which is map-side combinable. Shingling happens once per side as a
  * column expression (no UDFs, stays in codegen).
  */
object Decontaminate {

  /** Training docs sharing ≥1 `n`-shingle with `benchmark`:
    * `(doc_id, contaminated_shingles)`, hit count = distinct shared
    * shingles. Docs with no overlap are absent (the keep-set is the
    * anti-join complement).
    */
  def contaminatedDocs(train: DataFrame, benchmark: DataFrame,
                       n: Int = 8): DataFrame = {
    def shingled(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        explode(TextAnalysis.shingles(col("text"), n)).as("sh"))

    val benchShingles = shingled(benchmark).select("sh").distinct()
    shingled(train)
      .join(broadcast(benchShingles), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("contaminated_shingles"))
  }

  /** FUZZY decontamination: training docs NEAR-duplicating any document
    * of the eval split (MinHash-LSH candidates exact-verified at
    * `minJaccard`) — catches paraphrased/lightly-edited benchmark
    * leakage that exact shingle collision misses. `isBenchmark` marks
    * the eval side within `corpus`; output is one row per contaminated
    * TRAINING doc with its match count and worst (highest) Jaccard.
    *
    * Scale shape inherits [[Dedup.minhashLshPairs]] wholesale: map-only
    * native signatures, banded buckets, one corpus scan in the verify —
    * the side filter adds nothing.
    */
  def nearDupContaminated(corpus: DataFrame,
                          isBenchmark: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                          shingleSize: Int, bands: Int, rowsPerBand: Int,
                          minJaccard: Double): DataFrame = {
    val pairs = Dedup.minhashLshPairs(corpus, shingleSize, bands,
      rowsPerBand, minJaccard)
    pairs
      .filter(isBenchmark(col("id_a")) =!= isBenchmark(col("id_b")))
      .select(
        when(isBenchmark(col("id_a")), col("id_b")).otherwise(col("id_a"))
          .as("doc_id"),
        col("jaccard"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("jaccard")).as("max_jaccard"))
  }
}
