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
}
