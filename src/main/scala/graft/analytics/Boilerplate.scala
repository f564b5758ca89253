package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document passage (boilerplate) deduplication — the CCNet /
  * RefinedWeb paragraph-dedup shape: split every document into passages,
  * hash each passage, count how many DISTINCT documents contain each
  * hash corpus-wide, drop passages above the duplication threshold
  * (navigation chrome, license footers, templated text), and reassemble
  * the surviving passages in document order.
  *
  * Passage unit: real pipelines split on newlines; the synthetic corpus
  * has none, so the unit is a fixed-width non-overlapping token window —
  * the same operator, parameterized by a different splitter.
  *
  * 100 TB shape: three aggregations, each map-side combinable —
  * (1) passage counts: `groupBy(hash).agg(countDistinct(doc))` (partial
  * aggregation collapses per-partition repeats of hot boilerplate before
  * the shuffle); (2) a shuffle join of exploded passages against the
  * count table keyed by hash — AQE's skew handling splits the
  * boilerplate hot keys, which is exactly where skew concentrates;
  * (3) per-document reassembly via `sort_array(collect_list(struct))` —
  * one row per surviving passage, grouped once. Documents whose every
  * passage is boilerplate are preserved (empty text) through a left
  * join from the corpus, so the output stays 1 row per input document.
  */
object Boilerplate {

  /** Non-overlapping `width`-token windows of `text`, with ordinals:
    * `array<struct<widx int, wtext string>>`. Pure codegen (sequence +
    * transform + slice), no UDF; a document shorter than `width` is one
    * window.
    */
  def tokenWindows(text: Column, width: Int): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(0),
        ceil(size(toks) / lit(width.toDouble)).cast("int") - 1),
      i => struct(i.as("widx"),
        array_join(slice(toks, i * width + 1, lit(width)), " ").as("wtext")))
  }

  /** Remove passages (fixed `width`-token windows) that occur in at
    * least `minDocs` distinct documents; returns one row per input
    * document: `(doc_id, clean_text, n_windows, n_dropped)`.
    */
  def removeBoilerplate(docs: DataFrame, width: Int, minDocs: Long): DataFrame = {
    val win = docs
      .select(col("doc_id"),
        explode(tokenWindows(col("text"), width)).as("w"))
      .select(col("doc_id"), col("w.widx").as("widx"),
        col("w.wtext").as("wtext"), md5(col("w.wtext")).as("h"))

    // corpus-wide duplication per passage hash; distinct-doc counting is
    // the standard so a doc repeating its own passage isn't "boilerplate"
    val counts = win.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))

    val kept = win.join(counts, "h").filter(col("n_docs") < minDocs)

    val rebuilt = kept.groupBy(col("doc_id")).agg(
      array_join(transform(
        sort_array(collect_list(struct(col("widx"), col("wtext")))),
        w => w("wtext")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))

    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_toks"))
      .withColumn("n_windows",
        ceil(col("n_toks") / lit(width.toDouble)).cast("long"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_windows"),
        (col("n_windows") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }
}
