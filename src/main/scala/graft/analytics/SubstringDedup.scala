package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed-hash approximation of suffix-array exact-substring
  * deduplication (the Lee et al. "Deduplicating Training Data" exact
  * substring pass): hash EVERY `width`-token window at stride 1, mark a
  * window duplicated when its content occurs in ≥ `minDocs` distinct
  * documents, and fold overlapping duplicated windows into spans — so a
  * shared substring is found at ANY token offset, not only on the fixed
  * non-overlapping grid of [[Boilerplate]] (which this generalizes: a
  * true suffix automaton finds arbitrary-length repeats; fixed-width
  * stride-1 windows find every repeat of length ≥ width, the standard
  * scalable approximation).
  *
  * 100 TB shape — same blocking discipline as `a_passage_dedup`, no
  * pair stage anywhere:
  *   1. window explosion is map-only (sequence + transform + slice,
  *      pure codegen; n_tokens rows per doc, each an md5);
  *   2. duplication counts: `groupBy(hash).agg(countDistinct(doc))` —
  *      map-side partial aggregation collapses per-partition repeats of
  *      hot substrings before the shuffle;
  *   3. one shuffle join of windows against the count table keyed by
  *      hash (AQE splits the hot boilerplate keys);
  *   4. span coverage: per-doc gaps-and-islands over duplicated offsets
  *      (two window functions + one aggregation, all partitioned by
  *      doc_id — state bounded by a document's window count).
  * md5 keeps the window key engine-parity-checkable; a production run
  * at 1B docs would swap in xxhash64 (8-byte keys, same plan shape).
  */
object SubstringDedup {

  /** Per-document duplicated-substring statistics:
    * `(doc_id, n_windows, n_dup_windows, n_dup_spans, dup_tokens)` —
    * `dup_tokens` is the exact token coverage of the union of
    * duplicated `width`-token spans. Documents shorter than `width`
    * have no windows and zero counts.
    */
  def substringStats(docs: DataFrame, width: Int,
                     minDocs: Long = 2): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("n", size(col("tk")))

    val win = base.filter(col("n") >= width)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n") - width),
          i => struct(i.as("o"),
            md5(array_join(slice(col("tk"), i + 1, lit(width)), " "))
              .as("h")))).as("w"))
      .select(col("doc_id"), col("w.o").as("o"), col("w.h").as("h"))

    val counts = win.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))

    val dup = win.join(counts, "h").filter(col("nd") >= minDocs)
      .select(col("doc_id"), col("o"))

    // gaps-and-islands: consecutive duplicated offsets ≤ width apart
    // overlap (or touch) and fold into one span [s, e + width - 1]
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("o"))
    val isl = dup
      .withColumn("brk",
        when(col("o") - lag(col("o"), 1).over(byDoc) <= width, 0)
          .otherwise(1))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("o")).as("s"), max(col("o")).as("e"))

    val cov = isl.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + width).as("dup_tokens"))
    val cnt = dup.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"))

    base.select(col("doc_id"),
      greatest(col("n") - (width - 1), lit(0)).cast("long").as("n_windows"))
      .join(cnt, Seq("doc_id"), "left")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }
}
