package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HDR-histogram quantile summary (Gene Tene's HdrHistogram bucket
  * scheme, public domain; the mergeable-summary framing of Agarwal et
  * al., PODS 2012): non-negative integer values quantize into
  * log2-scaled buckets with `2^s` linear sub-buckets per octave, so the
  * bucket count is O(s · log2 maxValue) and every bucket's relative
  * width — hence the quantile error — is bounded by `2^-s`.
  *
  * Everything here is INTEGER arithmetic over the value's bit length
  * (`length(bin(x))`, the same portable trick the HLL sketch uses), so
  * histograms are bit-identical across engines and across any merge
  * order. The sketch representation is plain `(group, bucket, n)` rows:
  *  - building it is one map-side-combinable count agg (no custom
  *    expression, no sort);
  *  - merging per-epoch/per-source histograms is `groupBy(bucket).sum(n)`;
  *  - quantiles come from a cumulative sum over ≤ a few hundred bucket
  *    rows — the 100 TB replacement for an exact per-group `ntile`/
  *    `percentile` sort, and unlike `approx_percentile`'s internal
  *    buffer the summary itself persists and re-aggregates.
  *
  * Bucket scheme (s sub-bucket bits, e = bitlength(x) - 1):
  *  - x < 2^(s+1): bucket = x (exact region);
  *  - else: m = x >> (e - s) ∈ [2^s, 2^(s+1)); bucket = (e-s)·2^s + m.
  *  Continuous at the boundary and monotone in x, so bucket order is
  *  value order and quantile selection needs no decode.
  */
object Histogram {

  /** HDR bucket index of a non-negative integer column; a negative or
    * null input yields NULL (surfaced as its own bucket row) instead of
    * silently corrupting the bucket order.
    */
  def hdrBucket(x0: Column, s: Int): Column = {
    val x = x0.cast("long")
    val e = (length(bin(x)) - 1).cast("int")
    when(x.isNull || x < 0, lit(null).cast("long"))
      .when(x < (1L << (s + 1)), x)
      .otherwise((e - s).cast("long") * (1L << s) +
        call_function("shiftright", x, e - lit(s)))
  }

  /** Number of value-octave bits of a bucket: 0 in the exact region,
    * else e - s (the bucket's width is 2^k).
    */
  private def octave(bucket: Column, s: Int): Column =
    call_function("shiftright", bucket, lit(s)).cast("int") - 1

  /** Smallest value mapping to `bucket`. */
  def lowerBound(bucket: Column, s: Int): Column = {
    val k = octave(bucket, s)
    when(bucket < (1L << (s + 1)), bucket.cast("long"))
      .otherwise(call_function("shiftleft",
        bucket - k.cast("long") * (1L << s), k))
  }

  /** Largest value mapping to `bucket`. */
  def upperBound(bucket: Column, s: Int): Column = {
    val k = octave(bucket, s)
    when(bucket < (1L << (s + 1)), bucket.cast("long"))
      .otherwise(lowerBound(bucket, s) +
        call_function("shiftleft", lit(1L), k) - 1L)
  }

  /** Per-group histogram rows (group, bucket, n) — the sketch itself.
    * One count agg; partials combine map-side; merge across stored
    * histograms is sum-by-bucket.
    */
  def hdrHistogram(df: DataFrame, group: Column, value: Column,
                   s: Int): DataFrame =
    df.select(group.as("group"), hdrBucket(value, s).as("bucket"))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Quantiles from histogram rows: for each rational q = num/den, the
    * lower bound of the first bucket whose cumulative count reaches
    * ceil(q · total) — nearest-rank on the quantized distribution, in
    * pure integer arithmetic (ceil via (num·total + den - 1) div den),
    * so cross-engine parity is exact. Input ≤ O(s·64) rows per group;
    * the window runs over bucket rows, never raw values.
    */
  def quantiles(hist: DataFrame, s: Int,
                qs: Seq[(String, Int, Int)]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("bucket"))
    // the NULL bucket (negative/null inputs) is a data-quality signal,
    // not a value: it must not count toward totals or the cumulative
    // rank (and engines disagree on NULL sort order — Spark NULLS FIRST
    // asc, DuckDB NULLS LAST — so including it would also diverge
    // cross-engine). Callers read invalid counts off the histogram rows.
    val valid = hist.filter(col("bucket").isNotNull)
    val cum = valid.withColumn("cum", sum(col("n")).over(w))
    val totals = valid.groupBy(col("group")).agg(sum(col("n")).as("total"))
    val qdf = qs.toDF("qname", "num", "den")
    val targets = totals.crossJoin(qdf)
      .select(col("group"), col("qname"),
        // integer ceil(num·total/den) via INTEGRAL divide (`div`), never
        // double division — exact at any total, matching the oracle's `//`
        call_function("div",
          col("num") * col("total") + col("den") - 1, col("den"))
          .cast("long").as("target"))
    targets.join(cum, Seq("group"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("group"), col("qname"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("group"), col("qname"),
        lowerBound(col("bucket"), s).as("est"))
  }
}
