package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-up generator: replicate an existing `sf*` fixture
  * directory F× with shifted surrogate keys, producing an
  * sf(0.1·F)-equivalent dataset for empirical scaling validation (the
  * plan-shape "100 TB arguments" checked against at least one measured
  * scale step: run Bench at sf0.1 and at the scaled dir, compare
  * per-query ratios).
  *
  * Key invariants preserved so query SELECTIVITY and join fan-out stay
  * constant across the scale step (otherwise ratios measure workload
  * drift, not engine scaling):
  *  - every table's surrogate keys shift by `r · (max+1)` per replica;
  *    foreign keys shift by the PARENT's stride, so per-customer order
  *    counts, per-order line counts, and bucket hit rates are identical;
  *  - `documents.text` is word-shuffled per replica (deterministic
  *    md5-keyed sort): unigram stats — lang-id, quality, token counts —
  *    keep their distribution, while shingles/MinHash signatures differ,
  *    so replicas are NOT near-duplicates and pair-generating dedup ops
  *    scale like a 10× corpus, not a 10×-duplicated one;
  *  - `embeddings.embedding` gets a per-(replica, dim) deterministic
  *    sign flip: norms and per-dim magnitude distributions are
  *    unchanged, but replicas decorrelate (random sign patterns), so
  *    ANN/SemDeDup neighbor structure scales instead of collapsing into
  *    10-clone clusters;
  *  - dimension tables (nation, region) are NOT scaled — they are
  *    broadcast dims at any scale, like the real TPC-H fixed tables.
  *
  * Usage: `runMain graft.tools.ScaleFixture <srcDir> <outDir> [factor]`.
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, out: String,
            factor: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).head.getLong(0) + 1L

    // replica index rides along as `_r`; key shift = _r * stride
    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(
        spark.range(0L, factor.toLong).select(col("id").as("_r")))
    def shifted(c: String, s: Long) = (col(c) + col("_r") * s).as(c)

    val orders = read("orders"); val lineitem = read("lineitem")
    val customer = read("customer"); val supplier = read("supplier")
    val part = read("part")
    val oS = stride(orders, "o_orderkey"); val cS = stride(customer, "c_custkey")
    val sS = stride(supplier, "s_suppkey"); val pS = stride(part, "p_partkey")

    def write(df: DataFrame, t: String): Unit =
      df.drop("_r").write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    write(replicate(customer).select(shifted("c_custkey", cS),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment"), col("_r")), "customer")
    write(replicate(supplier).select(shifted("s_suppkey", sS),
      col("s_name"), col("s_nationkey"), col("s_acctbal"), col("_r")),
      "supplier")
    write(replicate(part).select(shifted("p_partkey", pS), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"),
      col("_r")), "part")
    write(replicate(orders).select(shifted("o_orderkey", oS),
      shifted("o_custkey", cS), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"), col("_r")), "orders")
    write(replicate(lineitem).select(shifted("l_orderkey", oS),
      shifted("l_partkey", pS), shifted("l_suppkey", sS),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"), col("_r")), "lineitem")

    // events: ids shift; timestamps offset by one replica-width so the
    // event-time span scales with the data (sessionization/window state
    // must grow, not just densify)
    val events = read("events")
    val eS = stride(events, "event_id")
    val tsUs = graft.sources.Tables.epochUs(events)
    val span = events.agg(max(tsUs) - min(tsUs) + 1L).head.getLong(0)
    write(replicate(events).select(shifted("event_id", eS),
      (col("ts") + make_dt_interval(lit(0), lit(0), lit(0),
        (col("_r") * span).cast("double") / 1e6)).as("ts"),
      shifted("user_id", stride(events, "user_id")),
      col("event_type"), col("value"), col("props"), col("_r")), "events")

    // documents: per-replica deterministic word shuffle — replica 0 is
    // the original corpus byte-for-byte
    val docs = read("documents")
    val dS = stride(docs, "doc_id")
    val shuffledText = when(col("_r") === 0, col("text")).otherwise(
      array_join(transform(
        array_sort(transform(split(col("text"), " "),
          (w, i) => struct(
            md5(concat_ws("|", w, i.cast("string"),
              col("doc_id").cast("string"), col("_r").cast("string")))
              .as("k"),
            w.as("w")))),
        s => s.getField("w")), " "))
    write(replicate(docs).select(shifted("doc_id", dS),
      shuffledText.as("text"), col("lang"), col("source"),
      col("n_chars"), col("_r")), "documents")

    // embeddings: per-(replica, dim) sign flip — replica 0 unchanged
    val embs = read("embeddings")
    val vS = stride(embs, "vec_id")
    val flipped = when(col("_r") === 0, col("embedding")).otherwise(
      zip_with(col("embedding"),
        sequence(lit(0), size(col("embedding")) - 1),
        (v, i) => when(
          pmod(xxhash64(col("_r"), i), lit(2)) === 0, v).otherwise(-v)))
    write(replicate(embs).select(shifted("vec_id", vS),
      flipped.cast("array<float>").as("embedding"), col("label"),
      col("_r")), "embeddings")

    // broadcast dims copy through unscaled
    Seq("nation", "region").foreach(t =>
      read(t).write.mode("overwrite").parquet(s"$out/$t.parquet"))
    println(s"scaled $src -> $out x$factor")
  }
}
