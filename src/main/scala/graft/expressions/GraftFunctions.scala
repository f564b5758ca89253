package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration of the engine's native Catalyst expressions as SQL
  * functions. Idempotent; call once per session (every query that uses a
  * native function calls it defensively).
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Name → builder for every native function; single source of truth for
    * both per-session registration ([[register]]) and config-driven
    * injection ([[graft.GraftSparkExtensions]]).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" ->
      ((exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    "graft_latest_by_pos" ->
      ((exprs: Seq[Expression]) =>
        LatestByPos(exprs(0), exprs(1)).toAggregateExpression()),
    "graft_minhash" -> ((exprs: Seq[Expression]) => {
      require(exprs(1).foldable, "minhash numPerm must be a literal")
      MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())
    }),
    "graft_oneperm_minhash" -> ((exprs: Seq[Expression]) => {
      require(exprs(1).foldable, "oneperm_minhash k must be a literal")
      OnePermMinHash(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())
    }),
    // Spark's internal runtime-filter bloom expressions surfaced as
    // callable functions: build over xxhash64 values, probe with a
    // foldable serialized-filter literal. Both codegen; no UDFs.
    "graft_bloom_agg" -> ((exprs: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression()),
    "graft_bloom_might_contain" -> ((exprs: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))),
    "graft_simhash" -> ((exprs: Seq[Expression]) => {
      require(exprs(1).foldable && exprs(2).foldable,
        "simhash bits/useMd5 must be literals")
      SimHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Boolean])
    }),
    "graft_vector_sum" -> ((exprs: Seq[Expression]) =>
      VectorSum(exprs(0)).toAggregateExpression()),
    "graft_misra_gries" -> ((exprs: Seq[Expression]) =>
      MisraGries(exprs(0), exprs(1)).toAggregateExpression()),
    "graft_nearest_cell" -> ((exprs: Seq[Expression]) => {
      // 2nd arg must be a foldable array<array<double>> literal — the
      // centroid matrix is evaluated once at plan time, not per row
      require(exprs(1).foldable, "nearest_cell centroids must be a literal")
      val ad = exprs(1).eval().asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData]
      val mat = Array.tabulate(ad.numElements())(i =>
        ad.getArray(i).toDoubleArray())
      NearestCell(exprs(0), mat)
    }),
    "graft_nearest_cells" -> ((exprs: Seq[Expression]) => {
      require(exprs(1).foldable && exprs(2).foldable,
        "nearest_cells centroids/nprobe must be literals")
      val ad = exprs(1).eval().asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData]
      val mat = Array.tabulate(ad.numElements())(i =>
        ad.getArray(i).toDoubleArray())
      NearestCells(exprs(0), mat,
        exprs(2).eval().asInstanceOf[Number].intValue())
    }),
    "graft_two_level_cell" -> ((exprs: Seq[Expression]) => {
      require(exprs.drop(1).forall(_.foldable),
        "two_level_cell coarse/members/centroids/probeGroups must be literals")
      def dmat(e: Expression) = {
        val ad = e.eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
      }
      val adm = exprs(2).eval().asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData]
      val mem = Array.tabulate(adm.numElements())(i =>
        adm.getArray(i).toIntArray())
      TwoLevelNearestCell(exprs(0), dmat(exprs(1)), mem, dmat(exprs(3)),
        exprs(4).eval().asInstanceOf[Number].intValue())
    }),
    "graft_wkb_swap" -> ((exprs: Seq[Expression]) => WkbSwapAxes(exprs(0))),
    "graft_wkb_from_ewkb" ->
      ((exprs: Seq[Expression]) => WkbFromEwkb(exprs(0))),
    "graft_wkb_ordinates" ->
      ((exprs: Seq[Expression]) => WkbOrdinates(exprs(0))),
    "graft_wkb_geomtype" ->
      ((exprs: Seq[Expression]) => WkbGeometryType(exprs(0))),
    "graft_wkb_point_x" ->
      ((exprs: Seq[Expression]) => WkbPointCoord(exprs(0), isX = true)),
    "graft_wkb_point_y" ->
      ((exprs: Seq[Expression]) => WkbPointCoord(exprs(0), isX = false)),
    "graft_wkb_to_ewkb" ->
      ((exprs: Seq[Expression]) => WkbToEwkb(exprs(0), exprs(1))),
    "graft_wkb_point" ->
      ((exprs: Seq[Expression]) => WkbEncodePoint(exprs(0), exprs(1))),
    "graft_pq_encode" -> ((exprs: Seq[Expression]) => {
      // codebooks must be a foldable array<array<array<double>>> literal
      require(exprs(1).foldable, "pq_encode codebooks must be a literal")
      val ad = exprs(1).eval().asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData]
      val cbs = Array.tabulate(ad.numElements()) { i =>
        val sub = ad.getArray(i)
        Array.tabulate(sub.numElements())(j => sub.getArray(j).toDoubleArray())
      }
      PqEncode(exprs(0), cbs)
    }),
    "graft_first_of_sorted_run" ->
      ((exprs: Seq[Expression]) => FirstOfSortedRun(exprs(0))),
    "graft_hll_agg" -> ((exprs: Seq[Expression]) =>
      HllSketchAgg(exprs(0), exprs(1)).toAggregateExpression()),
    "graft_hll_merge" -> ((exprs: Seq[Expression]) =>
      HllMergeAgg(exprs(0)).toAggregateExpression()),
    "graft_hll_estimate" ->
      ((exprs: Seq[Expression]) => HllEstimate(exprs(0))),
    "graft_hll_registers" ->
      ((exprs: Seq[Expression]) => HllRegisters(exprs(0))),
    "graft_bpe_encode" -> ((exprs: Seq[Expression]) => {
      // merge halves must be two foldable array<string> literals (same
      // length, rank = position)
      require(exprs(1).foldable && exprs(2).foldable,
        "bpe_encode merge tables must be literals")
      def strs(e: Expression): Seq[String] = {
        val ad = e.eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        Array.tabulate(ad.numElements())(i =>
          ad.getUTF8String(i).toString).toSeq
      }
      BpeEncode(exprs(0), strs(exprs(1)).zip(strs(exprs(2))))
    })
  )

  def register(spark: SparkSession): Unit = {
    // idempotent per session: the extension path (GraftExtensions) and
    // explicit register() calls both land in the same session registry —
    // re-registering an existing name would spew a "function X replaced"
    // warning per function at every session touch
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
  }

  /** Cosine similarity via the native expression (register(spark) first). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Latest-struct-by-position aggregate (register(spark) first). */
  def latestByPos(value: Column, pos: Column): Column =
    call_function("graft_latest_by_pos", value, pos)

  /** First row of each run of equal struct keys in partition iteration
    * order — only meaningful directly above a within-partition sort on
    * the same key (register(spark) first; see [[FirstOfSortedRun]]).
    */
  def firstOfSortedRun(key: Column): Column =
    call_function("graft_first_of_sorted_run", key)

  /** Nearest-centroid cell id via the native expression
    * (register(spark) first).
    */
  def nearestCell(emb: Column, centroids: Seq[Seq[Double]]): Column =
    call_function("graft_nearest_cell", emb,
      org.apache.spark.sql.functions.typedLit(centroids))

  /** Indices of the nprobe nearest centroids via the native expression
    * (register(spark) first).
    */
  def nearestCells(emb: Column, centroids: Seq[Seq[Double]],
                   nprobe: Int): Column =
    call_function("graft_nearest_cells", emb,
      org.apache.spark.sql.functions.typedLit(centroids),
      org.apache.spark.sql.functions.lit(nprobe))

  /** Coarse-fine nearest cell via the native expression — see
    * [[graft.analytics.Ivf.cellOfTwoLevelNative]] (register(spark)
    * first).
    */
  def twoLevelCell(emb: Column, coarse: Seq[Seq[Double]],
                   members: Seq[Seq[Int]], centroids: Seq[Seq[Double]],
                   probeGroups: Int): Column =
    call_function("graft_two_level_cell", emb,
      org.apache.spark.sql.functions.typedLit(coarse),
      org.apache.spark.sql.functions.typedLit(members),
      org.apache.spark.sql.functions.typedLit(centroids),
      org.apache.spark.sql.functions.lit(probeGroups))

  /** Elementwise array<double> sum aggregate (register(spark) first). */
  def vectorSum(v: Column): Column = call_function("graft_vector_sum", v)

  /** Misra–Gries heavy-hitters summary aggregate: array<(term, count)>
    * with at most `capacity` counters (register(spark) first).
    */
  def misraGries(term: Column, capacity: Int): Column =
    call_function("graft_misra_gries", term,
      org.apache.spark.sql.functions.lit(capacity))

  /** Product-quantization codes via the native expression
    * (register(spark) first). `codebooks` is m × ksub × dsub.
    */
  def pqEncode(emb: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    call_function("graft_pq_encode", emb,
      org.apache.spark.sql.functions.typedLit(codebooks))

  /** One-pass MinHash signature array (register(spark) first). */
  def minhash(shingles: Column, numPerm: Int): Column =
    call_function("graft_minhash", shingles,
      org.apache.spark.sql.functions.lit(numPerm))

  /** One-permutation densified MinHash signature with `k` slots
    * (register(spark) first) — O(shingles + k) per row vs [[minhash]]'s
    * O(shingles × k).
    */
  def onePermMinhash(shingles: Column, k: Int): Column =
    call_function("graft_oneperm_minhash", shingles,
      org.apache.spark.sql.functions.lit(k))

  /** One-pass SimHash of a token-set column (register(spark) first). */
  def simhash(tokens: Column, bits: Int, useMd5: Boolean): Column =
    call_function("graft_simhash", tokens,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(useMd5))

  /** Bloom filter over an xxhash64 column (register(spark) first):
    * aggregate to ONE binary value (serialized filter).
    */
  def bloomAgg(hash64: Column, expectedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", hash64,
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(numBits))

  /** Probe a serialized bloom filter literal with an xxhash64 column. */
  def bloomMightContain(bloom: Column, hash64: Column): Column =
    call_function("graft_bloom_might_contain", bloom, hash64)

  /** Portable-hash HLL sketch aggregate → binary registers
    * (register(spark) first). `value` must be a string column.
    */
  def hllSketch(value: Column, p: Int): Column =
    call_function("graft_hll_agg", value,
      org.apache.spark.sql.functions.lit(p))

  /** Merge stored HLL sketches (register-wise max) — the re-aggregation
    * aggregate over persisted per-source/per-epoch sketches.
    */
  def hllMerge(sketch: Column): Column =
    call_function("graft_hll_merge", sketch)

  /** Distinct-count estimate of an HLL sketch. */
  def hllEstimate(sketch: Column): Column =
    call_function("graft_hll_estimate", sketch)

  /** Registers of an HLL sketch in bucket order (array<int>). */
  def hllRegisters(sketch: Column): Column =
    call_function("graft_hll_registers", sketch)

  /** BPE-tokenize a text column with a trained merge table
    * (register(spark) first): merges in rank order, trainer-identical
    * replace semantics, final subword array out.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", text,
      org.apache.spark.sql.functions.typedLit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedLit(merges.map(_._2)))
}
