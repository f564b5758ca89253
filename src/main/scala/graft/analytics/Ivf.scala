package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour: k-means centroids
  * partition the corpus into cells; a query probes only its `nprobe`
  * nearest cells. The scale path next to LSH: centroids are fitted on a
  * bounded SAMPLE driver-side (deterministic — seeded by vec order, a few
  * thousand rows regardless of corpus size), assignment/search are pure
  * column expressions, and the only join is query-cell × cell — never a
  * corpus cross join.
  */
object Ivf {

  type Centroid = Array[Double]

  private def dist2(a: Centroid, b: Centroid): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def unit(v: Centroid): Centroid = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** L2-normalized copy of an embedding column (cast to double). The
    * search metric is cosine, so cells are fitted and probed on the unit
    * sphere — for unit vectors L2 ordering equals cosine ordering
    * (spherical k-means); clustering raw magnitudes would put a query's
    * cosine neighbors in far-away cells.
    */
  private def normalized(emb: Column): Column = {
    val n = sqrt(aggregate(emb,
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(emb, x => x.cast("double") / n)
  }

  /** Deterministic "pretrained" unit centroids from a fixed-seed LCG.
    * Production IVF separates training (offline) from search (online):
    * `searchTopK` takes centroids as a parameter either way. These
    * data-independent cells let an external oracle reproduce the exact
    * cell geometry from literals; `fitCentroids` is the data-fitted
    * (higher-recall) trainer.
    */
  def pretrainedCentroids(k: Int, dims: Int): Seq[Centroid] =
    (0 until k).map { c =>
      var s = 0x517CC1B727220A95L ^ (c * 0x9E3779B97F4A7C15L)
      unit(Array.fill(dims) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      })
    }

  /** Data-fitted cell count: k ≈ √N (the standard IVF sizing — per-cell
    * scan cost and probe count balance at the square root), clamped to
    * [4, 65536]. At 1B vectors this gives ~32k cells; `nprobe` then
    * trades recall for cells scanned without retraining.
    */
  def heuristicK(n: Long): Int =
    math.max(4L, math.min(65536L, math.round(math.sqrt(n.toDouble)))).toInt

  /** Largest k the single-threaded driver-side Lloyd's is allowed to
    * handle: beyond this, one iteration is O(k · 40k · dims) ≈ 10⁹+
    * multiply-adds on one core while the cluster idles — the distributed
    * trainer takes over.
    */
  val driverKMax = 1024

  /** Fit centroids with the √N heuristic cell count. One `count()` job
    * sizes k. Small k (≤ [[driverKMax]]) trains driver-side on a bounded
    * ordered sample; large k (the 100 TB / 1B-vector regime, k up to
    * 65536) trains with [[fitCentroidsDistributed]] over a deterministic
    * hash-sample of ~40·k vectors — the sample never lands on the
    * driver, only the k centroids do.
    */
  def fitCentroidsAuto(corpus: DataFrame, idCol: String, embCol: String,
                       iters: Int = 10): (Int, Seq[Centroid]) = {
    val n = corpus.count()
    val k = heuristicK(n)
    if (k <= driverKMax)
      (k, fitCentroids(corpus, idCol, embCol, k, iters,
        sampleN = math.max(2000, 40 * k)))
    else {
      // deterministic distributed downsample to ~40·k training vectors:
      // hash-mod keeps the choice reproducible and shuffle-free
      val target = 40L * k
      val mod = math.max(1L, n / target)
      val sample =
        if (mod <= 1L) corpus
        else corpus.filter(pmod(xxhash64(col(idCol)), lit(mod)) === 0)
      (k, fitCentroidsDistributed(sample, idCol, embCol, k, iters))
    }
  }

  /** Distributed Lloyd's on the unit sphere — the ≥ [[driverKMax]] path.
    * Per iteration: cell assignment is the native codegen
    * [[graft.expressions.NearestCell]] over a persisted normalized frame,
    * and the centroid update is `groupBy(cell).agg(vector_sum, count)`
    * with the native [[graft.expressions.VectorSum]] aggregate — map-side
    * partials fold each partition into ≤ cells × dims doubles before the
    * shuffle, and only k rows (the new centroids themselves, ~33 MB at
    * k=65536·d=64) reach the driver — never the vectors. (No posexplode:
    * a per-dimension Generate both multiplies rows by dims and lets the
    * optimizer collapse the O(k·d) assignment above it, re-evaluating it
    * once per exploded row — measured 64× slower at d=64.)
    * Seeding matches [[fitCentroids]]: first k distinct vectors in id
    * order. Unlike the driver path, per-cell float sums fold in
    * partition order, so centroids can differ in final ulps across runs
    * — callers needing bit-reproducible cells use
    * [[pretrainedCentroids]] or the driver path.
    */
  def fitCentroidsDistributed(corpus: DataFrame, idCol: String, embCol: String,
                              k: Int, iters: Int = 10): Seq[Centroid] = {
    // a zero vector has no direction: normalized() would make it NaN and
    // one NaN permanently poisons whichever centroid's sum it lands in —
    // exclude it from TRAINING (the driver path's unit() guards n == 0
    // the same way; search-time behavior is unchanged)
    val nonZero = corpus.filter(
      aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) > 0.0)
    val ne = nonZero
      .select(col(idCol).as("_id"), normalized(col(embCol)).as("_ne"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedPool = ne.orderBy(col("_id")).limit(4 * k)
        .select(col("_ne")).collect()
        .map(_.getSeq[Double](0))
      val seeds = seedPool.iterator.distinct.take(k).toVector
      require(seeds.size >= k,
        s"only ${seeds.size} distinct vectors in the ${seedPool.length}-row " +
          s"seed pool for k=$k")
      var centroids: Array[Centroid] = seeds.map(_.toArray).toArray
      for (_ <- 0 until iters) {
        graft.expressions.GraftFunctions.register(corpus.sparkSession)
        val stats = ne
          .select(graft.expressions.GraftFunctions
            .nearestCell(col("_ne"), centroids.toSeq.map(_.toSeq))
            .cast("int").as("cell"), col("_ne"))
          .groupBy(col("cell"))
          .agg(graft.expressions.GraftFunctions.vectorSum(col("_ne")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = centroids.clone()
        stats.foreach { r =>
          require(!r.isNullAt(0),
            "nearest_cell returned NULL during training: corrupt vector dims")
          val c = r.getInt(0)
          val s = r.getSeq[Double](1)
          val n = r.getLong(2)
          next(c) = s.map(_ / n).toArray
        }
        centroids = next
      }
      centroids.toSeq
    } finally ne.unpersist()
  }

  /** Mini-batch k-means (Sculley, "Web-scale k-means clustering", WWW
    * 2010) for the very-large-k regime: instead of assigning one FIXED
    * cached sample every iteration, each iteration draws a fresh
    * deterministic hash-sample of ~`batchPerCell`·k vectors (the salt
    * is the iteration index, so batches are disjoint-ish and
    * reproducible) and folds it into the running centroids with
    * per-cell learning rates η_c = batch_n_c / lifetime_n_c — centers
    * that have absorbed more data move less, the standard mini-batch
    * convergence schedule. The distributed shape matches
    * [[fitCentroidsDistributed]]: native codegen cell assignment,
    * [[graft.expressions.VectorSum]] map-side partials, only k stat
    * rows to the driver per iteration. The difference is the scan
    * footprint: nothing persists across iterations and each iteration
    * reads only its batch — at 1B vectors and k=65536, an iteration
    * touches ~0.05% of the corpus instead of re-scanning a cached
    * 2.6M-row sample, and fresh batches keep late iterations from
    * overfitting one fixed subsample. Same ulp caveat as the
    * distributed path: float sums fold in partition order.
    */
  def fitCentroidsMiniBatch(corpus: DataFrame, idCol: String, embCol: String,
                            k: Int, iters: Int = 10,
                            batchPerCell: Int = 8): Seq[Centroid] = {
    val nonZero = corpus.filter(
      aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) > 0.0)
    val ne = nonZero
      .select(col(idCol).as("_id"), normalized(col(embCol)).as("_ne"))
    val n = ne.count()
    val mod = math.max(1L, n / math.max(1L, batchPerCell.toLong * k))
    val seedPool = ne.orderBy(col("_id")).limit(4 * k)
      .select(col("_ne")).collect()
      .map(_.getSeq[Double](0))
    val seeds = seedPool.iterator.distinct.take(k).toVector
    require(seeds.size >= k,
      s"only ${seeds.size} distinct vectors in the ${seedPool.length}-row " +
        s"seed pool for k=$k")
    var centroids: Array[Centroid] = seeds.map(_.toArray).toArray
    val lifetime = new Array[Long](k)
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    for (iter <- 0 until iters) {
      val batch =
        if (mod <= 1L) ne
        else ne.filter(pmod(xxhash64(col("_id"), lit(iter)), lit(mod)) === 0)
      val stats = batch
        .select(graft.expressions.GraftFunctions
          .nearestCell(col("_ne"), centroids.toSeq.map(_.toSeq))
          .cast("int").as("cell"), col("_ne"))
        .groupBy(col("cell"))
        .agg(graft.expressions.GraftFunctions.vectorSum(col("_ne")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.clone()
      stats.foreach { r =>
        require(!r.isNullAt(0),
          "nearest_cell returned NULL during training: corrupt vector dims")
        val c = r.getInt(0)
        val s = r.getSeq[Double](1)
        val bn = r.getLong(2)
        lifetime(c) += bn
        val eta = bn.toDouble / lifetime(c)
        next(c) = next(c).zip(s).map { case (old, sum) =>
          (1.0 - eta) * old + eta * (sum / bn)
        }
      }
      centroids = next
    }
    centroids.toSeq
  }

  /** Deterministic Lloyd's k-means on a bounded sample (first `sampleN`
    * vectors in vec_id order — `orderBy().limit()` plans as
    * TakeOrderedAndProject, a per-partition top-N + driver merge, not a
    * global sort; init = first k distinct vectors), on the unit sphere.
    */
  def fitCentroids(corpus: DataFrame, idCol: String, embCol: String,
                   k: Int, iters: Int = 10, sampleN: Int = 2000): Seq[Centroid] = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleN)
      .select(col(embCol)).collect()
      .map(r => unit(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    // seed with the first k DISTINCT vectors: duplicate seeds (the norm
    // in a dedup-target corpus) would start identical centroids, and the
    // strict-< assignment starves the later twin into a dead cell
    val distinctSeeds = sample.iterator.map(_.toSeq).distinct.take(k).toVector
    require(distinctSeeds.size >= k,
      s"only ${distinctSeeds.size} distinct vectors in the sample for k=$k")
    var centroids: Array[Centroid] = distinctSeeds.map(_.toArray).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = dist2(v, centroids(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids.toSeq
  }

  /** Squared L2 distances to every centroid: ONE matrix literal + one
    * `transform` loop — not `centroids.size` unrolled aggregates, whose
    * expression tree (k × dims literal nodes, each re-inlining the
    * normalization subtree) blows past codegen limits and falls back to
    * interpreted evaluation.
    */
  private def distsFromNe(ne: Column, centroids: Seq[Centroid]): Column =
    transform(typedLit(centroids.map(_.toSeq)), c =>
      aggregate(zip_with(ne, c, (x, y) => {
        val d = x - y; d * d
      }), lit(0.0), (acc, x) => acc + x))

  private def cellOfNe(ne: Column, centroids: Seq[Centroid]): Column = {
    val dists = distsFromNe(ne, centroids)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  private def probeCellsNe(ne: Column, centroids: Seq[Centroid],
                           nprobe: Int): Column = {
    val dists = distsFromNe(ne, centroids)
    slice(transform(array_sort(
      zip_with(dists, sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))),
      e => e.getField("i")), 1, nprobe)
  }

  /** Column: index (0-based) of the nearest centroid by L2 distance on
    * the unit sphere (= cosine order). Interpreted form — prefer
    * `cellOfNative` on the corpus-side hot path.
    */
  def cellOf(emb: Column, centroids: Seq[Centroid]): Column =
    cellOfNe(normalized(emb), centroids)

  /** Corpus-side cell assignment as a native codegen expression —
    * bit-identical to `cellOf` but a tight loop per row instead of
    * k × dims interpreted lambdas (higher-order functions never codegen).
    */
  def cellOfNative(df: DataFrame)(emb: Column, centroids: Seq[Centroid]): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    graft.expressions.GraftFunctions.nearestCell(emb, centroids.map(_.toSeq))
      .cast("int")
  }

  /** Group `centroids` under ~√k COARSE means: a pure-driver Lloyd's
    * over the k centroid points themselves (k rows — trivial work),
    * deterministic (seeds = first g centroids, first-minimal
    * assignment). Returns (coarse means, member index lists); groups
    * that end empty are dropped. Support structure for
    * [[cellOfTwoLevelNative]].
    */
  def coarseGroups(cents: Seq[Centroid],
                   iters: Int = 10): (Seq[Centroid], Seq[Seq[Int]]) = {
    require(cents.nonEmpty, "no centroids to group")
    val k = cents.length
    val g = math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
    def d2(a: Centroid, b: Centroid): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var means: IndexedSeq[Centroid] = cents.take(g).map(_.clone()).toIndexedSeq
    var assign = new Array[Int](k)
    (0 until iters).foreach { _ =>
      var i = 0
      while (i < k) {
        var best = 0; var bd = Double.MaxValue; var gi = 0
        while (gi < means.length) {
          val d = d2(cents(i), means(gi))
          if (d < bd) { bd = d; best = gi }
          gi += 1
        }
        assign(i) = best; i += 1
      }
      means = means.indices.map { gi =>
        val mem = (0 until k).filter(assign(_) == gi)
        if (mem.isEmpty) means(gi)
        else {
          val m = new Array[Double](cents(0).length)
          mem.foreach { i2 =>
            var j = 0
            while (j < m.length) { m(j) += cents(i2)(j); j += 1 }
          }
          var j = 0
          while (j < m.length) { m(j) /= mem.length; j += 1 }
          m
        }
      }
    }
    val byGroup = (0 until k).groupBy(assign(_))
    val live = means.indices.filter(byGroup.contains)
    (live.map(means(_)), live.map(gi => byGroup(gi).toSeq))
  }

  /** Above this cell count the flat per-row centroid scan (O(k·d)) is
    * the dominant cost — with k following the corpus (the
    * dedup-blocking regime) it is the N^1.5 term of the r8 scale notes
    * — so [[graft.analytics.Similarity.semanticDedupAuto]] switches to
    * the coarse-fine assignment at this point.
    */
  val twoLevelCellThreshold = 256

  /** COARSE-FINE cell assignment (native codegen,
    * [[graft.expressions.TwoLevelNearestCell]]): scan the ~√k coarse
    * means, probe the `probeGroups` nearest groups, argmin over only
    * their members — O(√k·d) per row instead of O(k·d). The result is
    * the flat argmin RESTRICTED to the probed groups (boundary vectors
    * may land in a neighboring cell — dedup blocking tolerates this:
    * pairs are verified by exact cosine, and blocking is approximate by
    * construction); `probeGroups = #groups` degrades to the exact flat
    * scan.
    */
  def cellOfTwoLevelNative(df: DataFrame)(emb: Column,
                                          centroids: Seq[Centroid],
                                          probeGroups: Int = 2): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val (coarse, members) = coarseGroups(centroids)
    graft.expressions.GraftFunctions.twoLevelCell(emb,
      coarse.map(_.toSeq), members, centroids.map(_.toSeq), probeGroups)
      .cast("int")
  }

  /** Columns: indices of the `nprobe` nearest centroids. Interpreted
    * form — prefer `probeCellsNative` on hot query sides.
    */
  def probeCells(emb: Column, centroids: Seq[Centroid], nprobe: Int): Column =
    probeCellsNe(normalized(emb), centroids, nprobe)

  /** Query-side probe as a native codegen expression — bit-identical to
    * `probeCells` (same distances, tie order, NaN placement) but one
    * bounded insertion-sort loop per row instead of k × dims interpreted
    * lambdas plus a k-element sort. The difference between batch-ANN
    * over millions of query rows finishing and not.
    */
  def probeCellsNative(df: DataFrame)(emb: Column, centroids: Seq[Centroid],
                                      nprobe: Int): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    graft.expressions.GraftFunctions
      .nearestCells(emb, centroids.map(_.toSeq), nprobe)
  }

  /** Top-k per query, probing `nprobe` cells. Both the corpus-side cell
    * assignment and the query-side probe are native codegen expressions.
    */
  def searchTopK(corpus: DataFrame, queries: DataFrame,
                 centroids: Seq[Centroid], k: Int, nprobe: Int): DataFrame = {
    val cell = corpus
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce"),
        cellOfNative(corpus)(col("embedding"), centroids).as("cell"))
    searchCells(cell, queries, centroids, k, nprobe)
  }

  /** Shared scoring tail: `cells` is (neighbor_id, ce, cell). */
  private def searchCells(cells: DataFrame, queries: DataFrame,
                          centroids: Seq[Centroid], k: Int,
                          nprobe: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qe"),
        explode(probeCellsNative(queries)(col("embedding"), centroids,
          nprobe)).as("cell"))
    val scored = cells.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        Similarity.q6(Similarity.cosineNative(cells)(col("qe"), col("ce"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }

  /** Topic-cluster profile — the report a corpus-clustering run releases:
    * assign every vector to its nearest centroid (spherical k-means
    * cells, the same geometry the IVF index partitions by) and roll up
    * per cluster: size and the majority label with its count (the
    * "purity" signal when an external label exists; with unlabeled data
    * pass a constant). Integer-exact output, so any engine reproduces it
    * from centroid literals.
    *
    * 100 TB shape: assignment is the native codegen [[cellOfNative]]
    * (map-only); the (cell, label) count is map-side combinable; the
    * majority pick is a window over ≤ k·|labels| rows — the corpus
    * shuffles once, on the tiny (cell, label) key.
    */
  def clusterProfile(vecs: DataFrame, centroids: Seq[Centroid]): DataFrame = {
    val assigned = vecs.select(
      cellOfNative(vecs)(col("embedding"), centroids).cast("int").as("cluster"),
      col("label"))
    val byLabel = assigned.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n").desc, col("label"))
    byLabel
      .withColumn("rk", row_number().over(w))
      .withColumn("n_vecs", sum(col("n")).over(
        Window.partitionBy(col("cluster"))))
      .withColumn("n_labels", count(lit(1)).over(
        Window.partitionBy(col("cluster"))))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("n_vecs").cast("long").as("n_vecs"),
        col("n_labels").cast("long").as("n_labels"),
        col("label").as("top_label"), col("n").as("top_label_n"))
  }

  /** Materialize the IVF INDEX: the corpus with its cell assignment,
    * written as cell-PARTITIONED parquet. Build once, search many — the
    * production IVF split the reference's in-memory search cannot make.
    * At 100 TB the index build is one map-only pass (native cell
    * assignment, no shuffle — partitionBy splits files per cell within
    * each task's partition).
    */
  def writeIndex(corpus: DataFrame, centroids: Seq[Centroid],
                 path: String, mode: String = "overwrite"): Unit =
    corpus
      .select(col("vec_id"), col("embedding"),
        cellOfNative(corpus)(col("embedding"), centroids).as("cell"))
      .write.mode(mode).partitionBy("cell").parquet(path)

  /** Streaming index maintenance: append one micro-batch of new vectors
    * into the cell-partitioned index — the same map-only cell assignment,
    * `mode=append` so existing cell directories gain files and new cells
    * appear; partition pruning in [[searchIndexTopK]] is unaffected. At
    * 100 TB this is the crawl-ingest path: the index grows per batch
    * without ever rewriting the corpus.
    */
  def appendIndex(batch: DataFrame, centroids: Seq[Centroid],
                  path: String): Unit =
    writeIndex(batch, centroids, path, mode = "append")

  /** Search a written index: the probed cell set (≤ queries × nprobe
    * distinct values, collected driver-side — bounded by the query
    * batch, never the corpus) becomes a PARTITION FILTER on the index
    * scan, so only the probed cells' files are read — at 100 TB with
    * k = 65536 cells and nprobe = 64, 1/1000th of the corpus. The scan
    * shape is asserted in PlanSpec (PartitionFilters, not a full scan).
    */
  def searchIndexTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, centroids: Seq[Centroid],
                      k: Int, nprobe: Int): DataFrame = {
    val probed = queries
      .select(explode(probeCellsNative(queries)(col("embedding"), centroids,
        nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0))
    val index = spark.read.parquet(path)
      .filter(col("cell").isin(probed.toSeq: _*))
      .select(col("cell").cast("int").as("cell"),
        col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    searchCells(index, queries, centroids, k, nprobe)
  }
}
