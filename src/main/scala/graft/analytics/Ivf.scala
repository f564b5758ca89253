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

  /** Deterministic Lloyd's k-means on a bounded sample (first `sampleN`
    * vectors in vec_id order; init = first k distinct vectors).
    */
  def fitCentroids(corpus: DataFrame, idCol: String, embCol: String,
                   k: Int, iters: Int = 10, sampleN: Int = 2000): Seq[Centroid] = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleN)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    var centroids: Array[Centroid] = sample.take(k).map(_.clone())
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

  /** Column: index (0-based) of the nearest centroid by L2 distance. */
  def cellOf(emb: Column, centroids: Seq[Centroid]): Column = {
    val dists = array(centroids.map { c =>
      val cl = typedLit(c.toSeq)
      aggregate(zip_with(emb, cl, (x, y) => {
        val d = x.cast("double") - y; d * d
      }), lit(0.0), (acc, x) => acc + x)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Columns: indices of the `nprobe` nearest centroids. */
  def probeCells(emb: Column, centroids: Seq[Centroid], nprobe: Int): Column = {
    val dists = array(centroids.map { c =>
      val cl = typedLit(c.toSeq)
      aggregate(zip_with(emb, cl, (x, y) => {
        val d = x.cast("double") - y; d * d
      }), lit(0.0), (acc, x) => acc + x)
    }: _*)
    slice(transform(array_sort(
      zip_with(dists, sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))),
      e => e.getField("i")), 1, nprobe)
  }

  /** Top-k per query, probing `nprobe` cells. */
  def searchTopK(corpus: DataFrame, queries: DataFrame,
                 centroids: Seq[Centroid], k: Int, nprobe: Int): DataFrame = {
    val cell = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      cellOf(col("embedding"), centroids).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      explode(probeCells(col("embedding"), centroids, nprobe)).as("cell"))
    val scored = cell.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round(Similarity.cosineNative(corpus)(col("qe"), col("ce")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }
}
