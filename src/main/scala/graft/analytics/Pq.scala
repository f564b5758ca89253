package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the 1B-vector MEMORY path of approximate
  * nearest neighbour (IVF-PQ): split each L2-normalized vector into `m`
  * contiguous subvectors, quantize each against its own `ksub`-centroid
  * codebook, and store only the `m` small code ints. 64 float dims
  * (256 B) collapse to 8 codes (8 B) at m=8 — a 100 TB embedding corpus
  * whose raw vectors cannot fit executor memory keeps its ENTIRE code
  * table in a fraction of one node. Search is asymmetric (ADC): the
  * query stays exact and scores against the codebook RECONSTRUCTION of
  * each candidate — no decode of the corpus ever materializes more than
  * the probed candidates.
  *
  * Scale shape: encoding is the map-only native codegen
  * [[graft.expressions.PqEncode]] (one corpus scan, no shuffle); search
  * broadcasts the query side exactly like `Similarity.bruteForceTopK`
  * but against the 30×-smaller code column. Compose with
  * [[Ivf.cellOfNative]] cells for the standard IVF-PQ layout (cells
  * prune candidates, codes bound memory).
  */
object Pq {

  /** m × ksub × dsub. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Deterministic "pretrained" codebooks (fixed-seed LCG, like
    * [[Ivf.pretrainedCentroids]]): each centroid is scaled to norm
    * `1/√m` — the average subvector norm of a unit vector — so random
    * codebooks sit in the geometry the data occupies. Literal-exact for
    * external oracles; [[fitCodebooks]] is the data-fitted trainer.
    */
  def pretrainedCodebooks(m: Int, ksub: Int, dsub: Int): Codebooks =
    Array.tabulate(m) { sub =>
      Array.tabulate(ksub) { c =>
        var s = 0x9E3779B97F4A7C15L ^ (sub * 0xC2B2AE3D27D4EB4FL) ^
          (c * 0x165667B19E3779F9L)
        val raw = Array.fill(dsub) {
          s = s * 6364136223846793005L + 1442695040888963407L
          ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
        }
        var n2 = 0.0
        var i = 0
        while (i < dsub) { n2 += raw(i) * raw(i); i += 1 }
        val scale = 1.0 / (math.sqrt(n2) * math.sqrt(m.toDouble))
        raw.map(_ * scale)
      }
    }

  /** Data-fitted codebooks: per-subspace k-means — `m` independent small
    * trainings over the sliced, normalized corpus through the
    * distributed Lloyd's machinery ([[Ivf.fitCentroidsDistributed]] on
    * `slice(normalized, sub·dsub+1, dsub)` columns; only ksub rows reach
    * the driver per iteration per subspace). [[pretrainedCodebooks]] is
    * the literal-exact variant external oracles replay.
    */
  def fitCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                   m: Int, ksub: Int, iters: Int = 5): Codebooks = {
    val dims = corpus.select(size(col(embCol))).head.getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val dsub = dims / m
    Array.tabulate(m) { sub =>
      val sliced = corpus.select(col(idCol),
        slice(col(embCol), sub * dsub + 1, dsub).as("_sub"))
      Ivf.fitCentroidsDistributed(sliced, idCol, "_sub", k = ksub,
        iters = iters).map(_.clone()).toArray
    }
  }

  /** `array<int>` PQ codes via the native codegen expression. */
  def encodeNative(df: DataFrame)(emb: Column, cbs: Codebooks): Column = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    graft.expressions.GraftFunctions.pqEncode(emb,
      cbs.toSeq.map(_.toSeq.map(_.toSeq)))
  }

  /** Codebook reconstruction of a code column — the decode side of ADC
    * scoring. Runs only on probed candidates, never the whole corpus.
    */
  def reconstruct(codes: Column, cbs: Codebooks): Column = {
    val cbLit = typedLit(cbs.toSeq.map(_.toSeq.map(_.toSeq)))
    flatten(transform(sequence(lit(0), lit(cbs.length - 1)),
      i => element_at(element_at(cbLit, i + 1),
        element_at(codes, i + 1) + 1)))
  }

  /** Asymmetric-distance top-k: corpus carries ONLY its PQ codes; each
    * query scores exact-vs-reconstruction. Output
    * `(query_id, rk, neighbor_id, sim_pq)`.
    */
  def searchTopK(corpus: DataFrame, queries: DataFrame, cbs: Codebooks,
                 k: Int): DataFrame = {
    val coded = corpus.select(col("vec_id").as("neighbor_id"),
      encodeNative(corpus)(col("embedding"), cbs).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val scored = coded.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_pq", Similarity.q6(
        Similarity.cosineNative(corpus)(col("qe"),
          reconstruct(col("codes"), cbs))))
    rank(scored, k)
  }

  /** IVF-PQ: the standard 1B-vector layout — coarse cells prune the
    * candidate set (queries probe `nprobe` cells), PQ codes bound
    * memory. The corpus side of the join carries only (cell, codes):
    * one map-only pass assigns both with native codegen expressions,
    * raw vectors never enter the join, and the probed-cells equi-join
    * replaces the brute-force cross join.
    */
  def searchTopKIvf(corpus: DataFrame, queries: DataFrame,
                    centroids: Seq[Ivf.Centroid], cbs: Codebooks,
                    k: Int, nprobe: Int): DataFrame = {
    val coded = corpus.select(col("vec_id").as("neighbor_id"),
      Ivf.cellOfNative(corpus)(col("embedding"), centroids).as("cell"),
      encodeNative(corpus)(col("embedding"), cbs).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      explode(Ivf.probeCellsNative(queries)(col("embedding"), centroids,
        nprobe)).as("cell"))
    val scored = coded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_pq", Similarity.q6(
        Similarity.cosineNative(corpus)(col("qe"),
          reconstruct(col("codes"), cbs))))
    rank(scored, k)
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_pq").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim_pq"))
  }
}
