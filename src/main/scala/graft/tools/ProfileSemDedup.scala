package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for a_semantic_dedup (not part of the library
  * surface): times the pair stage and the cluster stage separately,
  * three repetitions each, to separate real cost from machine noise.
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    val cents = graft.analytics.Ivf.pretrainedCentroids(k = 16, dims = 64)
    (1 to 3).foreach { r =>
      var t0 = System.nanoTime()
      val pairs = graft.analytics.Similarity
        .semanticPairs(emb, cents, minSim = 0.3)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      val np = pairs.count()
      val t1 = System.nanoTime()
      val clusters = graft.analytics.Dedup.dedupClusters(
        emb.select(col("vec_id").as("doc_id")), pairs)
      val nc = clusters.count()
      val t2 = System.nanoTime()
      println(f"[profile] rep $r pairs=$np ${(t1 - t0) / 1e9}%.2f s, " +
        f"clusters=$nc ${(t2 - t1) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
