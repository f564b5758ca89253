package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Similarity, TextAnalysis}

/** LLM-training-corpus operators over `documents` / `embeddings`:
  * deduplication (exact, Jaccard, MinHash+LSH, SimHash), similarity search
  * (brute-force + LSH ANN), text analysis (token stats, lang-ID, quality,
  * fingerprints). The un-oracled entries (LSH variants) are verified by
  * dedicated ScalaTest specs instead (recall vs the exact computation).
  */
object CorpusQueries extends QueryGroup {

  private val enList = Seq("the", "a", "and", "of", "to")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        round(TextAnalysis.avgTokenLen(col("text")), 4).as("avg_token_len"),
        TextAnalysis.stopwordHits(col("text"), enList).as("stop_hits_en"),
        TextAnalysis.tokenCountBpeIsh(col("text")).as("bpe_ish_tokens"))),

    "a_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    "a_quality_score" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))),

    "a_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.prefixFingerprint(col("text"), 8).as("prefix_fp"))),

    "a_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"))),

    "a_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"),
        floor(col("doc_id") / 100).cast("long"), 0.9)),

    "a_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"),
        shingleSize = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.8)),

    "a_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3)),

    "a_embed_norms" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(Similarity.norm(col("embedding")), 6).as("norm"))),

    "a_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") % 100 === 0), e, 5)
    }),

    "a_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val b = e.select(floor(col("vec_id") / 50).cast("long").as("bucket"),
        col("vec_id"), col("embedding"))
      val l = b.select(col("bucket"), col("vec_id").as("id_a"),
        col("embedding").as("ea"))
      val r = b.select(col("bucket").as("bucket_r"), col("vec_id").as("id_b"),
        col("embedding").as("eb"))
      l.join(r, col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
        .withColumn("sim", round(Similarity.cosineNative(e)(col("ea"), col("eb")), 6))
        .filter(col("sim") >= 0.3)
        .select(col("id_a"), col("id_b"), col("sim"))
    }),

    "a_ann_lsh" -> ((s, dir) =>
      Similarity.annLsh(t(s, dir, "embeddings"), dims = 64, nBits = 8,
        minSim = 0.3)),

    // IVF ANN: k-means cells fitted on a bounded sample, nprobe-cell search
    // (rows-only for the driver; recall vs brute force asserted in
    // CoordinatorIvfSpec)
    "a_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val centroids = graft.analytics.Ivf.fitCentroids(e, "vec_id",
        "embedding", k = 16)
      graft.analytics.Ivf.searchTopK(e, e.filter(col("vec_id") % 100 === 0),
        centroids, k = 5, nprobe = 4)
    })
  )

  private val enIn = enList.map(w => s"'$w'").mkString("(", ",", ")")
  private val allStop = TextAnalysis.langStopwords.flatMap(_._2)
    .map(w => s"'$w'").mkString("(", ",", ")")

  def oracles: Map[String, String] = Map(
    "a_text_stats" ->
      s"""SELECT doc_id,
         | len(string_split(text,' ')) AS n_tokens,
         | round((length(text) - len(string_split(text,' ')) + 1)*1.0
         |   / len(string_split(text,' ')), 4) AS avg_token_len,
         | len(list_filter(string_split(text,' '), w -> w IN $enIn)) AS stop_hits_en,
         | list_sum(list_transform(string_split(text,' '),
         |   w -> 1 + CAST(floor(length(w)/5.0) AS BIGINT))) AS bpe_ish_tokens
         |FROM documents""".stripMargin,

    "a_lang_id" ->
      """WITH sc AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), w -> w IN ('the','a','and','of','to'))) AS en,
        |  len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS de,
        |  len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les','des'))) AS fr,
        |  len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','una','por'))) AS es
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN en>0 AND en>=de AND en>=fr AND en>=es THEN 'en'
        |      WHEN de>0 AND de>=fr AND de>=es THEN 'de'
        |      WHEN fr>0 AND fr>=es THEN 'fr'
        |      WHEN es>0 THEN 'es' ELSE 'unknown' END AS lang_pred
        |FROM sc""".stripMargin,

    "a_quality_score" ->
      s"""WITH b AS (SELECT doc_id,
         |  len(string_split(text,' '))*1.0 AS nt,
         |  len(list_filter(string_split(text,' '), w -> w IN $allStop))*1.0 AS sh,
         |  length(text)*1.0 AS lc
         | FROM documents)
         |SELECT doc_id, floor((
         |  least(nt/50.0, 1.0)*0.4
         |  + least((sh/nt)*5.0, 1.0)*0.3
         |  + greatest(1.0 - abs(((lc-nt+1)/nt) - 5.0)/10.0, 0.0)*0.3) * 10000) / 10000.0 AS quality
         |FROM b""".stripMargin,

    "a_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        | md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS prefix_fp
        |FROM documents""".stripMargin,

    "a_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "a_jaccard_pairs" ->
      """WITH s AS (SELECT doc_id, CAST(floor(doc_id/100) AS BIGINT) AS b,
        |  list_distinct(string_split(text,' ')) AS toks FROM documents)
        |SELECT id_a, id_b, jaccard FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.toks, b.toks))*1.0
        |    / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        | FROM s a JOIN s b ON a.b = b.b AND a.doc_id < b.doc_id) p
        |WHERE jaccard >= 0.9""".stripMargin,

    "a_embed_norms" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        | round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS norm
        |FROM embeddings""".stripMargin,

    "a_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id%100 = 0),
        | sc AS (SELECT qid, vec_id AS neighbor_id,
        |   round(list_cosine_similarity(embedding::DOUBLE[], qe), 6) AS sim
        |  FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid AS query_id,
        | CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS INT) AS rk,
        | neighbor_id, sim
        |FROM sc
        |QUALIFY rk <= 5""".stripMargin,

    "a_cosine_pairs" ->
      """WITH b AS (SELECT CAST(floor(vec_id/50) AS BIGINT) AS bucket, vec_id,
        |  embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT id_a, id_b, sim FROM (
        | SELECT a.vec_id AS id_a, c.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, c.e), 6) AS sim
        | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) p
        |WHERE sim >= 0.3""".stripMargin
  )

  override val duckdbOnly: Set[String] = Set(
    "a_text_stats", "a_lang_id", "a_quality_score", "a_fingerprint",
    "a_jaccard_pairs", "a_embed_norms", "a_ann_topk", "a_cosine_pairs")
}
