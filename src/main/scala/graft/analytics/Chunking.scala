package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the standard RAG/pretraining
  * preprocessing step that turns long documents into fixed-budget,
  * stride-overlapped chunks (window W tokens, stride S < W so each
  * boundary appears in two chunks and no span is ever split without
  * context).
  *
  * 100 TB shape: pure map-only explode — `sequence` generates the chunk
  * starts per row, `slice` materializes each window from the document's
  * own token array; no shuffle, no state, output size is a predictable
  * ~W/S expansion. The chunk content is carried as an md5 fingerprint +
  * bounds so downstream dedup/packing join on 16 bytes, not the text;
  * re-slicing from the source column is free at read time because the
  * (doc_id, start_tok, n_tokens) triple is the chunk's address.
  */
object Chunking {

  /** One row per chunk: (doc_id, chunk_idx, start_tok, n_tokens,
    * chunk_md5).
    */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        size(slice(col("toks"), col("col") + 1, lit(window))).cast("long")
          .as("n_tokens"),
        md5(array_join(slice(col("toks"), col("col") + 1, lit(window)), " "))
          .as("chunk_md5"))
  }
}
