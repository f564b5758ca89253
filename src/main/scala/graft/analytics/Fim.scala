package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
  * Training of Language Models to Fill in the Middle"): a document is
  * split at two points into (prefix, middle, suffix) and re-serialized
  * with sentinels so an autoregressive model learns infilling — PSM
  * (`<PRE> p <SUF> s <MID> m`) and the SPM variant the paper found
  * slightly stronger (`<SUF> s <PRE> p <MID> m`), chosen per document.
  *
  * Everything is a pure function of (doc_id, text): the two cut points
  * and the mode derive from md5 of the id (the engine's portable hash),
  * so the transform is reproducible across reruns/engines and is a
  * map-only projection — no shuffle, no state, applies at any corpus
  * size as a scan.
  */
object Fim {

  private def h32(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** (doc_id, mode, fim) rows; documents shorter than 3 chars pass
    * through unsplit as mode 'raw'.
    */
  def transform(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val len = length(text)
    // two independent cuts in [1, len-1], ordered
    val a = (h32("fim-a:", id) % greatest(len - 1, lit(1))) + 1
    val b = (h32("fim-b:", id) % greatest(len - 1, lit(1))) + 1
    val c1 = least(a, b)
    val c2 = greatest(a, b)
    val p = text.substr(lit(1), c1)
    val m = text.substr(c1 + 1, c2 - c1)
    val sfx = text.substr(c2 + 1, len - c2)
    val spm = h32("fim-m:", id) % 2 === 0
    docs.select(
      id.as("doc_id"),
      when(len.isNull || len < 3, lit("raw"))
        .when(spm, lit("spm")).otherwise(lit("psm")).as("mode"),
      when(len.isNull || len < 3, text)
        .when(spm, concat(lit("<SUF>"), sfx, lit("<PRE>"), p,
          lit("<MID>"), m))
        .otherwise(concat(lit("<PRE>"), p, lit("<SUF>"), sfx,
          lit("<MID>"), m)).as("fim"))
  }
}
