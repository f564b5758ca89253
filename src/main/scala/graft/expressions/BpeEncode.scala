package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a trained BPE merge table to a
  * document in ONE pass over the text — the tokenizer-APPLICATION half
  * of byte-pair encoding ([[graft.analytics.Vocabulary.bpeMerges]] is
  * the training half). Emits the final subword token array.
  *
  * Semantics are exactly the trainer's: per word, start from the
  * character sequence and apply each merge in rank order as a
  * left-to-right non-overlapping fuse over the PRE-merge sequence (the
  * space-sentineled `replace` contract — after a fuse, the immediately
  * following pair is consumed verbatim because its leading sentinel was
  * part of the replaced text). That makes the expression bit-equal to a
  * chain of SQL `replace` calls in any engine, which is what the oracle
  * does.
  *
  * Scale shape: a map-only projection — the merge table rides along as
  * two small reference arrays (broadcast once per executor, like every
  * codegen literal), no join against a merge table, no explode of the
  * text. The per-word cost is O(merges × word_len) here; the production
  * 32k-merge path keeps the same left-to-right contract but looks
  * adjacent pairs up in a rank map and fuses lowest-rank-first, which
  * visits only pairs that actually occur — the learned segmentation is
  * identical because a fuse can only create pairs of equal-or-later
  * rank.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }

  private lazy val w1 = merges.map(_._1).toArray
  private lazy val w2 = merges.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeTokens(input.asInstanceOf[UTF8String], w1, w2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeW1", w1, "java.lang.String[]")
    val bRef = ctx.addReferenceObj("bpeW2", w2, "java.lang.String[]")
    val cls = BpeEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $cls.encodeTokens($in, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** One merge pass over a symbol sequence with the replace contract:
    * on a fuse, the next symbol is consumed verbatim (its leading
    * sentinel belonged to the replaced span).
    */
  private def pass(syms: ArrayBuffer[String], a: String,
                   b: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        if (i + 2 < syms.length) out += syms(i + 2)
        i += 3
      } else {
        out += syms(i)
        i += 1
      }
    }
    out
  }

  def encodeTokens(text: UTF8String, w1: Array[String],
                   w2: Array[String]): ArrayData = {
    val out = new ArrayBuffer[UTF8String]()
    text.toString.split(" ", -1).foreach { word =>
      if (word.nonEmpty) {
        var syms = new ArrayBuffer[String](word.length)
        word.foreach(c => syms += c.toString)
        var m = 0
        while (m < w1.length) {
          if (syms.length >= 2) syms = pass(syms, w1(m), w2(m))
          m += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
