package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-permutation MinHash with rotation densification: a `k`-slot
  * signature computed by hashing every shingle ONCE — O(shingles + k) per
  * document instead of [[MinHashSignature]]'s O(shingles × k).
  *
  * Scheme (public literature): Li, Owen & Zhang, "One Permutation
  * Hashing" (NIPS 2012) — hash each element once, split the hash range
  * into `k` bins, keep the per-bin minimum; Shrivastava & Li, "Densifying
  * One Permutation Hashing via Rotation" (ICML 2014) — an empty bin
  * borrows the nearest non-empty bin's value to its cyclic right, offset
  * by the borrow distance so distinct-distance borrows decorrelate.
  * Each densified slot agrees between two documents with probability
  * ≈ their Jaccard similarity (the matched-sample estimator is unbiased),
  * so the signature drops into the same LSH banding as the classic
  * per-permutation form.
  *
  * At the auto-derived banding sizes (bands × rowsPerBand grows to
  * 100s of permutations as the corpus grows — `Dedup.lshParams`), the
  * classic signature's shingles × permutations inner loop dominates the
  * whole dedup pipeline; this form makes signature cost independent of
  * the permutation count (one xxhash64 + one multiply-add per shingle).
  */
case class OnePermMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"slot count k=$k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"oneperm_minhash expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      // bin from the hash's low-entropy-safe unsigned remainder; slot
      // value from a second multiply-add (decorrelates value from bin)
      val bin = ((h & Long.MaxValue) % k).toInt
      val v = h * OnePermMinHash.ValueA + OnePermMinHash.ValueB
      if (v < mins(bin)) mins(bin) = v
      i += 1
    }
    OnePermMinHash.densify(mins)
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val oph = OnePermMinHash.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val bin = ctx.freshName("bin")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  int $bin = (int) (($h & Long.MAX_VALUE) % $k);
         |  long $v = $h * ${OnePermMinHash.ValueA}L + ${OnePermMinHash.ValueB}L;
         |  if ($v < $mins[$bin]) $mins[$bin] = $v;
         |}
         |$oph.densify($mins);
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OnePermMinHash {
  /** Universal-hash constants for the slot value (odd multiplier —
    * invertible mod 2⁶⁴; same splitmix64 derivation as
    * [[MinHashSignature]]'s permutation table, indices 0/1).
    */
  final val ValueA: Long = {
    var x = 1L + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    (x ^ (x >>> 31)) | 1L
  }
  final val ValueB: Long = {
    var x = 2L + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Rotation densification in place: an empty bin (`Long.MaxValue`
    * sentinel) takes the value of the nearest non-empty bin to its cyclic
    * RIGHT plus the borrow distance (Shrivastava & Li's offset — two
    * documents borrowing the same source bin from the same distance still
    * agree; different distances do not alias to a fake agreement with a
    * non-borrowed slot). A document with no shingles at all gets a
    * position-keyed constant fill (two empty documents agree everywhere;
    * the exact-Jaccard verify stage then drops the 0/0 pair).
    *
    * Called from generated code — must stay a public static-forwardable
    * method on this object.
    */
  def densify(mins: Array[Long]): Unit = {
    val k = mins.length
    // lowest non-empty bin — the cyclic-right neighbor of the top suffix
    var first = 0
    while (first < k && mins(first) == Long.MaxValue) first += 1
    if (first == k) {
      // no shingles at all: position-keyed splitmix fill (two empty
      // documents agree everywhere; the exact-Jaccard verify stage then
      // drops the 0/0 pair)
      var i = 0
      while (i < k) {
        var x = i + 0x9E3779B97F4A7C15L
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        mins(i) = x ^ (x >>> 31)
        i += 1
      }
      return
    }
    // ONE descending pass: each index only ever modifies itself, so the
    // emptiness test at lower indices always sees original state. carry =
    // the nearest original non-empty value at a HIGHER index (cyclically:
    // seeded with bin `first`, which is the right-neighbor of the all-
    // empty top suffix), dist = its cyclic distance to the current bin.
    var carry = mins(first)
    var dist = first.toLong // pre-increments to first+1 at i = k-1
    var i = k - 1
    while (i >= 0) {
      if (mins(i) != Long.MaxValue) { carry = mins(i); dist = 0L }
      else { dist += 1L; mins(i) = carry + dist }
      i -= 1
    }
  }
}
