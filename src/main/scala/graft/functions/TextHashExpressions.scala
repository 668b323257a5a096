package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot paths.
  *
  * Spark's higher-order functions (`transform`, `filter`, `aggregate`)
  * evaluate their lambda interpreted — measured ~15–50 µs per element on
  * the shingle pipelines, which made every HOF formulation of shingling/
  * SimHash the dominant cost of the dedup operators. These expressions do
  * the same work in one tight JVM loop per row (whole-stage codegen via a
  * static helper call), using the same XXH64 primitive as Spark's
  * `xxhash64` (seed 42).
  *
  * Semantics (vs the reference, littletable has none of this —
  * BASELINE.json north-star operators): a shingle's hash chains the
  * per-word XXH64 exactly like multi-argument `xxhash64(w1..wn)` chains
  * its children, so values are stable and engine-reproducible.
  */
object TextHashUtil {
  final val Seed = 42L

  /** Distinct hashes of all n-word shingles, first-occurrence order. */
  def shingleHashSet(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val count = m - n + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var outLen = 0
    var i = 0
    while (i < count) {
      var h = Seed
      var k = 0
      while (k < n) {
        h = XXH64.hashUTF8String(words.getUTF8String(i + k), h)
        k += 1
      }
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** 64-bit SimHash: per-bit majority of per-word XXH64 hashes
    * (duplicates counted; ties → 0, matching `±1-sum > 0`). */
  def simhash64(words: ArrayData): Long = {
    val m = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = XXH64.hashUTF8String(words.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > m) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature from a shingle-hash set: for each seed, the min
    * (signed order) of a splitmix64-style bijective mix of the full
    * 64-bit shingle hash. Any fixed bijection + fixed total order gives
    * the MinHash property P(minA == minB) = J(A,B).
    *
    * History: this replaced a bounded-coefficient affine family
    * `(a·h32+b) mod p` with a,b < 2^30 (chosen to avoid ANSI overflow
    * when this ran as SQL arithmetic). Bounding the coefficients made
    * the map near-MONOTONIC over 32-bit inputs (at most one modular
    * wrap), so every "permutation" shared the same minima — signature
    * agreement collapsed to 0 even at Jaccard 0.99, caught by the sf0.1
    * recall gate. In this static JVM helper 64-bit wrap-around
    * multiplication is well-defined, so a real mix is free. */
  def minhashSig(shingleHashes: ArrayData, seeds: Array[Long]): ArrayData = {
    val numHashes = seeds.length
    val m = shingleHashes.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = shingleHashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        var x = h + seeds(j)
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^= (x >>> 31)
        if (x < out(j)) out(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait WordsArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} needs array<string> input, got $other")
  }
}

/** Distinct n-word shingle hashes of a words array (codegen'd). */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with WordsArrayInput {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleHashSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of a words array (codegen'd). */
case class SimHash64(child: Expression)
    extends UnaryExpression with WordsArrayInput {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a shingle-hash-set array (codegen'd). The
  * permutation constants live in a codegen object reference, not in the
  * expression tree — numHashes=64 would otherwise be 128 literals. */
case class MinHashSignature(child: Expression, seeds: Array[Long])
    extends UnaryExpression {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSig(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.minhashSig($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Search-normalized word array of a text column (codegen'd) — the full
  * reference pipeline (stopwords, plural singularization, acronyms,
  * significant endings; littletable.py:1616-1699) as a native expression
  * instead of a Scala UDF: stays inside whole-stage codegen (no UDF
  * encoder round-trip per row), with the stopword set riding along as a
  * codegen reference object.
  *
  * `sortedSet=false`: first-occurrence-distinct normalized words (the
  * inverted-index build shape). `sortedSet=true`: sorted distinct words
  * minus stopwords (the reference's `include_words` result shape). */
case class NormalizeWords(child: Expression, stopwords: Set[String],
    sortedSet: Boolean = false) extends UnaryExpression {
  override def prettyName: String = "normalize_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextNormalizeUtil.normalizeArray(input.asInstanceOf[UTF8String], stopwords, sortedSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("stopwords", stopwords, "scala.collection.immutable.Set")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormalizeUtil.normalizeArray($c, $swRef, $sortedSet)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalizeUtil {
  /** Static bridge for [[NormalizeWords]] codegen. */
  def normalizeArray(text: UTF8String, stopwords: scala.collection.immutable.Set[String],
      sortedSet: Boolean): ArrayData = {
    val words = TextNormalize.normalizeSplit(text.toString, stopwords)
    val out =
      if (sortedSet) (words.toSet -- stopwords).toArray.sorted
      else words.distinct.toArray
    new GenericArrayData(out.map(UTF8String.fromString(_: String)))
  }
}

object TextHashExpressions {
  /** Distinct hashes of word n-grams (no shingle strings materialized). */
  def shingle_hash_set(words: Column, n: Int): Column =
    ColumnInterop.column(ShingleHashSet(ColumnInterop.expression(words), n))

  /** Search-normalized distinct word array (see [[NormalizeWords]]). */
  def normalize_words(text: Column, stopwords: Set[String],
      sortedSet: Boolean = false): Column =
    ColumnInterop.column(NormalizeWords(ColumnInterop.expression(text), stopwords, sortedSet))

  /** 64-bit SimHash fingerprint over word tokens. */
  def simhash64(words: Column): Column =
    ColumnInterop.column(SimHash64(ColumnInterop.expression(words)))

  /** MinHash signature of a shingle-hash-set column. */
  def minhash_signature(shingleHashes: Column, seeds: Array[Long]): Column =
    ColumnInterop.column(MinHashSignature(ColumnInterop.expression(shingleHashes), seeds))
}
