package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Prebuilt merge-rank lookup for [[BpeEncodeWords]] — rides into
  * generated code as ONE codegen reference object (a 100k-merge list
  * would otherwise be 200k string literals in the expression tree). Keys
  * are LENGTH-PREFIXED (`lhs.length + ':' + lhs + rhs`), which is
  * unambiguous for ANY symbol content — a separator-char key
  * (`l + SEP + r`) would alias pairs whose symbols contain the
  * separator and silently return the wrong rank. */
final class BpeRanks(merges: Seq[(String, String)]) extends Serializable {
  private val map = new java.util.HashMap[String, Integer](merges.size * 2)
  private def key(l: String, r: String): String = l.length + ":" + l + r
  merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
    // first occurrence wins: a duplicate later pair can never out-rank
    map.putIfAbsent(key(l, r), Integer.valueOf(i))
  }
  def rank(l: String, r: String): Int = {
    val v = map.get(key(l, r))
    if (v == null) Int.MaxValue else v.intValue()
  }
  def size: Int = map.size
}

object BpeUtil {

  /** Codepoint split (supplementary chars stay whole symbols — the same
    * contract as the trainer's merge loop). */
  private def codepoints(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      buf += w.substring(i, i + n)
      i += n
    }
    buf.toArray
  }

  /** Rank-based greedy BPE encode of ONE word — the industry-standard
    * inference loop (GPT-2 `bpe()`, HuggingFace tokenizers): repeatedly
    * find the LOWEST-rank adjacent symbol pair present and merge every
    * occurrence greedy left-to-right, until no adjacent pair is in the
    * merge table. Each round removes ≥1 symbol, so a word of n symbols
    * costs O(n²) rank lookups — INDEPENDENT of merge-list size, which is
    * what lets a 100k-merge tokenizer run per row (the replace-chain
    * encode of `Lexicon.bpeApply` folds one `replace` per merge into the
    * expression tree and is stack-bounded at 128).
    *
    * Contract: for TRAINING-PRODUCED merge lists this computes the same
    * tokens as applying the merges in training order (Sennrich
    * sequential semantics, the `bpeApply` path): training can only learn
    * a pair whose member symbols already exist, so when the loop fires
    * rank k, no pair of rank < k can reappear later — merges only ever
    * create adjacencies INVOLVING the new symbol. An arbitrary
    * hand-built list that names a pair before the merges that build its
    * members (e.g. `[(ab,c), (a,b)]`) is applied by rank here but
    * sequentially there, and the two can differ; LexiconSpec pins
    * equality on trained lists. */
  def encodeWord(w: String, ranks: BpeRanks): Array[String] = {
    var syms = codepoints(w)
    if (ranks.size == 0) return syms
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.rank(syms(i), syms(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.rank(syms(j), syms(j + 1)) == best) {
            out += (syms(j) + syms(j + 1)); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Static bridge for [[BpeEncodeWords]] codegen: per-word token arrays
    * (array<array<string>>), word order and within-word token order
    * preserved. A NULL array element (legal under
    * `ArrayType(StringType, containsNull = true)` inputs) contributes an
    * EMPTY token array — the same "nothing to encode" treatment the
    * replace-chain paths give filtered-out empties — instead of an
    * opaque executor NPE. */
  def encodeWords(words: ArrayData, ranks: BpeRanks): ArrayData = {
    val n = words.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val u = words.getUTF8String(i)
      out(i) =
        if (u == null) new GenericArrayData(Array.empty[Any])
        else new GenericArrayData(
          encodeWord(u.toString, ranks).map(UTF8String.fromString): Array[Any])
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Rank-based BPE encode of a words array (codegen'd): per-word subword
  * token arrays under a learned merge list of ANY size — the inference
  * path for real-tokenizer merge depths (30k–100k), where
  * `Lexicon.bpeApply`'s nested-replace chain (one expression node per
  * merge) is stack-bounded at 128. The merge table rides along as one
  * codegen reference object ([[BpeRanks]]). */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "bpe_encode_words"
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got $other")
  }

  @transient private lazy val ranks = new BpeRanks(merges)

  override def nullSafeEval(input: Any): Any =
    BpeUtil.encodeWords(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "graft.functions.BpeRanks")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeUtil.encodeWords($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  /** Per-word BPE token arrays under `merges` (see [[BpeEncodeWords]]). */
  def bpe_encode_words(words: Column, merges: Seq[(String, String)]): Column =
    ColumnInterop.column(BpeEncodeWords(ColumnInterop.expression(words), merges))
}
