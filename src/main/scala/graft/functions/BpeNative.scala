package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the corpus-fitted BPE tokenizer
  * ([[graft.operators.Bpe]]): one greedy merge pass over a symbol array
  * (the fit loop's inner step) and the fused per-document token counter
  * under a fitted merge table (the score face). Both are linear,
  * codegen'd, shuffle-free — the fit loop's only shuffles are the
  * pair-count aggregates.
  *
  * Merge semantics (Sennrich et al. arXiv:1508.07909 §3.2): one pass
  * applies pair (a, b) greedily LEFT TO RIGHT without overlap — scanning
  * resumes AFTER a merged symbol, so "aaa" under (a,a) becomes
  * (aa, a), never (a, aa) or (aa, aa). The fold formulation (merge when
  * the previous UNCONSUMED symbol equals `a` and the incoming equals
  * `b`) is exactly that scan, and is what the DuckDB oracle replays as a
  * string-accumulator list_reduce.
  */
object BpeImpl {

  /** One greedy merge pass over UTF8String symbols. */
  def mergePass(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (m > 0 && out(m - 1).equals(a) && s.equals(b)) {
        out(m - 1) = UTF8String.concat(a, b)
      } else {
        out(m) = s
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m))
  }

  /** One greedy merge pass over plain strings (driver/score-side twin —
    * same fold, same bits).
    */
  def mergePassStr(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new Array[String](syms.length)
    var m = 0
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (m > 0 && out(m - 1) == a && s == b) out(m - 1) = a + b
      else { out(m) = s; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** text → [n_words, n_bpe_tokens] under a fitted merge table (flat
    * [a0, b0, a1, b1, …], applied in rank order). Tokenization matches
    * the corpus word rule exactly (lower, trim, whitespace+US/RS split —
    * the Bpe.wordCounts class; US/RS are separators so the segment
    * artifact's structure bytes can never appear inside a symbol);
    * empty tokens are skipped so an all-whitespace text scores (0, 0).
    */
  def tokenStats(text: UTF8String, merges: Array[String]): ArrayData = {
    val words = text.trim().toLowerCase().toString.split("[ \\t\\n\\f\\r\\u001F\\u001E]+", -1)
    var nw = 0L
    var nt = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nw += 1
        var syms = new Array[String](w.length)
        var ci = 0
        while (ci < w.length) { syms(ci) = String.valueOf(w.charAt(ci)); ci += 1 }
        var m = 0
        while (m + 1 < merges.length) {
          syms = mergePassStr(syms, merges(m), merges(m + 1))
          m += 2
        }
        nt += syms.length
      }
      wi += 1
    }
    new GenericArrayData(Array(nw, nt))
  }

  /** text → segmented-document string (see [[BpeSegments]]); null when
    * no words survive the split.
    */
  def segments(text: UTF8String, merges: Array[String]): UTF8String = {
    val words = text.trim().toLowerCase().toString.split("[ \\t\\n\\f\\r\\u001F\\u001E]+", -1)
    val sb = new java.lang.StringBuilder
    var any = false
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        if (any) sb.append('\u001e')
        any = true
        var syms = new Array[String](w.length)
        var ci = 0
        while (ci < w.length) { syms(ci) = String.valueOf(w.charAt(ci)); ci += 1 }
        var m = 0
        while (m + 1 < merges.length) {
          syms = mergePassStr(syms, merges(m), merges(m + 1))
          m += 2
        }
        var si = 0
        while (si < syms.length) {
          if (si > 0) sb.append('\u001f')
          sb.append(syms(si))
          si += 1
        }
      }
      wi += 1
    }
    if (!any) null else UTF8String.fromString(sb.toString)
  }
}

/** text → the SEGMENTED document under a fitted merge table: each
  * word's final symbols joined by US (\u001f, the oracle's BpeSep),
  * words joined by RS (\u001e); empty tokens skipped; null when the
  * text has no words (the score face's n_words > 0 filter as a null).
  * US/RS are part of the word-SPLIT class, so no input — printable or
  * not — can carry either code point into a symbol: the separators
  * cannot collide by construction and stripping them reconstructs the
  * normalized text exactly (spec-pinned) — this string IS the shippable tokenizer artifact,
  * where [[BpeTokens]] only bills it.
  */
case class BpeSegments(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_segments"

  @transient private lazy val flat: Array[String] =
    merges.flatMap(p => Seq(p._1, p._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.segments(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BpeImpl.segments($c, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegments =
    copy(child = newChild)
}

/** (symbols, a, b) → symbols after one greedy merge pass. */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  override protected def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeImpl.mergePass(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) => s"graft.functions.BpeImpl.mergePass($s, $a, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** text → [n_words, n_bpe_tokens] under the FITTED merge table baked into
  * the expression (the fit/score split: the table is a bounded fit
  * artifact — `merges` rows — carried as a codegen reference object, one
  * JVM call per row).
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val flat: Array[String] =
    merges.flatMap(p => Seq(p._1, p._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.tokenStats(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.tokenStats($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
