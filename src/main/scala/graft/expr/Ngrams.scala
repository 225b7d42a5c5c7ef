package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd n-gram generation.
  *
  * The three shingling hot paths (char trigrams for language-ID, word
  * bigrams for MinHash/Jaccard shingles, char 8-grams for the rolling
  * fingerprint) were originally `transform(sequence(...), i -> ...)`
  * higher-order expressions. Spark evaluates lambda bodies INTERPRETED
  * (no codegen inside `transform`), which costs an expression-tree walk
  * per array element — the dominant cost of `llm_doc_fingerprint` at
  * sf0.1. These expressions produce the same arrays from inside
  * whole-stage codegen with one static call per row, slicing each gram
  * from a single byte-offset walk of the UTF-8 payload (O(len·n) bytes
  * copied, no per-element expression evaluation).
  *
  * Semantics (mirrors the DuckDB oracle spellings in [[graft.llm.Text]]):
  *   - `char_ngrams(text, n, dedup)` ≡
  *     `transform(sequence(1, length(text)-n+1), i -> substring(text, i, n))`
  *     (+ `array_distinct` when `dedup`), empty array when length < n.
  *   - `word_ngrams(tokens, n, dedup)` ≡
  *     `transform(sequence(1, size(tk)-n+1), i -> concat_ws(' ', slice...))`
  *     (+ `array_distinct` when `dedup`), empty array when size < n.
  *
  * Dedup keeps first-occurrence order, exactly like `array_distinct`.
  */
object NgramUtil {

  private val Empty = new GenericArrayData(Array.empty[Any])

  def charNgrams(text: UTF8String, n: Int, dedup: Boolean): ArrayData = {
    val numChars = text.numChars()
    if (numChars < n) return Empty
    val bytes = text.getBytes
    // one walk: byte offset of every char start (UTF-8 aware, like
    // SQL substring which counts codepoints)
    val offsets = new Array[Int](numChars + 1)
    var ci = 0
    var pos = 0
    while (pos < bytes.length) {
      offsets(ci) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      ci += 1
    }
    offsets(numChars) = bytes.length
    val count = numChars - n + 1
    if (dedup) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i)))
        i += 1
      }
      fromSet(seen)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def wordNgrams(tokens: ArrayData, n: Int, dedup: Boolean): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return Empty
    val count = sz - n + 1
    val space = UTF8String.fromString(" ")
    def gram(i: Int): UTF8String = {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = tokens.getUTF8String(i + j)
        j += 1
      }
      UTF8String.concat(parts: _*)
    }
    if (dedup) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) { seen.add(gram(i)); i += 1 }
      fromSet(seen)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = gram(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  private def fromSet(seen: java.util.LinkedHashSet[UTF8String]): ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

case class CharNgrams(child: Expression, n: Int, dedup: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    NgramUtil.charNgrams(input.asInstanceOf[UTF8String], n, dedup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NgramUtil.charNgrams($c, $n, $dedup)")
  override def prettyName: String = "char_ngrams"
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int, dedup: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects an array<string> column, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    NgramUtil.wordNgrams(input.asInstanceOf[ArrayData], n, dedup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NgramUtil.wordNgrams($c, $n, $dedup)")
  override def prettyName: String = "word_ngrams"
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
