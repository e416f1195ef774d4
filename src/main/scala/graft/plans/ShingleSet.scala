package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The dedup tier's clean→tokenize→3-shingle→distinct pipeline as ONE
  * native expression (`graft_shingles`). Semantically identical to
  *
  *   array_distinct(transform(sequence(1, size(words)-2),
  *     i -> concat_ws(' ', slice(words, i, 3))))
  *   with words = split(cleanText(text), " ")
  *
  * but ~4× faster: higher-order functions evaluate their lambda
  * INTERPRETED per element (no whole-stage codegen inside `transform`), so
  * the composed form walks 12M interpreted slice+concat_ws evals at sf0.1;
  * this expression runs one compiled pass per document (codegen fallback is
  * a single virtual call per ROW — 60k, not 12M). The clean step mirrors
  * Norm.cleanText (`lower → [^\p{L}\p{N}\s]+ → ' ' → collapse → trim`) via
  * Character.getType so Unicode letter/number classes match the regex; the
  * DuckDB oracle mirrors both on the ASCII corpus (QuerySmokeSpec pins the
  * ASCII precondition).
  */
case class ShingleSet(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  /** NULL text → empty array, matching both the composed built-in form
    * (`when(size(words)>=3, …).otherwise(array())` is [] on null) and the
    * oracle's CASE/ELSE — default null propagation would return NULL and
    * silently diverge downstream (size/array_intersect of NULL).
    */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any]) else nullSafeEval(v)
  }

  private def keep(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
    t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
    t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
    t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  override protected def nullSafeEval(input: Any): Any = {
    // FULL string lowercase first (Locale.ROOT), matching lower()'s
    // semantics — per-codepoint Character.toLowerCase misses multi-char
    // expansions (İ → i + combining dot), which would silently diverge
    // from the composed built-in form on non-ASCII text
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    // clean + tokenize in one pass: runs of letters/digits are words;
    // everything else is a separator (whitespace INCLUDED — cleanText maps
    // non-alnum runs to one space and collapses)
    val words = mutable.ArrayBuffer.empty[String]
    val word = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (keep(cp)) word.appendCodePoint(cp)
      else if (word.length > 0) { words += word.toString; word.setLength(0) }
      i += Character.charCount(cp)
    }
    if (word.length > 0) words += word.toString
    if (words.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + 2 < words.length) {
      seen.add(words(j) + " " + words(j + 1) + " " + words(j + 2))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}
