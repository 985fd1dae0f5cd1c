package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, space-joined.
  *
  * Replaces the `zip_with(zip_with(slice…))`+`array_distinct` formulation:
  * higher-order-function lambdas are CodegenFallback (interpreted per
  * element), which made shingling the dominant cost of every MinHash/Jaccard
  * dedup query. Here the whole shingle pass is one static call per row with a
  * tight loop inside — the codegen'd `split()` feeds it directly.
  *
  * Semantics match the HOF form exactly: fewer than `n` tokens → empty array;
  * duplicates keep first occurrence order (like `array_distinct`).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(in: Any): Any =
    WordNGrams.compute(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  private val SP = UTF8String.fromString(" ")

  /** Static entry point shared by eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= sz) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SP, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column-level API: `word_ngrams(tokens, n)`. */
  def apply(tokens: Column, n: Int): Column =
    graftshim.toColumn(WordNGrams(graftshim.toExpression(tokens), n))
}

/** Distinct 48-bit md5 hashes of the word n-grams — fuses shingling and the
  * portable-hash step into one pass, so downstream MinHash/Jaccard plans
  * carry `array<long>` instead of `array<string>` and never run the SQL
  * `md5 → hex-string → conv` chain per shingle.
  *
  * Each hash is bit-identical to `conv(substring(md5(ngram),1,12),16,10)`
  * (= DuckDB `CAST('0x'||substr(md5(ngram),1,12) AS BIGINT)`): the first 6
  * md5 bytes of the UTF-8 n-gram, big-endian — the oracle can reproduce every
  * value exactly.
  */
case class WordNGramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_hashes"

  override def nullSafeEval(in: Any): Any =
    WordNGramHashes.compute(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGramHashes {
  private val SP = UTF8String.fromString(" ")
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 bytes as an unsigned big-endian long (48-bit, ≥ 0). */
  def h48(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** Static entry point shared by eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= sz) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(h48(UTF8String.concatWs(SP, parts: _*).getBytes))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column-level API: `word_ngram_hashes(tokens, n)`. */
  def apply(tokens: Column, n: Int): Column =
    graftshim.toColumn(WordNGramHashes(graftshim.toExpression(tokens), n))
}
