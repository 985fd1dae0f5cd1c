package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-pipeline primitives: portable hashing, shingling, MinHash,
  * SimHash (BASELINE.json north-star operators).
  *
  * Everything here is built from codegen'd Catalyst expressions (no UDFs):
  * higher-order array functions for shingling, hash-min aggregations for
  * MinHash, conditional-sum aggregations for SimHash. The hash primitive is a
  * 48-bit md5 prefix, chosen because any oracle engine can reproduce it
  * exactly; at production scale you would swap [[h48]] for `xxhash64` (same
  * shape, one less md5).
  */
object TextOps {

  /** 48-bit portable content hash (fits a signed long exactly). */
  def h48(c: Column): Column = conv(substring(md5(c), 1, 12), 16, 10).cast("long")
  def h48Sql(e: String): String = s"CAST('0x' || substr(md5($e), 1, 12) AS BIGINT)"

  /** Mersenne prime 2^31−1: universal-hash modulus. a*x+b stays < 2^62. */
  val P: Long = graft.functions.MinHashSig.P
  /** MinHash permutation count (4 bands × 4 rows). */
  val K: Int = 16
  def aCoef(j: Int): Long = graft.functions.MinHashSig.aCoef(j)
  def bCoef(j: Int): Long = graft.functions.MinHashSig.bCoef(j)

  // -- whitespace tokens + word-3-gram shingles, Spark SQL + DuckDB SQL forms
  val TOKS_S = "split(lower(trim(text)), '\\\\s+')"
  val TOKS_D = "string_split_regex(lower(trim(text)), '\\s+')"
  // Build 3-grams by zipping three shifted slices instead of indexing inside
  // a lambda: `transform(seq, i -> …toks[i]…)` re-evaluates the split() per
  // element (HOF lambdas are interpreted, and project-collapse inlines the
  // split into the lambda body) — O(tokens²) per doc and the original bench
  // bottleneck. Slices evaluate the split O(1) times per row.
  val SHINGLES_S: String =
    s"CASE WHEN size($TOKS_S) >= 3 THEN array_distinct(zip_with(" +
      s"zip_with(slice($TOKS_S, 1, size($TOKS_S)-2), slice($TOKS_S, 2, size($TOKS_S)-2), " +
      "(x, y) -> concat(x, ' ', y)), " +
      s"slice($TOKS_S, 3, size($TOKS_S)-2), (x, y) -> concat(x, ' ', y))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"
  val SHINGLES_D: String =
    s"list_distinct(list_transform(range(1, len($TOKS_D)-1), " +
      s"i -> $TOKS_D[i] || ' ' || $TOKS_D[i+1] || ' ' || $TOKS_D[i+2]))"

  /** doc_id + distinct word-3-gram shingle set. Uses the codegen'd
    * [[graft.functions.WordNGrams]] expression — the `SHINGLES_S` HOF form is
    * semantically identical but interpreted per element, and was the dominant
    * cost of every shingle-based dedup query. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.WordNGrams(split(lower(trim(col("text"))), "\\s+"), 3).as("s"))

  /** doc_id + distinct 48-bit md5 hashes of the word-3-gram shingles —
    * shingling and the portable hash fused in one codegen'd pass
    * ([[graft.functions.WordNGramHashes]]); downstream MinHash/LSH/Jaccard
    * plans carry `array<long>`, never shingle strings. */
  def shingleHashSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.WordNGramHashes(split(lower(trim(col("text"))), "\\s+"), 3).as("hs"))

  /** Hashed shingle sets in DuckDB SQL (same 48-bit values). */
  val SHINGLE_HASHES_D: String =
    s"list_transform($SHINGLES_D, x -> ${h48Sql("x")})"

  /** MinHash signature: K min-permutation values per doc, computed map-side
    * in one pass over the hashed-shingle array
    * ([[graft.functions.MinHashSig]]) — no explode, no shuffle. A document
    * with no shingles yields no row (matches the former explode→groupBy
    * formulation and the oracle's unnest). */
  def minhashSignature(docs: DataFrame): DataFrame =
    minhashSignatureOf(shingleHashSets(docs))

  /** Signature from an existing hashed-shingle frame (lets callers persist
    * the shingling once and derive signature + verification sets from it). */
  def minhashSignatureOf(sets: DataFrame): DataFrame = {
    val sig = sets
      .select(col("doc_id"), graft.functions.MinHashSig(col("hs"), K).as("sig"))
      .filter(col("sig").isNotNull)
    sig.select(col("doc_id") +: (0 until K).map(j => col("sig")(j).as(s"m$j")): _*)
  }

  /** The same signature in DuckDB SQL (oracle). */
  def minhashSigSql: String = {
    val minCols = (0 until K)
      .map(j => s"min((${aCoef(j)}*xm + ${bCoef(j)}) % $P) AS m$j").mkString(", ")
    s"sh AS (SELECT doc_id, unnest($SHINGLES_D) AS sh FROM documents), " +
      s"hx AS (SELECT doc_id, ${h48Sql("sh")} % $P AS xm FROM sh), " +
      s"sig AS (SELECT doc_id, $minCols FROM hx GROUP BY doc_id)"
  }

  /** LSH banding of a MinHash signature: band id + 48-bit band hash. */
  def lshBands(sig: DataFrame, bands: Int = 4, rows: Int = 4): DataFrame = {
    val structs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        h48(concat_ws("-", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(structs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
  }

  def lshBandsSql(bands: Int = 4, rows: Int = 4): String = {
    val selects = (0 until bands).map { b =>
      val cat = (0 until rows).map(r => s"m${b * rows + r}::VARCHAR").mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, ${h48Sql(s"($cat)")} AS bh FROM sig"
    }
    "bands AS (" + selects.mkString(" UNION ALL ") + ")"
  }

  /** Jaccard similarity of two pre-distinct shingle-set columns. */
  def jaccard(s1: Column, s2: Column): Column =
    size(array_intersect(s1, s2)).cast("double") /
      (size(s1) + size(s2) - size(array_intersect(s1, s2)))

  def jaccardSql(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / (len($a) + len($b) - len(list_intersect($a, $b)))"

  /** 48-bit SimHash over unigram token hashes (multiplicity-weighted):
    * bit j set iff Σ_tokens (±1 by bit j of h48(token)) > 0. Computed
    * map-side per row ([[graft.functions.SimHash48]]) — the former
    * explode→48-conditional-sum aggregation shuffled every token. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash48(split(lower(trim(col("text"))), "\\s+")).as("simhash"))

  def simhashSql: String = {
    val sums = (0 until 48)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val bits = (0 until 48)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"tk AS (SELECT doc_id, unnest($TOKS_D) AS tok FROM documents), " +
      s"hh AS (SELECT doc_id, ${h48Sql("tok")} AS h FROM tk), " +
      s"ss AS (SELECT doc_id, $sums FROM hh GROUP BY doc_id), " +
      s"sim AS (SELECT doc_id, $bits AS simhash FROM ss)"
  }
}
