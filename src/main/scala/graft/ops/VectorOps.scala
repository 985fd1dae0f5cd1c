package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector primitives: exact dot/cosine via higher-order functions
  * (sequential left-fold — bit-identical to DuckDB's list_dot_product, which
  * lets the oracle check similarity scores exactly), plus a deterministic
  * random-hyperplane LSH for bucketed ANN.
  *
  * Scale shape: brute-force top-k is the small-N baseline (quadratic join);
  * the LSH path buckets each vector once (linear scan, fixed 8-plane
  * projection) and only joins within buckets — the 100 TB answer is
  * bucket-partitioned storage so candidate joins never shuffle the full
  * table.
  */
object VectorOps {

  /** Cast float embedding to double (exact) — both engines agree bitwise. */
  def vec(c: Column): Column = transform(c, x => x.cast("double"))

  private def foldDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  def dot(a: String, b: String): Column = expr(foldDot(a, b))
  def norm(a: String): Column = sqrt(expr(foldDot(a, a)))
  /** cosine = dot/(‖a‖·‖b‖), fixed association both engines reproduce. */
  def cosine(a: String, b: String): Column = dot(a, b) / (norm(a) * norm(b))

  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Deterministic hyperplane weights: w(j,i) = lcg(j·dim+i)/65536 − 0.5.
    * Exact in binary (power-of-two denominator) so literals round-trip
    * identically through both engines' parsers. */
  def planeWeight(j: Int, i: Int, dim: Int): Double =
    ((1103515245L * (j * dim + i + 1) + 12345L) % 65536L).toDouble / 65536.0 - 0.5

  /** 8-bit LSH bucket id from the signs of 8 hyperplane projections. */
  def lshBucket(vCol: String, dim: Int = 64, planes: Int = 8): Column = {
    val bits = (0 until planes).map { j =>
      val arr = (0 until dim).map(i => planeWeight(j, i, dim).toString).mkString(", ")
      when(expr(foldDot(vCol, s"array($arr)")) > 0d, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def lshBucketSql(vExpr: String, dim: Int = 64, planes: Int = 8): String = {
    val bits = (0 until planes).map { j =>
      val arr = (0 until dim).map(i => planeWeight(j, i, dim).toString).mkString(", ")
      s"(CASE WHEN list_dot_product($vExpr, [$arr]::DOUBLE[]) > 0e0 THEN ${1L << j} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }
}
