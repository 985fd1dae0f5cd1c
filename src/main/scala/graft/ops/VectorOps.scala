package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Embedding-vector primitives.
  *
  * Dot products go through [[graft.functions.DotProduct]] — a custom Catalyst
  * expression with `doGenCode` (a primitive double loop inside whole-stage
  * codegen). The higher-order `aggregate(zip_with(...))` fold computes the
  * identical value (same summation order, also matching DuckDB's
  * `list_dot_product`) but is interpreted per element and was the bench
  * bottleneck on pairwise joins.
  *
  * Cosine strategy: normalize each vector ONCE (linear work), then a pair's
  * cosine is a single dot product — 3× fewer folds in the quadratic stage.
  * At 100 TB the same shape holds: normalization is a map over the embedding
  * table; candidate pairs come from an LSH bucket join, never a full cross
  * join.
  */
object VectorOps {

  /** Cast float embedding to double (exact) — both engines agree bitwise. */
  def vec(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = DotProduct(a, b)
  def norm(a: Column): Column = sqrt(DotProduct(a, a))

  /** Adds `vn` (unit-normalized copy of `v`). Keeps `v` intact. */
  def withNormalized(df: DataFrame, v: String = "v", vn: String = "vn"): DataFrame =
    df.withColumn("_nrm", norm(col(v)))
      .withColumn(vn, transform(col(v), x => x / col("_nrm")))
      .drop("_nrm")

  def normalizedSql(vExpr: String): String =
    s"list_transform($vExpr, x -> x / sqrt(list_dot_product($vExpr, $vExpr)))"
  def dotSql(a: String, b: String): String = s"list_dot_product($a, $b)"

  /** Deterministic hyperplane weights: w(j,i) = mix(j·dim+i)/65536 − 0.5,
    * where mix is a splitmix64-style finalizer. Exact in binary
    * (power-of-two denominator) so literals round-trip identically through
    * both engines' parsers — the oracle SQL embeds the same computed
    * literals, so any change here stays engine-consistent by construction.
    * The previous single-multiply LCG was an AFFINE map: plane j+1 equaled
    * plane j plus a constant lattice shift, which correlated the planes and
    * collapsed bucket entropy once more than ~8 planes were requested (the
    * wide-signature scale path in PipelineScaleBench measured ~175× the
    * uniform-bucket candidate count at 24 planes). */
  def planeWeight(j: Int, i: Int, dim: Int): Double = {
    var z = (j.toLong * dim + i + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z & 0xFFFFL).toDouble / 65536.0 - 0.5
  }

  /** 8-bit LSH bucket id from the signs of 8 hyperplane projections. */
  def lshBucket(vCol: Column, dim: Int = 64, planes: Int = 8): Column = {
    val bits = (0 until planes).map { j =>
      val arr = array((0 until dim).map(i => lit(planeWeight(j, i, dim))): _*)
      when(DotProduct(vCol, arr) > 0d, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** XOR masks enumerating all bucket perturbations within Hamming ≤ r of an
    * n-bit LSH signature — the multi-probe key set. A candidate pair whose
    * buckets differ by mask m collides on exactly ONE probe (the probe where
    * the exploded side XORs by m), so an equi-join on probe keys yields each
    * qualifying pair exactly once: no dedup pass needed. */
  def probeMasks(bits: Int, r: Int): Seq[Long] =
    (0 to r).flatMap(k => (0 until bits).combinations(k)
      .map(_.foldLeft(0L)((m, i) => m | (1L << i))))

  def lshBucketSql(vExpr: String, dim: Int = 64, planes: Int = 8): String = {
    val bits = (0 until planes).map { j =>
      val arr = (0 until dim).map(i => planeWeight(j, i, dim).toString).mkString(", ")
      s"(CASE WHEN list_dot_product($vExpr, [$arr]::DOUBLE[]) > 0e0 THEN ${1L << j} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }
}
