package graft

import org.apache.spark.sql.functions._
import graft.functions.HammingNearPairs

/** Focused pins for the r21 optimization that replaced simhashBandPairs'
  * bucket self-join with the codegen'd [[HammingNearPairs]] loop: the emitted
  * pair set must equal the join-then-filter formulation exactly. */
class HammingNearPairsSpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def bruteForce(members: Seq[(Long, Long)], maxDist: Int) =
    (for {
      i <- members.indices; j <- (i + 1) until members.size
      (ida, ha) = members(i); (idb, hb) = members(j)
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxDist && ida != idb
    } yield (math.min(ida, idb), math.max(ida, idb), d)).toSet

  private def viaCompute(members: Seq[(Long, Long)], maxDist: Int) = {
    val arr = new GenericArrayData(
      members.map { case (id, h) => InternalRow(id, h) }.toArray[Any])
    val out = HammingNearPairs.compute(arr, maxDist)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getInt(2))
    }.toSet
  }

  test("compute matches brute force on fixed-seed random members") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(60)
      val maxDist = rnd.nextInt(16)
      val members = (0 until n).map(i =>
        (i.toLong, rnd.nextLong() & ((1L << 48) - 1)))
      assert(viaCompute(members, maxDist) === bruteForce(members, maxDist),
        s"trial $trial n=$n maxDist=$maxDist")
    }
  }

  test("edge cases: empty, singleton, identical hashes, duplicate ids") {
    assert(viaCompute(Nil, 10) === Set.empty)
    assert(viaCompute(Seq((7L, 123L)), 10) === Set.empty)
    // identical hashes -> dist 0 pairs, id-ordered
    assert(viaCompute(Seq((5L, 99L), (2L, 99L)), 0) === Set((2L, 5L, 0)))
    // equal ids are skipped (the join's id1 < id2 semantics)
    assert(viaCompute(Seq((5L, 99L), (5L, 98L)), 10) === Set.empty)
  }

  test("DataFrame path (codegen) equals the former self-join formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // small hash space so buckets genuinely collide and pairs qualify
    val rows = (0 until 400).map(i => (i.toLong, rnd.nextLong() & 0xFFFFFFL))
    val df = rows.toDF("doc_id", "simhash")
      .withColumn("bkey", col("simhash").bitwiseAND(lit(15L)))
    val viaExpr = df
      .groupBy(col("bkey"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ms"))
      .select(explode(HammingNearPairs(col("ms"), 10)).as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.dist"))
      .distinct()
    val a = df.select(col("bkey"), col("doc_id").as("id1"), col("simhash").as("h1"))
    val b = df.select(col("bkey"), col("doc_id").as("id2"), col("simhash").as("h2"))
    val viaJoin = a.join(b, Seq("bkey"))
      .filter(col("id1") < col("id2") &&
        bit_count(col("h1").bitwiseXOR(col("h2"))) <= 10)
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("dist"))
      .distinct()
    val got = viaExpr.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = viaJoin.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.nonEmpty) // the fixture must actually exercise qualifying pairs
  }
}
