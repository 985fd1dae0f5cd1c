package graft

import graft.queries.Registry
import graft.sources.Tables

/** Smoke: every registry query runs on sf0.001 and the contract holds
  * (oracle keys ⊆ query keys; flagship entry returns rows). */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("every registry query executes on sf0.001") {
    val failures = Registry.all.flatMap { q =>
      try { q.fn(spark, sf()).collect(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("ops sanity: identical docs dedup to one group; near-dup found by LSH") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "en", "s"),
      (3L, "the quick brown fox jumps over the lazy dog once more today", "en", "s"),
      (4L, "completely different text about spark query engines and parquet files", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    // exact: docs 1,2 share an md5 group
    val groups = docs.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(groups == 1)
    // minhash sigs of identical docs are identical
    val sig = graft.ops.TextOps.minhashSignature(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    // near-dup pair (1,3) shares most shingles → jaccard above 0.3
    val sets = graft.ops.TextOps.shingleSets(docs)
    val j = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 3)
      .select(graft.ops.TextOps.jaccard(col("a.s"), col("b.s")).as("j"))
      .as[Double].head()
    assert(j > 0.3 && j < 1.0)
    // simhash of identical docs identical; hamming(1,4) large
    val sh = graft.ops.TextOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 8)
  }
}
