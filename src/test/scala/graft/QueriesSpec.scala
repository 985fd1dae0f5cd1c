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

  test("no registry query plans an unbounded cartesian / nested-loop join") {
    // The one plan shape that can never finish at 100 TB is an O(n²) join.
    // Whitelisted queries cross-join a PROVABLY tiny side (single-row
    // aggregates, a ≤10-row broadcast query set, the PromQL step grid) —
    // every other query must plan hash/sort-merge joins only.
    val tinyCrossOk = Set(
      "a1_dedup_counts",    // two 1-row aggregates
      "dd_hll_cardinality", // global row: 1-row exact anchor × 1-row union-agg
      "promql_at_modifier", // @-pinned vector broadcast onto the step grid
      "f_math_scalar",      // scalar() grid broadcast
      "ss_brute_topk",      // exact baseline: ≤10-row broadcast query side
      "ss_recall_eval",     // same ≤10-row broadcast query side as ss_brute
      "ss_ivf_topk",        // probe set × centroids (k=16) assignment
      "ss_ivf_recall",      // same k=16 centroid cross + ≤10-row query side
      "ss_lsh_topk",        // ≤10-row query side against its buckets
      "ss_pq_recall",       // ≤5-row broadcast query side (exact-truth base)
      "ss_ivfpq_topk",      // k=16 centroid cross (assign + probe)
      "km_mstep",           // E-step: constant-size (k=16) centroid broadcast
      "dd_semdedup",        // assignment: constant-size (k=16) centroid broadcast
      "smp_temperature")    // 1-row normalizer broadcast onto ≤|langs| rows
    val failures = Registry.all.flatMap { q =>
      val plan = q.fn(spark, sf()).queryExecution.executedPlan.toString
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !tinyCrossOk(q.name)) Some(q.name) else None
    }
    assert(failures.isEmpty,
      s"unbounded-join plans in: ${failures.mkString(", ")}")
  }

  test("bloom sketch: inserted hashes always hit (no false negatives)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim
    val vals = (1L to 10000L).toDF("v").select(xxhash64(col("v")).as("h"))
    val bf = vals.agg(graftshim.bloomFilterAgg(col("h"), 20000L, 1L << 20).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(vals.filter(!graftshim.bloomMightContain(bf, col("h"))).count() == 0)
  }

  test("tx_bloom_decontam prefilters map-side with the bloom sketch") {
    val df = Registry.all.find(_.name == "tx_bloom_decontam").get.fn(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // the exact join's input must carry the might_contain prefilter — the
    // map-side prune is the whole point of the operator (correctness of the
    // prefilter is the oracle's job: exact_hit is compared against an
    // unprefiltered full-join reference)
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("WordNGrams/WordNGramHashes match the HOF + md5-conv SQL forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf()).documents.limit(200)
    val toks = split(lower(trim(col("text"))), "\\s+")
    // string shingles ≡ the zip_with/array_distinct HOF expression
    val hof = docs.select(col("doc_id"), expr(graft.ops.TextOps.SHINGLES_S).as("s"))
    val gen = docs.select(col("doc_id"), graft.functions.WordNGrams(toks, 3).as("s"))
    assert(gen.exceptAll(hof).isEmpty && hof.exceptAll(gen).isEmpty)
    // hashed shingles ≡ conv(substring(md5(shingle),1,12),16,10) per element
    val viaSql = docs.select(col("doc_id"),
        explode(graft.functions.WordNGrams(toks, 3)).as("sh"))
      .select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
    val viaGen = docs.select(col("doc_id"),
        explode(graft.functions.WordNGramHashes(toks, 3)).as("h"))
    assert(viaGen.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaGen).isEmpty)
    // short inputs: under n tokens → empty, exactly n → one shingle
    val tiny = Seq("one two", "one two three").toDF("text")
      .select(graft.functions.WordNGramHashes(toks, 3).as("hs"))
      .select(size(col("hs"))).as[Int].collect().sorted.toSeq
    assert(tiny == Seq(0, 1))
  }

  test("RollingFingerprint matches the naive per-window fold; edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val P = graft.functions.RollingFingerprint.P
    val B = graft.functions.RollingFingerprint.B
    def naive(s: String, w: Int): Long = {
      def h(win: Seq[Int]): Long = win.foldLeft(0L)((a, c) => (a * B + c) % P)
      val cps = s.codePoints().toArray.toSeq
      if (cps.isEmpty) 0L
      else if (cps.length <= w) h(cps)
      else cps.sliding(w).map(h).min
    }
    val rnd = new scala.util.Random(42)
    val strs = Seq("", "ab", "exactly8", "a bit longer than the window") ++
      (1 to 30).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
    val got = strs.toDF("s")
      .select(col("s"), graft.functions.RollingFingerprint(col("s"), 8).as("fp"))
      .as[(String, Long)].collect().toMap
    strs.foreach(s => assert(got(s) == naive(s, 8), s"mismatch for '$s'"))
    // min-window locality: editing the tail far from the min window usually
    // keeps the fingerprint — check at least that a shared min window does
    val a = "zzzz stable prefix here AAAA tail one"
    val b = "zzzz stable prefix here AAAA other ending"
    assert(naive(a, 8) == naive(b, 8)) // min falls in the shared prefix
  }

  test("GraphOps.connectedComponents: min-contraction fixpoint on known graphs") {
    import spark.implicits._
    // components {1,2,3,4} (a path, diameter 3), {5,6}, isolated {7}
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val got = graft.ops.GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // worst case for contraction: a chain, ids ordered against the merge
    // direction, plus duplicate/reversed edge rows
    val n = 12L
    val chain = (1L until n).map(i => (i + 1, i)) ++ Seq((2L, 3L), (5L, 4L))
    val got2 = graft.ops.GraphOps.connectedComponents(
        (1L to n).toDF("id"), chain.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == (1L to n).map(_ -> 1L).toMap)
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

  /** Brute-force (plain Scala collections) cross-check of the corpus-hygiene
    * registry queries against whatever documents table lives in `dir`. */
  private def checkHygiene(dir: String): Unit = {
    val docs = Tables(spark, dir).documents.select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").toSeq
    def grams(s: String, n: Int) = toks(s).sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSet

    // tx_contamination ≡ brute-force 8-gram intersection with src0/src1
    val bench = docs.filter(d => d._3 == "src0" || d._3 == "src1")
      .flatMap(d => grams(d._2, 8)).toSet
    val expect = docs.filterNot(d => d._3 == "src0" || d._3 == "src1")
      .map(d => d._1 -> grams(d._2, 8).count(bench)).filter(_._2 > 0).toMap
    val got = Registry.all.find(_.name == "tx_contamination").get.fn(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(got == expect.map { case (k, v) => k -> v.toLong },
      s"contamination mismatch: got=$got expect=$expect")

    // dd_line_dedup: every distinct 10-token segment survives exactly once
    val allSegs = docs.flatMap { case (_, text, _) =>
      toks(text).grouped(10).map(_.mkString(" ")) }
    val rebuilt = Registry.all.find(_.name == "dd_line_dedup").get.fn(spark, dir)
      .collect()
    assert(rebuilt.map(_.getAs[Long]("n_kept")).sum == allSegs.distinct.length)
    assert(rebuilt.map(_.getAs[Long]("n_seg")).sum == allSegs.length)

    // tx_pii_scrub: counts follow the doc_id payload rule
    val pii = Registry.all.find(_.name == "tx_pii_scrub").get.fn(spark, dir).collect()
    pii.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_email") == (if (id % 3 != 0) 1L else 0L))
      assert(r.getAs[Long]("n_ip") == (if (id % 2 == 0) 1L else 0L))
    }
  }

  test("corpus hygiene ops: brute-force invariants on sf0.001") {
    checkHygiene(sf())
  }

  test("CurateDemo: pipeline funnel is monotone and the output is clean") {
    val (packed, f) = graft.examples.CurateDemo.run(spark, sf())
    assert(f.input >= f.quality && f.quality >= f.exact && f.exact >= f.nearDup
      && f.nearDup >= f.clean && f.clean >= f.sampled && f.sampled > 0)
    assert(f.sequences > 0)
    val out = packed.select("doc_id", "text", "source").collect()
    // no benchmark-source docs and no raw PII survive curation
    assert(!out.exists(r => Set("src0", "src1")(r.getAs[String]("source"))))
    assert(!out.exists(_.getAs[String]("text").contains("@")))
    // exact-dup free: normalized texts are unique
    val norm = out.map(_.getAs[String]("text").trim.toLowerCase
      .replaceAll("\\s+", " "))
    assert(norm.distinct.length == norm.length)
    packed.unpersist() // shared session — don't accumulate storage
  }

  test("corpus hygiene ops: randomized adversarial corpus") {
    import spark.implicits._
    // seeded random docs over a tiny vocabulary (maximal shingle collisions)
    // plus edge cases: 1-token, exactly-10-token, within-doc repeated
    // segment, full cross-source duplicates (guaranteed contamination)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg", "hh")
    def doc(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 50L).map { id =>
      val n = Seq(1, 5, 9, 10, 11, 20, 35)(rnd.nextInt(7))
      (id, doc(n), "en", s"src${id % 4}")
    }
    val tenTok = doc(10)
    val edge = Seq(
      (51L, base.head._2, "en", "src3"),            // duplicate of a src1 doc
      (52L, s"$tenTok $tenTok", "en", "src2"),      // same segment twice
      (53L, tenTok, "en", "src0"))                  // benchmark copy of 52's segment
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzdocs").toString
    (base ++ edge).toDF("doc_id", "text", "lang", "source")
      .repartition(4).write.parquet(s"$dir/documents.parquet")
    checkHygiene(dir)
  }

  test("FixtureCache: keyed sharing, per-dataDir rebuild, failure retry, fresh scratch") {
    import graft.queries.FixtureCache
    // two queries sharing a (dataDir, fixture) key get the SAME dir and the
    // build runs once — the serving-vs-ETL split the bench relies on
    var builds = 0
    val d1 = FixtureCache.dir("/data/a", "fxspec")(_ => builds += 1)
    val d2 = FixtureCache.dir("/data/a", "fxspec")(_ => builds += 1)
    assert(d1 == d2 && builds == 1)
    // a different dataDir is a different store: rebuilt, distinct dir
    val d3 = FixtureCache.dir("/data/b", "fxspec")(_ => builds += 1)
    assert(d3 != d1 && builds == 2)
    // a failed build caches nothing and removes its partial dir; the next
    // caller retries cleanly
    var tries = 0
    val boom = intercept[RuntimeException](
      FixtureCache.dir("/data/c", "fxspec") { out =>
        tries += 1
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "partial"), "x")
        throw new RuntimeException("boom")
      })
    assert(boom.getMessage == "boom")
    val d4 = FixtureCache.dir("/data/c", "fxspec")(_ => tries += 1)
    assert(tries == 2 && java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(d4)))
    // scratch never caches: every call is a fresh dir — and re-entry
    // deletes the previous same-name scratch, so a long sweeping JVM
    // (repeat bench invocations of s5_convert_roundtrip) holds ONE live
    // scratch dir per name, not one per invocation
    val s1 = FixtureCache.scratch("fxscr")
    val s2 = FixtureCache.scratch("fxscr")
    assert(s1 != s2)
    val last = (1 to 4).map(_ => FixtureCache.scratch("fxscr")).last
    assert(FixtureCache.liveScratchDirs("fxscr") == Seq(last),
      "N scratch invocations must leave exactly the newest dir live")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s1)) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s2)))
    // distinct names don't interfere
    val other = FixtureCache.scratch("fxscr2")
    assert(FixtureCache.liveScratchDirs("fxscr") == Seq(last) &&
      FixtureCache.liveScratchDirs("fxscr2") == Seq(other))
  }
}
