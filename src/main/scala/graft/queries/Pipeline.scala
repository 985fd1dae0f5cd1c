package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{GraphOps, TextOps, VectorOps}
import graft.sources.Tables

/** Training-data pipeline operators over `documents` / `embeddings`
  * (BASELINE.json north star: dedup, similarity search, text analysis,
  * multimodal). Hash functions are md5-based so the DuckDB oracle computes the
  * *identical* value: `bigint(md5[0:12])` is a 48-bit hash both engines parse
  * exactly (`conv(hex)` in Spark, `CAST('0x…' AS BIGINT)` in DuckDB).
  */
object Pipeline {

  /** 48-bit portable content hash, Spark side. */
  private def h48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")
  private def h48Sql(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 12) AS BIGINT)"

  private val STOP = Seq("the", "a", "and", "of", "to", "in", "is")
  private val stopSqlList = STOP.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB mirror of [[graft.functions.WordNGramHashes]] for arbitrary n:
    * distinct 48-bit hashes of the word-n-grams (TextOps.SHINGLE_HASHES_D is
    * the n=3 instance). */
  private def shingleHashesSql(n: Int): String = {
    val toks = TextOps.TOKS_D
    val gram = (0 until n).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($toks)-${n - 2}), " +
      s"i -> ${TextOps.h48Sql(s"($gram)")}))"
  }

  /** Redaction patterns valid in both Java regex (Spark) and RE2 (DuckDB):
    * no backreferences, no lookaround. */
  private val PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PII_IP = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"

  /** Elementwise-difference squared distance: identical fold order in both
    * engines (zip-subtract then sequential dot). */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val d = zip_with(a, b, (x, y) => x - y)
    VectorOps.dot(d, d)
  }

  /** Nearest-centroid assignment as a map-side-combinable HASH AGGREGATE:
    * `scored` is the corpus × broadcast-centroids explode carrying a score
    * column `d` per (vec_id, cid); the best cid per vec_id is picked with
    * max_by/min_by on a (d, cid) struct — the same (score, then lowest cid)
    * tiebreak, and the same NaN placement, as the former row_number window,
    * but partial aggregation collapses the k-way explode BEFORE the shuffle
    * (k× fewer shuffled assignment rows, no sort). This is the stage that
    * touches every corpus row, so it sets the IVF/SemDeDup/k-means scale
    * shape. Measured at 1M vectors (PipelineScaleBench): ss_ivf_topk's
    * wall/shuffle are unchanged — its cost lives in the candidate-fetch
    * joins — but the assignment no longer contributes a corpus-sized sort,
    * which is what matters when k grows past 16 toward real IVF cell
    * counts (k=4096 would have sorted a 4096× explode). */
  private def nearestCentroid(scored: org.apache.spark.sql.DataFrame,
                              largest: Boolean,
                              keep: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    val best =
      if (largest) max_by(col("cid"), struct(col("d"), (-col("cid")).as("t")))
      else min_by(col("cid"), struct(col("d"), col("cid")))
    scored.groupBy(col("vec_id"))
      .agg(best.as("cell"), keep.map(c => first(col(c)).as(c)): _*)
  }

  /** Product-quantization encode + ADC score, shared by ss_pq_topk /
    * ss_pq_recall: M=4 subspaces × 16 centroids (donor vectors 100..115),
    * per-subspace distances computed once for both the encoding argmin and
    * the ≤5-query LUT. Returns (qid, nid, adc). */
  /** PQ encode stage shared by the ADC scorers: per-vector subspace codes
    * (`vec_id, m, code`) and the ≤5-query distance LUT (`qid, m, k, ld`). */
  private def pqCodesAndLut(t: Tables)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val M = 4; val D = 16
    val e = t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v"))
    val sub = e.select(col("vec_id"),
      posexplode(array((0 until M).map(m => slice(col("v"), m * D + 1, D)): _*))
        .as(Seq("m", "vs")))
    val cb = sub.filter(col("vec_id").between(100, 115))
      .select(col("m"), (col("vec_id") - 100).as("k"), col("vs").as("c"))
    val dists = sub.join(broadcast(cb), Seq("m"))
      .withColumn("dist", sqDist(col("vs"), col("c")))
      .select(col("vec_id"), col("m"), col("k"), col("dist"))
      .persist() // read twice: encoding pass + query LUT
    val codes = dists.groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist"), col("k"))).getField("k").as("code"))
    val lut = dists.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("m"), col("k"), col("dist").as("ld"))
    (codes, lut)
  }

  private def pqAdcScores(t: Tables): org.apache.spark.sql.DataFrame = {
    val (codes, lut) = pqCodesAndLut(t)
    codes.join(broadcast(lut),
        codes("m") === lut("m") && codes("code") === lut("k"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(graft.functions.Det.dsum(col("ld")).as("adc"))
      .select(col("qid"), col("vec_id").as("nid"), col("adc"))
  }

  /** DuckDB mirror of [[pqCodesAndLut]]: the `codes` + `lut` CTE chain. */
  private val PQ_BASE_CTES: String =
    "raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
    "sub AS (SELECT vec_id, m, v[m*16+1 : m*16+16] AS vs FROM raw, range(0, 4) r(m)), " +
    "cb AS (SELECT m, vec_id - 100 AS k, vs AS c FROM sub WHERE vec_id BETWEEN 100 AND 115), " +
    "dists AS (SELECT s.vec_id, s.m, c.k, list_dot_product(" +
    "list_transform(range(1, 17), i -> s.vs[CAST(i AS INT)] - c.c[CAST(i AS INT)]), " +
    "list_transform(range(1, 17), i -> s.vs[CAST(i AS INT)] - c.c[CAST(i AS INT)])) AS dist " +
    "FROM sub s JOIN cb c ON s.m = c.m), " +
    "codes AS (SELECT vec_id, m, k AS code FROM dists " +
    "QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, k) = 1), " +
    "lut AS (SELECT vec_id AS qid, m, k, dist AS ld FROM dists WHERE vec_id < 5)"

  /** DuckDB mirror of [[pqAdcScores]] up to the `sc` (qid, nid, adc) CTE. */
  private val PQ_SC_CTES: String = PQ_BASE_CTES + ", " +
    "sc AS (SELECT l.qid, c.vec_id AS nid, " +
    "CAST(CAST(SUM(CAST(l.ld AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS adc " +
    "FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.code " +
    "WHERE l.qid <> c.vec_id GROUP BY l.qid, c.vec_id)"

  /** DuckDB 64-dim squared-L2 between two DOUBLE[] expressions — same
    * zip-subtract-then-dot fold as [[sqDist]]. */
  private def sqDistSql(a: String, b: String): String =
    s"list_dot_product(list_transform(range(1, 65), i -> $a[CAST(i AS INT)] - $b[CAST(i AS INT)]), " +
    s"list_transform(range(1, 65), i -> $a[CAST(i AS INT)] - $b[CAST(i AS INT)]))"

  /** Map-side simhash projection shared by the near-dup queries. */
  private def simhashSig(t: Tables) =
    t.documents.select(col("doc_id"), col("lang"), col("source"),
        graft.functions.SimHash48(split(lower(trim(col("text"))), "\\s+")).as("simhash"))
      .persist() // both sides of the band join read this

  /** Candidate pairs for Hamming-distance ≤ `maxDist` near-dup, by LSH
    * banding: split the 48-bit simhash into 12 bands of 4 bits — any pair
    * within distance 10 < 12 differs in at most 10 bands, so (pigeonhole)
    * agrees on at least one FULL band and collides in that band's equi-join.
    * Exact superset of the former (lang,source) block cross-join's qualifying
    * pairs, but the join key space is (lang, source, band, 4 bits): a dominant
    * block (en/web ≈ whole corpus) no longer degenerates to all-pairs on one
    * task — work spreads over 12×16 finer buckets.
    *
    * The Hamming check runs INSIDE the bucket, before any exchange of pair
    * rows: each (lang, source, band, bkey) bucket is grouped once and
    * [[graft.functions.HammingNearPairs]] emits only qualifying pairs from a
    * generated xor+popcount loop. The former formulation — bucket SELF-JOIN,
    * then `bit_count <= maxDist` — enumerated every random band collision
    * (~4·n²/2¹⁶, the floor that made the registered dd_cluster take 807 s at
    * 1M docs in r20's PipelineScaleBench) as a materialized SortMergeJoin
    * row; callers then re-filtered the same Hamming bound AFTER the
    * distinct, so collisions also rode the distinct's exchange. Pair set is
    * unchanged (see HammingNearPairs' exactness note; distinct∘filter ≡
    * filter∘distinct for a row-value predicate). A pair colliding in several
    * bands is emitted once per band → distinct (over near-dup pairs only).
    * Returns (id1, id2, dist) with id1 < id2. */
  private def simhashBandPairs(sig: org.apache.spark.sql.DataFrame,
                               maxDist: Int,
                               bands: Int = 12, w: Int = 4) = {
    def bandKeys(h: org.apache.spark.sql.Column) =
      (0 until bands).map(j => shiftright(h, j * w).bitwiseAND(lit((1L << w) - 1)))
    val banded = sig.select(col("lang"), col("source"), col("doc_id"), col("simhash"),
      posexplode(array(bandKeys(col("simhash")): _*)).as(Seq("band", "bkey")))
    val pairs =
      if (w <= 8) {
        // coarse bands (few, HUGE buckets — the 12×4-bit dist≤10 shape):
        // group each bucket once and run the generated pair loop
        banded
          .groupBy(col("lang"), col("source"), col("band"), col("bkey"))
          .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("__graft_ms"))
          .select(explode(graft.functions.HammingNearPairs(col("__graft_ms"), maxDist))
            .as("__graft_p"))
          .select(col("__graft_p.id1").as("id1"), col("__graft_p.id2").as("id2"),
            col("__graft_p.dist").as("dist"))
      } else {
        // wide bands (2^w-sized key space — the 2×24-bit dist≤1 shape):
        // buckets hold ~1 member each, so there is no enumeration blow-up to
        // short-circuit and the equi-join (which AQE broadcasts when the
        // banded side is small, zero exchanges) beats grouping millions of
        // 1-element buckets through collect_list's sort-based fallback —
        // measured 5.6 s vs 31.7 s at 1M docs (OPTIMIZATION_r21.md)
        val a = banded.select(col("lang"), col("source"), col("band"), col("bkey"),
          col("doc_id").as("id1"), col("simhash").as("h1"))
        val b = banded.select(col("lang"), col("source"), col("band"), col("bkey"),
          col("doc_id").as("id2"), col("simhash").as("h2"))
        a.join(b, Seq("lang", "source", "band", "bkey"))
          .filter(col("id1") < col("id2") &&
            bit_count(col("h1").bitwiseXOR(col("h2"))) <= maxDist)
          .select(col("id1"), col("id2"),
            bit_count(col("h1").bitwiseXOR(col("h2"))).as("dist"))
      }
    pairs.distinct()
  }

  /** Candidates-then-fetch for dd_minhash_lsh: attach both shingle sets to
    * each candidate pair without ever exchanging the shingle table.
    *
    * Unpivots the pair list to (doc_id, id1, id2, side) — 2 rows/pair — and
    * joins it at `sets`. SIZE-DISPATCHED (r21 VERDICT wrong-list #5): the
    * unconditional `broadcast(sides)` was data-dependent — a degenerate
    * corpus of near-identical docs produces quadratic candidates and the
    * broadcast THROWS at Spark's 8 GB / 512M-row relation cap where the old
    * shuffle joins degraded gracefully. Candidate count is known cheaply
    * (the list is persisted and ~2 rows/pair · 28 B), so: under
    * `spark.graft.lsh.broadcastMaxCands` (default 5M pairs ≈ 10M side rows
    * ≈ a few hundred MB built) keep the broadcast; past it, pre-filter
    * `sets` with a Bloom filter over the candidate doc_ids (guide §3.2 — no
    * false negatives, so the inner join's result is identical) and let the
    * join shuffle only the matched ~2·cands rows plus false positives.
    * Both branches produce the same (id1, id2, s1, s2) frame: each
    * candidate id exists exactly once in `sets` (ids came from bands ⊆
    * sets), so every pair regroups from exactly its two side rows. */
  private[graft] def lshPairFetch(sets: org.apache.spark.sql.DataFrame,
                                    cands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val candsP = cands.persist()
    val nCands = candsP.count()
    val maxBcast = sets.sparkSession.conf
      .getOption("spark.graft.lsh.broadcastMaxCands").map(_.toLong)
      .getOrElse(5000000L)
    val sides = candsP.select(col("id1"), col("id2"),
      explode(array(
        struct(col("id1").as("doc_id"), lit(1).as("side")),
        struct(col("id2").as("doc_id"), lit(2).as("side")))).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("id1"), col("id2"),
        col("s.side").as("side"))
    val joined =
      if (nCands <= maxBcast) sets.join(broadcast(sides), Seq("doc_id"))
      else {
        import org.apache.spark.sql.graftshim
        val est = math.max(1024L, 2L * nCands) // ≥ distinct candidate ids
        val bits = math.min(10L * est, 1L << 33) // ~10 bits/item ≈ 1% fpp
        val bloom = candsP
          .select(explode(array(col("id1"), col("id2"))).as("doc_id"))
          .agg(graftshim.bloomFilterAgg(xxhash64(col("doc_id")), est, bits))
          .head().getAs[Array[Byte]](0)
        sets.filter(graftshim.bloomMightContain(bloom, xxhash64(col("doc_id"))))
          .join(sides, Seq("doc_id"))
      }
    joined
      .groupBy(col("id1"), col("id2"))
      .agg(first(when(col("side") === 1, col("hs")), ignoreNulls = true).as("s1"),
        first(when(col("side") === 2, col("hs")), ignoreNulls = true).as("s2"))
  }

  def entries: Seq[Q] = Seq(

    // -------------------------------------------------------- dedup: exact
    Q("dd_exact",
      t => t.documents
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(col("keep_id")),
      Some("SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n " +
        "FROM documents GROUP BY md5(text) ORDER BY keep_id")),

    // -------------------------------------------------------- text analysis
    Q("tx_tokens",
      t => t.documents.select(
          col("doc_id"),
          // casts: Spark size()/length() are INT, DuckDB len()/length() BIGINT
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))).cast("long").as("n_re"),
          length(col("text")).cast("long").as("len_chars"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_ws, " +
        "len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_re, " +
        "length(text) AS len_chars FROM documents ORDER BY doc_id")),

    Q("tx_quality",
      t => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        val nTok = size(toks)
        val nStop = graft.functions.CountInSet(
          split(lower(trim(col("text"))), "\\s+"), STOP) // codegen'd stopword count
        val nAlpha = graft.functions.CountAlphaChars(col("text")) // codegen'd alpha-char count
        t.documents.select(
            col("doc_id"),
            nTok.cast("long").as("n_tok"),
            (nStop.cast("double") / nTok).as("stop_ratio"),
            (nAlpha.cast("double") / length(col("text"))).as("alpha_ratio"))
          .withColumn("quality",
            lit(0.5e0) * col("stop_ratio") + lit(0.5e0) * col("alpha_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tok, " +
        s"CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS stop_ratio, " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio, " +
        s"0.5e0 * (CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+'))) " +
        "+ 0.5e0 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)) AS quality " +
        "FROM documents ORDER BY doc_id")),

    Q("tx_langid",  // n-gram/stopword-ratio language heuristic
      t => {
        val nTok = size(split(lower(trim(col("text"))), "\\s+"))
        val nStop = graft.functions.CountInSet(
          split(lower(trim(col("text"))), "\\s+"), STOP) // codegen'd stopword count
        t.documents.select(col("doc_id"),
            (nStop.cast("double") / nTok).as("en_score"))
          .withColumn("pred_lang", when(col("en_score") > 0.03e0, "en").otherwise("unknown"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, " +
        s"CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS en_score, " +
        s"CASE WHEN CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) > 0.03e0 THEN 'en' ELSE 'unknown' END AS pred_lang " +
        "FROM documents ORDER BY doc_id")),

    Q("tx_fingerprint",  // whitespace-normalized 48-bit content fingerprint
      t => t.documents.select(col("doc_id"),
          h48(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, " +
        h48Sql("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))") + " AS fp " +
        "FROM documents ORDER BY doc_id")),

    Q("tx_rolling_fp",  // Rabin–Karp rolling-hash fingerprint (min window hash)
      t => {
        val norm = lower(regexp_replace(trim(col("text")), "\\s+", " "))
        t.documents.select(col("doc_id"),
            graft.functions.RollingFingerprint(norm, 8).as("fp"),
            when(length(norm) === 0, 0L)
              .otherwise(greatest(length(norm).cast("long") - 7L, lit(1L))).as("n_win"))
          .orderBy(col("doc_id"))
      },
      Some(raw"WITH n AS (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS s FROM documents) " +
        "SELECT doc_id, CASE WHEN length(s) = 0 THEN 0 " +
        "WHEN length(s) < 8 THEN list_reduce(list_transform(range(1, length(s)+1), " +
        "i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS BIGINT)), (a,b) -> (a*257+b) % 2147483647) " +
        "ELSE list_min(list_transform(range(1, length(s)-8+2), " +
        "i -> list_reduce(list_transform(range(0,8), j -> CAST(ord(substr(s, CAST(i+j AS INT), 1)) AS BIGINT)), " +
        "(a,b) -> (a*257+b) % 2147483647))) END AS fp, " +
        "CASE WHEN length(s) = 0 THEN 0 ELSE greatest(length(s)-7, 1) END AS n_win " +
        "FROM n ORDER BY doc_id")),

    // -------------------------------------------------- dedup: MinHash + LSH
    Q("dd_minhash_sig",
      t => TextOps.minhashSignature(t.documents).orderBy(col("doc_id")),
      Some(s"WITH ${TextOps.minhashSigSql} SELECT * FROM sig ORDER BY doc_id")),

    Q("dd_minhash_lsh",  // band-bucket candidates, then exact-jaccard verify
      t => {
        // shingling is the dominant cost and feeds FOUR plan branches
        // (signature, two verify sides) — persist the hashed shingle sets
        // once (array<long>, never shingle strings); same at 100 TB:
        // checkpoint the shingle table, not recompute per use
        val sets = TextOps.shingleHashSets(t.documents).select(col("doc_id"), col("hs"))
          .persist()
        val bands = TextOps.lshBands(TextOps.minhashSignatureOf(sets)).persist()
        val cands = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
        // candidates-then-fetch, heavy bytes move ONCE: the former two
        // shuffle joins re-shuffled the WHOLE hashed-shingle table per side
        // (5.6 GB at 5M docs, r20 PipelineScaleBench). Candidate pairs are
        // tiny (~0.05/doc), so unpivot them to (doc_id, id1, id2, side) and
        // BROADCAST that against the persisted sets — the shingle table is
        // never exchanged; only the ~2 rows/pair that matched ship into the
        // per-pair regroup. Inner-join/group equivalence: both candidate ids
        // come from `bands` ⊆ `sets`, so every pair gets exactly one row per
        // side and exactly one group — the same (id1, id2, s1, s2) rows the
        // two-join form produced.
        lshPairFetch(sets, cands)
          .withColumn("inter", size(array_intersect(col("s1"), col("s2"))))
          .withColumn("jacc", col("inter").cast("double") /
            (size(col("s1")) + size(col("s2")) - col("inter")))
          .filter(col("jacc") >= 0.5e0)
          .select(col("id1"), col("id2"), col("jacc"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"WITH ${TextOps.minhashSigSql}, ${TextOps.lshBandsSql()}, " +
        "cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM bands a " +
        "JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id), " +
        s"sets AS (SELECT doc_id, ${TextOps.SHINGLE_HASHES_D} AS s FROM documents) " +
        s"SELECT id1, id2, ${TextOps.jaccardSql("x.s", "y.s")} AS jacc " +
        "FROM cand JOIN sets x ON x.doc_id = id1 JOIN sets y ON y.doc_id = id2 " +
        s"WHERE ${TextOps.jaccardSql("x.s", "y.s")} >= 0.5e0 ORDER BY id1, id2")),

    // ---------------------------------------- dedup: blocked n-gram Jaccard
    // inverted-index formulation: explode shingles, join on shingle within
    // (lang, source) blocks, count shared → jaccard. Linear in shared-shingle
    // pairs, not quadratic in docs — the shape that survives 100 TB.
    Q("dd_ngram_jaccard",
      t => {
        val sets = TextOps.shingleHashSets(t.documents).withColumn("nsh", size(col("hs")))
        // dictionary-encode the (lang, source) block key before the explode
        // (guide §2.3 "narrower types / shuffle keys"): the domain is tiny
        // (distinct + row_number, broadcast back), and the posting exchange
        // below is the query's dominant cost at corpus scale — ~60 exploded
        // rows/doc that each carried both label strings (~64 B/row unsafe)
        // now carry a 4-byte ls_id (~28 B/row), and the window/join sort
        // compares two fixed-width ints instead of two strings + a long.
        // Exact: row_number ids are injective over the distinct pairs, so
        // (ls_id, shh) equality ⟺ (lang, source, shh) equality; docs with a
        // NULL lang/source never produced a pair in the equality self-join
        // (NULL === NULL is NULL) and are dropped by the inner dictionary
        // join before shuffling — same output rows either way.
        val dims = sets.select(col("lang"), col("source")).distinct()
          .withColumn("ls_id", row_number().over(org.apache.spark.sql.expressions
            .Window.orderBy(col("lang"), col("source"))))
        // hot-shingle cap: a shingle appearing in >1000 docs of a block is
        // boilerplate, not signal, and its posting list alone would emit
        // ~df^2/2 candidate pairs — the one remaining quadratic term at
        // corpus scale. The window shares the (ls_id, shh) shuffle with the
        // self-join below; the oracle applies the same cap.
        val capped = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ls_id"), col("shh"))
        val inv = sets.join(broadcast(dims), Seq("lang", "source"))
          .select(col("ls_id"), col("doc_id"), col("nsh"),
            explode(col("hs")).as("shh")) // fixed-width keys: cheap shuffle
          .withColumn("__df", count(lit(1)).over(capped))
          .filter(col("__df") <= 1000).drop("__df")
          .persist() // self-joined below: cache, don't re-shingle both sides
        val shared = inv.as("a").join(inv.as("b"),
            col("a.ls_id") === col("b.ls_id") &&
              col("a.shh") === col("b.shh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id"), col("b.doc_id"), col("a.nsh"), col("b.nsh"))
          .agg(count(lit(1)).as("inter"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
            (col("inter").cast("double") /
              (col("a.nsh") + col("b.nsh") - col("inter"))).as("jacc"))
        shared.filter(col("jacc") >= 0.5e0)
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"WITH sets AS (SELECT doc_id, lang, source, ${TextOps.SHINGLES_D} AS s FROM documents), " +
        "inv0 AS (SELECT doc_id, lang, source, len(s) AS nsh, unnest(s) AS sh FROM sets), " +
        s"invA AS (SELECT doc_id, lang, source, nsh, ${TextOps.h48Sql("sh")} AS shh FROM inv0), " +
        "inv AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY lang, source, shh) AS df " +
        "FROM invA) WHERE df <= 1000), " +
        "pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.nsh AS n1, b.nsh AS n2, count(*) AS inter " +
        "FROM inv a JOIN inv b ON a.lang = b.lang AND a.source = b.source AND a.shh = b.shh " +
        "AND a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4) " +
        "SELECT id1, id2, CAST(inter AS DOUBLE) / (n1 + n2 - inter) AS jacc FROM pairs " +
        "WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.5e0 ORDER BY id1, id2")),

    // -------------------------------------------------------- dedup: SimHash
    Q("dd_simhash",
      t => TextOps.simhash(t.documents).orderBy(col("doc_id")),
      Some(s"WITH ${TextOps.simhashSql} SELECT doc_id, simhash FROM sim ORDER BY doc_id")),

    Q("dd_simhash_pairs",  // Hamming-banded near-dup candidates (exact result)
      t => {
        simhashBandPairs(simhashSig(t), maxDist = 10)
          .select(col("id1"), col("id2"), col("dist"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"WITH ${TextOps.simhashSql}, " +
        "sg AS (SELECT d.doc_id, d.lang, d.source, sim.simhash FROM documents d JOIN sim ON d.doc_id = sim.doc_id) " +
        "SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS dist " +
        "FROM sg a JOIN sg b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 10 ORDER BY id1, id2")),

    // ----------------------------------- dedup: clusters → canonical docs
    // near-dup dedup doesn't end at pairs: candidate edges are grouped into
    // connected components and one canonical doc survives per cluster.
    // Components via min-contraction (GraphOps) — the edge set shrinks every
    // round and dense near-dup graphs collapse in a handful of rounds; the
    // DuckDB oracle computes the same fixpoint with a recursive CTE.
    Q("dd_cluster",
      t => {
        val pairs = simhashBandPairs(simhashSig(t), maxDist = 10)
          .select(col("id1").as("src"), col("id2").as("dst"))
        GraphOps.connectedComponents(
            t.documents.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("root").as("cluster"))
          .withColumn("is_canonical", col("doc_id") === col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH RECURSIVE ${TextOps.simhashSql}, " +
        "sg AS (SELECT d.doc_id, d.lang, d.source, sim.simhash FROM documents d JOIN sim ON d.doc_id = sim.doc_id), " +
        "pr AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM sg a JOIN sg b " +
        "ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 10), " +
        "ed AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id) " +
        "SELECT id AS doc_id, min(r) AS cluster, min(r) = id AS is_canonical " +
        "FROM reach GROUP BY id ORDER BY doc_id")),

    // The SCALE variant of dd_cluster: 2 bands × 24 bits over the 48-bit
    // simhash — exact for Hamming ≤ 1 (pigeonhole: 2 bands > 1 differing
    // bit), the near-identical clustering bar production simhash dedup runs
    // at corpus scale. Candidate pairs fall from ~n²/32 per block (the
    // 12×4-bit dist≤10-exact shape above — 807 s at 1M docs,
    // PipelineScaleBench) to ~2·n²/2²⁴ random collisions; a dist>1 pair
    // that happens to collide on one band is removed by the exact
    // post-filter, so the result is exactly the dist≤1 clustering.
    Q("dd_cluster_wide",
      t => {
        val pairs = simhashBandPairs(simhashSig(t), maxDist = 1, bands = 2, w = 24)
          .select(col("id1").as("src"), col("id2").as("dst"))
        GraphOps.connectedComponents(
            t.documents.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("root").as("cluster"))
          .withColumn("is_canonical", col("doc_id") === col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH RECURSIVE ${TextOps.simhashSql}, " +
        "sg AS (SELECT d.doc_id, d.lang, d.source, sim.simhash FROM documents d JOIN sim ON d.doc_id = sim.doc_id), " +
        "pr AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM sg a JOIN sg b " +
        "ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 1), " +
        "ed AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id) " +
        "SELECT id AS doc_id, min(r) AS cluster, min(r) = id AS is_canonical " +
        "FROM reach GROUP BY id ORDER BY doc_id")),

    // The dedup ACTION that follows clustering: keep the best-quality member
    // of every near-dup cluster (fineweb/C4 style "representative selection"),
    // quality being tx_quality's stopword/alpha score, ties broken by min
    // doc_id. The rank is a window partitioned by cluster — one shuffle keyed
    // by cluster id, no join explosion; singleton clusters pass straight
    // through as keep=true.
    Q("dd_keep_best",
      t => {
        val pairs = simhashBandPairs(simhashSig(t), maxDist = 10)
          .select(col("id1").as("src"), col("id2").as("dst"))
        val clusters = GraphOps.connectedComponents(
            t.documents.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("root").as("cluster"))
        val nTok = size(split(lower(trim(col("text"))), "\\s+"))
        val nStop = graft.functions.CountInSet(
          split(lower(trim(col("text"))), "\\s+"), STOP) // codegen'd stopword count
        val nAlpha = graft.functions.CountAlphaChars(col("text")) // codegen'd alpha-char count
        val qual = t.documents.select(col("doc_id"),
          (lit(0.5e0) * (nStop.cast("double") / nTok) +
            lit(0.5e0) * (nAlpha.cast("double") / length(col("text")))).as("quality"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("quality").desc, col("doc_id"))
        clusters.join(qual, Seq("doc_id"))
          .withColumn("keep", row_number().over(w) === 1)
          .select(col("doc_id"), col("cluster"), col("quality"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH RECURSIVE ${TextOps.simhashSql}, " +
        "sg AS (SELECT d.doc_id, d.lang, d.source, sim.simhash FROM documents d JOIN sim ON d.doc_id = sim.doc_id), " +
        "pr AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM sg a JOIN sg b " +
        "ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 10), " +
        "ed AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id), " +
        "cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id), " +
        "qual AS (SELECT doc_id, " +
        s"0.5e0 * (CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+'))) " +
        "+ 0.5e0 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)) AS quality " +
        "FROM documents) " +
        "SELECT cl.doc_id, cl.cluster, qual.quality, " +
        "row_number() OVER (PARTITION BY cl.cluster ORDER BY qual.quality DESC, cl.doc_id) = 1 AS keep " +
        "FROM cl JOIN qual ON cl.doc_id = qual.doc_id ORDER BY cl.doc_id")),

    // ExactSubstr-style span dedup (Lee et al. 2021, "Deduplicating Training
    // Data Makes Language Models Better", approximated at word-8-gram grain):
    // a span duplicated across documents is found via an inverted index on
    // span hashes — groupBy(h) document frequency, then an equi-join back to
    // score each doc's duplicated-span ratio. Both shuffles key on the 48-bit
    // span hash (near-uniform); boilerplate hot spans are the AQE-skew-join
    // case, and at extreme scale the dd_ngram_jaccard posting-list cap
    // applies. No pair join anywhere — cost is linear in total spans.
    Q("dd_span_dedup",
      t => {
        val spans = t.documents.select(col("doc_id"),
          explode(graft.functions.WordNGramHashes(
            split(lower(trim(col("text"))), "\\s+"), 8)).as("h"))
        val docFreq = spans.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        val perDoc = spans.join(docFreq, Seq("h"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            count(when(col("nd") >= 2, lit(1))).as("n_dup"))
        t.documents.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup"))
          .withColumn("dup_ratio", when(col("n_spans") === 0, lit(0.0e0))
            .otherwise(col("n_dup").cast("double") / col("n_spans")))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH sp AS (SELECT doc_id, unnest(${shingleHashesSql(8)}) AS h FROM documents), " +
        "df AS (SELECT h, count(*) AS nd FROM sp GROUP BY h), " +
        "pd AS (SELECT doc_id, count(*) AS n_spans, " +
        "count(*) FILTER (WHERE nd >= 2) AS n_dup " +
        "FROM sp JOIN df USING (h) GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(pd.n_spans, 0) AS n_spans, " +
        "coalesce(pd.n_dup, 0) AS n_dup, " +
        "CASE WHEN coalesce(pd.n_spans, 0) = 0 THEN 0.0e0 " +
        "ELSE CAST(pd.n_dup AS DOUBLE) / pd.n_spans END AS dup_ratio " +
        "FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id ORDER BY d.doc_id")),

    // ------------------------------------------- dedup: embedding near-dup
    // LSH-blocked, like every near-dup dedup at corpus scale: candidates are
    // pairs whose 8-bit hyperplane signatures differ in ≤ 2 bits (multi-probe:
    // one side explodes the 37 ≤2-bit XOR masks, the other joins on its home
    // bucket — a pair collides on exactly ONE probe, so no dedup pass), then
    // the exact cosine is computed on candidates only. The former all-pairs
    // `id1 < id2` theta join was a BroadcastNestedLoopJoin — O(n²) rows at any
    // scale, the one plan here that could never finish at 100 TB. The oracle
    // mirrors the same blocking, so the gate checks identical semantics.
    //
    // DECLARED FLOOR (the 100 TB default story, SURVEY §2.11): this
    // registered 8-bit shape keeps a ~37·n²/256 candidate floor — ~453k
    // candidate pairs at 32k vectors (PipelineScaleBench), quadratic past
    // that. It stays registered at these parameters because its results are
    // oracle-declared; a 100 TB deployment runs `dd_embed_cosine_wide`
    // (below) — same operator, 24-plane signature and candidates-then-fetch,
    // ~27 candidates/vector at 1M with headroom to billions by adding
    // planes. The two entries are the documented small-corpus/corpus-scale
    // pair, not alternatives.
    Q("dd_embed_cosine",
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .withColumn("bucket", VectorOps.lshBucket(col("v")))
          .persist() // normalize once, read from cache on both join sides
        val masks = VectorOps.probeMasks(8, 2)
        val a = e.select(col("vec_id").as("id1"), col("vn").as("va"),
          explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("probe"))
        val b = e.select(col("vec_id").as("id2"), col("vn").as("vb"),
          col("bucket").as("probe"))
        a.join(b, Seq("probe")).filter(col("id1") < col("id2"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .filter(col("cos") >= 0.35e0)
          .select(col("id1"), col("id2"), col("cos"))
          .orderBy(col("id1"), col("id2"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn, " +
        s"${VectorOps.lshBucketSql("v")} AS bucket FROM raw) " +
        s"SELECT a.vec_id AS id1, b.vec_id AS id2, ${VectorOps.dotSql("a.vn", "b.vn")} AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "AND bit_count(xor(CAST(a.bucket AS BIGINT), CAST(b.bucket AS BIGINT))) <= 2 " +
        s"WHERE ${VectorOps.dotSql("a.vn", "b.vn")} >= 0.35e0 ORDER BY id1, id2")),

    // The SCALE variant of the blocked near-dup above, with both knobs
    // turned for million-to-billion-row corpora (PipelineScaleBench: 27
    // candidates/vector at 1M): a 24-plane signature shrinks the candidate
    // set ~301·n²/2²⁴, and the probe explode ships bare (id, probe) pairs —
    // vectors are fetched per-CANDIDATE afterwards (the dd_minhash_lsh
    // verify shape), so the 301× explode shuffles 16-byte rows, never
    // 512-byte vectors. A pair collides on exactly one probe (see
    // VectorOps.probeMasks), so no dedup pass; the oracle states the same
    // semantics directly as a ≤2-bit Hamming predicate over 24-bit buckets.
    Q("dd_embed_cosine_wide",
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .withColumn("bucket", VectorOps.lshBucket(col("v"), 64, 24))
          .select(col("vec_id"), col("vn"), col("bucket"))
          .persist() // probe sides + both candidate fetches read this
        val masks = VectorOps.probeMasks(24, 2)
        val a = e.select(col("vec_id").as("id1"),
          explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("probe"))
        val b = e.select(col("vec_id").as("id2"), col("bucket").as("probe"))
        a.join(b, Seq("probe")).filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"))
          .join(e.select(col("vec_id").as("id1"), col("vn").as("va")), "id1")
          .join(e.select(col("vec_id").as("id2"), col("vn").as("vb")), "id2")
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .filter(col("cos") >= 0.35e0)
          .select(col("id1"), col("id2"), col("cos"))
          .orderBy(col("id1"), col("id2"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn, " +
        s"${VectorOps.lshBucketSql("v", 64, 24)} AS bucket FROM raw) " +
        s"SELECT a.vec_id AS id1, b.vec_id AS id2, ${VectorOps.dotSql("a.vn", "b.vn")} AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "AND bit_count(xor(CAST(a.bucket AS BIGINT), CAST(b.bucket AS BIGINT))) <= 2 " +
        s"WHERE ${VectorOps.dotSql("a.vn", "b.vn")} >= 0.35e0 ORDER BY id1, id2")),

    // ----------------------------------------------- dedup: semantic (SemDeDup)
    // SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, then
    // near-dup only WITHIN each cluster — the trick that turns O(n²) semantic
    // dedup into Σ cᵢ² with k chosen so clusters stay bounded. Assignment is
    // a broadcast of k centroids + per-row argmax (map-side, no shuffle);
    // the within-cell self-join is an equi-join on cell. Keep rule is
    // deterministic first-wins: drop a vector iff some LOWER-id member of its
    // cell has cosine ≥ τ (max over doubles is order-independent, so no
    // decimal detour needed). τ = 0.35 matches dd_embed_cosine's near-dup bar.
    Q("dd_semdedup",
      t => {
        val tau = 0.35e0
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("vn").as("vc"))
        val asg = nearestCentroid(
            e.crossJoin(broadcast(cent))
              .withColumn("d", VectorOps.dot(col("vn"), col("vc"))),
            largest = true, keep = Seq("vn"))
          .select(col("vec_id"), col("cell"), col("vn"))
          .persist() // assignment feeds both self-join sides + the final projection
        val prior = asg.select(col("cell"), col("vec_id").as("prev_id"), col("vn").as("vb"))
        val mx = asg.select(col("cell"), col("vec_id"), col("vn").as("va"))
          .join(prior, Seq("cell")).filter(col("prev_id") < col("vec_id"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .groupBy(col("vec_id")).agg(max(col("cos")).as("max_cos"))
        asg.join(mx, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("max_cos"), lit(-1.0e0)).as("max_prev_cos"),
            (coalesce(col("max_cos"), lit(-1.0e0)) < tau).as("keep"))
          .orderBy(col("vec_id"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn FROM raw), " +
        "cent AS (SELECT vec_id AS cid, vn AS vc FROM e WHERE vec_id < 16), " +
        "asg AS (SELECT e.vec_id, e.vn, c.cid AS cell, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("e.vn", "c.vc")} DESC, c.cid) AS ark " +
        "FROM e CROSS JOIN cent c QUALIFY ark = 1), " +
        s"mx AS (SELECT a.vec_id, max(${VectorOps.dotSql("a.vn", "b.vn")}) AS max_cos " +
        "FROM asg a JOIN asg b ON a.cell = b.cell AND b.vec_id < a.vec_id GROUP BY a.vec_id) " +
        "SELECT a.vec_id, a.cell, coalesce(mx.max_cos, -1.0e0) AS max_prev_cos, " +
        "coalesce(mx.max_cos, -1.0e0) < 0.35e0 AS keep " +
        "FROM asg a LEFT JOIN mx USING (vec_id) ORDER BY a.vec_id")),

    // ------------------------------------------------- similarity search
    Q("ss_brute_topk",  // exact cosine top-5 for query set vec_id < 10
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .persist()
        val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("vn").as("va"))
        val n = e.select(col("vec_id").as("nid"), col("vn").as("vb"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        broadcast(q).join(n, col("qid") =!= col("nid"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 5)
          .select(col("qid"), col("nid"), col("rk"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn FROM raw) " +
        s"SELECT q.vec_id AS qid, n.vec_id AS nid, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${VectorOps.dotSql("q.vn", "n.vn")} DESC, n.vec_id) AS rk, " +
        s"${VectorOps.dotSql("q.vn", "n.vn")} AS cos " +
        "FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id " +
        s"QUALIFY rk <= 5 ORDER BY qid, rk")),

    Q("ss_lsh_topk",  // hyperplane-LSH bucketed ANN: join only within bucket
      t => {
        val e = VectorOps.withNormalized(
            t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .withColumn("bucket", VectorOps.lshBucket(col("v")))
          .persist()
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("vn").as("va"), col("bucket"))
        val n = e.select(col("vec_id").as("nid"), col("vn").as("vb"), col("bucket"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        broadcast(q).join(n, Seq("bucket")).filter(col("qid") =!= col("nid"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 5)
          .select(col("qid"), col("nid"), col("rk"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn, " +
        s"${VectorOps.lshBucketSql("v")} AS bucket FROM raw) " +
        s"SELECT q.vec_id AS qid, n.vec_id AS nid, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${VectorOps.dotSql("q.vn", "n.vn")} DESC, n.vec_id) AS rk, " +
        s"${VectorOps.dotSql("q.vn", "n.vn")} AS cos " +
        "FROM e q JOIN e n ON q.vec_id < 10 AND n.bucket = q.bucket AND n.vec_id <> q.vec_id " +
        s"QUALIFY rk <= 5 ORDER BY qid, rk")),

    // ANN quality gate: recall@5 of the LSH index against the exact
    // brute-force neighbors — the eval every production ANN deployment runs
    // before switching off exact search. One scored candidate frame feeds
    // both rankings; the query side stays a broadcast.
    Q("ss_recall_eval",
      t => {
        val e = VectorOps.withNormalized(
            t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .withColumn("bucket", VectorOps.lshBucket(col("v")))
          .persist()
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("vn").as("va"), col("bucket").as("qb"))
        val n = e.select(col("vec_id").as("nid"), col("vn").as("vb"), col("bucket").as("nb"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        val scored = broadcast(q).join(n, col("qid") =!= col("nid"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")))
          .persist() // ground truth and LSH ranking share the scores
        val truth = scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        // multi-probe candidate set (≤2-bit bucket distance, like
        // dd_embed_cosine's blocking) — single-bucket recall@5 is ~0 here
        val approx = scored.filter(bit_count(col("qb").bitwiseXOR(col("nb"))) <= 2)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        val hits = truth.join(approx, Seq("qid", "nid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
        q.select(col("qid")).join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) / lit(5.0e0)).as("recall5"))
          .orderBy(col("qid"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn, " +
        s"${VectorOps.lshBucketSql("v")} AS bucket FROM raw), " +
        "sc AS (SELECT q.vec_id AS qid, n.vec_id AS nid, q.bucket AS qb, n.bucket AS nb, " +
        s"${VectorOps.dotSql("q.vn", "n.vn")} AS cos FROM e q JOIN e n " +
        "ON q.vec_id < 10 AND n.vec_id <> q.vec_id), " +
        "truth AS (SELECT qid, nid FROM sc " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) <= 5), " +
        "approx AS (SELECT qid, nid FROM sc WHERE bit_count(xor(nb, qb)) <= 2 " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) <= 5), " +
        "h AS (SELECT t.qid, count(*) AS n_hit FROM truth t JOIN approx a USING (qid, nid) GROUP BY t.qid) " +
        "SELECT q.vec_id AS qid, coalesce(h.n_hit, 0) AS n_hit, " +
        "coalesce(h.n_hit, 0) / 5.0e0 AS recall5 " +
        "FROM e q LEFT JOIN h ON h.qid = q.vec_id WHERE q.vec_id < 10 ORDER BY qid")),

    // IVF quality gate, the ss_recall_eval analog for the cell-probe index:
    // recall@5 of (16 cells, nprobe=4) against the exact neighbors. At
    // billion scale this is the eval that picks nlist/nprobe; the plan keeps
    // the query side broadcast and scores each candidate exactly once.
    Q("ss_ivf_recall",
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .persist()
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("vn").as("vc"))
        val asg = nearestCentroid(
            e.crossJoin(broadcast(cent))
              .withColumn("d", VectorOps.dot(col("vn"), col("vc"))),
            largest = true)
          .select(col("vec_id"), col("cell"))
        val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cid"))
        val probe = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("vn").as("vq"))
          .crossJoin(broadcast(cent))
          .withColumn("d", VectorOps.dot(col("vq"), col("vc")))
          .withColumn("prk", row_number().over(pw)).filter(col("prk") <= 4)
          .select(col("qid"), col("cid"))
        val cands = probe.join(asg, probe("cid") === asg("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid")).distinct()
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("vn").as("vq"))
        val scored = broadcast(q)
          .join(e.select(col("vec_id").as("nid"), col("vn").as("vb")),
            col("qid") =!= col("nid"))
          .withColumn("cos", VectorOps.dot(col("vq"), col("vb")))
          .persist() // ground truth and IVF ranking share the scores
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        val truth = scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        val approx = scored.join(cands, Seq("qid", "nid"), "left_semi")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        val hits = truth.join(approx, Seq("qid", "nid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
        q.select(col("qid")).join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) / lit(5.0e0)).as("recall5"))
          .orderBy(col("qid"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn FROM raw), " +
        "cent AS (SELECT vec_id AS cid, vn AS vc FROM e WHERE vec_id < 16), " +
        "asg AS (SELECT e.vec_id, c.cid AS cell, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("e.vn", "c.vc")} DESC, c.cid) AS ark " +
        "FROM e CROSS JOIN cent c QUALIFY ark = 1), " +
        "probe AS (SELECT q.vec_id AS qid, c.cid, row_number() OVER (PARTITION BY q.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("q.vn", "c.vc")} DESC, c.cid) AS prk " +
        "FROM e q CROSS JOIN cent c WHERE q.vec_id < 10 QUALIFY prk <= 4), " +
        "cand AS (SELECT DISTINCT p.qid, a.vec_id AS nid FROM probe p " +
        "JOIN asg a ON a.cell = p.cid WHERE a.vec_id <> p.qid), " +
        "sc AS (SELECT q.vec_id AS qid, n.vec_id AS nid, " +
        s"${VectorOps.dotSql("q.vn", "n.vn")} AS cos FROM e q JOIN e n " +
        "ON q.vec_id < 10 AND n.vec_id <> q.vec_id), " +
        "truth AS (SELECT qid, nid FROM sc " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) <= 5), " +
        "approx AS (SELECT sc.qid, sc.nid FROM sc JOIN cand USING (qid, nid) " +
        "QUALIFY row_number() OVER (PARTITION BY sc.qid ORDER BY sc.cos DESC, sc.nid) <= 5), " +
        "h AS (SELECT t.qid, count(*) AS n_hit FROM truth t JOIN approx a USING (qid, nid) GROUP BY t.qid) " +
        "SELECT q.vec_id AS qid, coalesce(h.n_hit, 0) AS n_hit, " +
        "coalesce(h.n_hit, 0) / 5.0e0 AS recall5 " +
        "FROM e q LEFT JOIN h ON h.qid = q.vec_id WHERE q.vec_id < 10 ORDER BY qid")),

    Q("ss_ivf_topk",  // IVF coarse quantizer: assign to cells, probe 4 nearest
      // the classic billion-scale ANN layout: k centroids partition the
      // corpus; a query scans only its nprobe closest cells. Here centroids
      // are the first 16 vectors (deterministic stand-in for k-means — the
      // assignment/probe/rank plumbing is what scales, not the seeds).
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .persist()
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("vn").as("vc"))
        val asg = nearestCentroid(
            e.crossJoin(broadcast(cent))
              .withColumn("d", VectorOps.dot(col("vn"), col("vc"))),
            largest = true)
          .select(col("vec_id"), col("cell"))
        val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cid"))
        val probe = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("vn").as("vq"))
          .crossJoin(broadcast(cent))
          .withColumn("d", VectorOps.dot(col("vq"), col("vc")))
          .withColumn("prk", row_number().over(pw)).filter(col("prk") <= 4)
          .select(col("qid"), col("cid"))
        val cands = probe.join(asg, probe("cid") === asg("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid")).distinct()
        val rw = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        cands
          .join(e.select(col("vec_id").as("qid"), col("vn").as("vq")), "qid")
          .join(e.select(col("vec_id").as("nid"), col("vn").as("vb")), "nid")
          .withColumn("cos", VectorOps.dot(col("vq"), col("vb")))
          .withColumn("rk", row_number().over(rw).cast("long")).filter(col("rk") <= 5)
          .select(col("qid"), col("nid"), col("rk"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn FROM raw), " +
        "cent AS (SELECT vec_id AS cid, vn AS vc FROM e WHERE vec_id < 16), " +
        "asg AS (SELECT e.vec_id, c.cid AS cell, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("e.vn", "c.vc")} DESC, c.cid) AS ark " +
        "FROM e CROSS JOIN cent c QUALIFY ark = 1), " +
        "probe AS (SELECT q.vec_id AS qid, c.cid, row_number() OVER (PARTITION BY q.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("q.vn", "c.vc")} DESC, c.cid) AS prk " +
        "FROM e q CROSS JOIN cent c WHERE q.vec_id < 10 QUALIFY prk <= 4), " +
        "cand AS (SELECT DISTINCT p.qid, a.vec_id AS nid FROM probe p " +
        "JOIN asg a ON a.cell = p.cid WHERE a.vec_id <> p.qid) " +
        "SELECT qid, nid, row_number() OVER (PARTITION BY qid " +
        s"ORDER BY ${VectorOps.dotSql("q.vn", "n.vn")} DESC, nid) AS rk, " +
        s"${VectorOps.dotSql("q.vn", "n.vn")} AS cos " +
        "FROM cand JOIN e q ON q.vec_id = qid JOIN e n ON n.vec_id = nid " +
        "QUALIFY rk <= 5 ORDER BY qid, rk")),

    // Product quantization with ADC scoring (Jégou et al. 2011) — the
    // billion-scale ANN compression layout that IVF cells pair with: each
    // vector is encoded as M=4 subspace codes (16 centroids per 16-dim
    // subspace → 4 bytes/vector instead of 512), and a query scores the whole
    // corpus through a tiny (M×K) lookup table of subspace distances — no
    // full-vector math on the scan side. Codebook here is deterministic
    // (donor vectors 100..115 sliced per subspace; km_mstep demonstrates the
    // training iteration separately). Per-subspace distances are computed
    // once and reused for encoding AND the query LUT; the ADC sum routes
    // through Det.dsum so the 4-term float add is order-independent.
    Q("ss_pq_topk",
      t => {
        val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
        pqAdcScores(t)
          .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 5)
          .select(col("qid"), col("nid"), col("rk"), col("adc"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"WITH $PQ_SC_CTES " +
        "SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk, adc " +
        "FROM sc QUALIFY rk <= 5 ORDER BY qid, rk")),

    // PQ quality gate, closing the per-variant recall pattern (brute = exact,
    // LSH → ss_recall_eval, IVF → ss_ivf_recall): recall@5 of the production
    // PQ pipeline — ADC shortlist (top-100 over 4-byte codes) then exact
    // rerank of the shortlist only — against exact squared-L2 truth. Raw
    // ADC@5 with an untrained 16-centroid codebook is near-random on these
    // embeddings, which is exactly why real PQ deployments rerank; the
    // shortlist bound (here 20% of the corpus, sub-1% at real scale) is the
    // knob this eval picks. The exact-truth side broadcasts the 5-row query
    // set; rerank touches only shortlisted candidates.
    Q("ss_pq_recall",
      t => {
        val e = t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v"))
          .persist()
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("vq"))
        val scored = broadcast(q)
          .join(e.select(col("vec_id").as("nid"), col("v").as("vb")),
            col("qid") =!= col("nid"))
          .withColumn("sqd", sqDist(col("vq"), col("vb")))
          .persist() // ground truth and the rerank stage share the scores
        val w = Window.partitionBy(col("qid")).orderBy(col("sqd"), col("nid"))
        val truth = scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        val aw = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
        val short = pqAdcScores(t)
          .withColumn("srk", row_number().over(aw)).filter(col("srk") <= 100)
          .select(col("qid"), col("nid"))
        val rerank = scored.join(short, Seq("qid", "nid"), "left_semi")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).select(col("qid"), col("nid"))
        val hits = truth.join(rerank, Seq("qid", "nid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
        q.select(col("qid")).join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) / lit(5.0e0)).as("recall5"))
          .orderBy(col("qid"))
      },
      Some(s"WITH $PQ_SC_CTES, " +
        "short AS (SELECT qid, nid FROM sc " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc, nid) <= 100), " +
        "tr AS (SELECT q.vec_id AS qid, n.vec_id AS nid, list_dot_product(" +
        "list_transform(range(1, 65), i -> q.v[CAST(i AS INT)] - n.v[CAST(i AS INT)]), " +
        "list_transform(range(1, 65), i -> q.v[CAST(i AS INT)] - n.v[CAST(i AS INT)])) AS sqd " +
        "FROM raw q JOIN raw n ON q.vec_id < 5 AND n.vec_id <> q.vec_id), " +
        "truth AS (SELECT qid, nid FROM tr " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sqd, nid) <= 5), " +
        "rer AS (SELECT t.qid, t.nid FROM tr t JOIN short s USING (qid, nid) " +
        "QUALIFY row_number() OVER (PARTITION BY t.qid ORDER BY t.sqd, t.nid) <= 5), " +
        "h AS (SELECT t.qid, count(*) AS n_hit FROM truth t JOIN rer r USING (qid, nid) GROUP BY t.qid) " +
        "SELECT r.vec_id AS qid, coalesce(h.n_hit, 0) AS n_hit, " +
        "coalesce(h.n_hit, 0) / 5.0e0 AS recall5 " +
        "FROM raw r LEFT JOIN h ON h.qid = r.vec_id WHERE r.vec_id < 5 ORDER BY qid")),

    // IVFADC (Jégou et al. 2011, the FAISS IVF-PQ default): the two index
    // halves composed the way production deployments run them — the coarse
    // IVF quantizer routes each query to its nprobe=4 nearest cells, the PQ
    // ADC lookup scores ONLY vectors in those cells (4-byte codes, no
    // full-vector math), and the exact rerank touches only the top-20 ADC
    // shortlist. All metric math is squared-L2 (PQ's native metric). At
    // billion scale this plan reads nprobe/nlist of the corpus as codes and
    // 20 full vectors per query; every small side (centroids, LUT, query
    // set) broadcasts, and cell candidate lists flow through equi-joins.
    Q("ss_ivfpq_topk",
      t => {
        val e = t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v"))
          .persist() // corpus vectors feed assignment, probe, and the rerank
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("v").as("vc"))
        val asg = nearestCentroid(
            e.crossJoin(broadcast(cent))
              .withColumn("d", sqDist(col("v"), col("vc"))),
            largest = false)
          .select(col("vec_id"), col("cell"))
        val pw = Window.partitionBy(col("qid")).orderBy(col("d"), col("cid"))
        val probe = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("vq"))
          .crossJoin(broadcast(cent))
          .withColumn("d", sqDist(col("vq"), col("vc")))
          .withColumn("prk", row_number().over(pw)).filter(col("prk") <= 4)
          .select(col("qid"), col("cid"))
        val cands = probe.join(asg, probe("cid") === asg("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid")).distinct()
        val (codes, lut) = pqCodesAndLut(t)
        val adc = cands
          .join(codes.withColumnRenamed("vec_id", "nid"), Seq("nid"))
          .join(broadcast(lut.withColumnRenamed("qid", "lqid")),
            col("qid") === col("lqid") && codes("m") === lut("m") &&
              col("code") === col("k"))
          .groupBy(col("qid"), col("nid"))
          .agg(graft.functions.Det.dsum(col("ld")).as("adc"))
        val sw = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
        val short = adc.withColumn("srk", row_number().over(sw))
          .filter(col("srk") <= 20).select(col("qid"), col("nid"))
        val rw = Window.partitionBy(col("qid")).orderBy(col("sqd"), col("nid"))
        short
          .join(e.select(col("vec_id").as("qid"), col("v").as("vq")), "qid")
          .join(e.select(col("vec_id").as("nid"), col("v").as("vb")), "nid")
          .withColumn("sqd", sqDist(col("vq"), col("vb")))
          .withColumn("rk", row_number().over(rw).cast("long")).filter(col("rk") <= 5)
          .select(col("qid"), col("nid"), col("rk"), col("sqd"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"WITH $PQ_BASE_CTES, " +
        "cent AS (SELECT vec_id AS cid, v AS vc FROM raw WHERE vec_id < 16), " +
        "asg AS (SELECT r.vec_id, c.cid AS cell, row_number() OVER (PARTITION BY r.vec_id " +
        s"ORDER BY ${sqDistSql("r.v", "c.vc")}, c.cid) AS ark " +
        "FROM raw r CROSS JOIN cent c QUALIFY ark = 1), " +
        "probe AS (SELECT q.vec_id AS qid, c.cid, row_number() OVER (PARTITION BY q.vec_id " +
        s"ORDER BY ${sqDistSql("q.v", "c.vc")}, c.cid) AS prk " +
        "FROM raw q CROSS JOIN cent c WHERE q.vec_id < 5 QUALIFY prk <= 4), " +
        "cand AS (SELECT DISTINCT p.qid, a.vec_id AS nid FROM probe p " +
        "JOIN asg a ON a.cell = p.cid WHERE a.vec_id <> p.qid), " +
        "adc AS (SELECT l.qid, c.vec_id AS nid, " +
        "CAST(CAST(SUM(CAST(l.ld AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS adc " +
        "FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.code " +
        "JOIN cand ON cand.qid = l.qid AND cand.nid = c.vec_id " +
        "GROUP BY l.qid, c.vec_id), " +
        "short AS (SELECT qid, nid FROM adc " +
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc, nid) <= 20) " +
        "SELECT s.qid, s.nid, row_number() OVER (PARTITION BY s.qid " +
        s"ORDER BY ${sqDistSql("q.v", "n.v")}, s.nid) AS rk, " +
        s"${sqDistSql("q.v", "n.v")} AS sqd " +
        "FROM short s JOIN raw q ON q.vec_id = s.qid JOIN raw n ON n.vec_id = s.nid " +
        "QUALIFY rk <= 5 ORDER BY s.qid, rk")),

    Q("km_mstep",  // one k-means E+M step: assign to nearest centroid, re-average
      // the iterative-ML shape at corpus scale: E-step is a broadcast join +
      // per-row argmax (no shuffle), M-step shuffles (cell, dim) partial sums
      // — 16×64 groups regardless of corpus size, so the reduce side is
      // constant and the whole step is one linear pass per iteration.
      // Additive M-step sums route through DECIMAL (Det.dsum) so the new
      // centroids are identical under any partitioning (and vs the oracle).
      t => {
        val e = VectorOps.withNormalized(
          t.embeddings.select(col("vec_id"), VectorOps.vec(col("embedding")).as("v")))
          .persist()
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("vn").as("vc"))
        val asg = nearestCentroid(
            e.crossJoin(broadcast(cent))
              .withColumn("d", VectorOps.dot(col("vn"), col("vc"))),
            largest = true, keep = Seq("vn"))
          .select(col("vec_id"), col("cell"), col("vn"))
        asg.select(col("cell"), posexplode(col("vn")).as(Seq("dim", "x")))
          .groupBy(col("cell"), col("dim"))
          .agg(graft.functions.Det.dsum(col("x")).as("sum_x"), count(lit(1)).as("n"))
          .select(col("cell"), col("dim").cast("long").as("dim"),
            (col("sum_x") / col("n")).as("c_new"), col("n"))
          .orderBy(col("cell"), col("dim"))
      },
      Some("WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"e AS (SELECT vec_id, ${VectorOps.normalizedSql("v")} AS vn FROM raw), " +
        "cent AS (SELECT vec_id AS cid, vn AS vc FROM e WHERE vec_id < 16), " +
        "asg AS (SELECT e.vec_id, e.vn, c.cid AS cell, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${VectorOps.dotSql("e.vn", "c.vc")} DESC, c.cid) AS ark " +
        "FROM e CROSS JOIN cent c QUALIFY ark = 1), " +
        "x AS (SELECT cell, r.dim, vn[CAST(r.dim AS INT) + 1] AS x FROM asg, range(0, 64) AS r(dim)) " +
        "SELECT cell, dim, CAST(CAST(SUM(CAST(x AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / count(*) AS c_new, " +
        "count(*) AS n FROM x GROUP BY cell, dim ORDER BY cell, dim")),

    // ------------------------------------- training-batch construction ops
    Q("pk_pack",  // concat-and-chunk sequence packing into 2048-token windows
      // the standard LLM pretraining batcher: docs are concatenated in a
      // stable order and sliced into fixed context windows. Packing is
      // per-`source` (the shard key) so the running sum never needs a global
      // ordering — at 100 TB each shard packs independently in parallel.
      t => {
        val B = 2048L
        val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        t.documents
          .select(col("source"), col("doc_id"), nTok.as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .select(col("source"), col("doc_id"), col("n_tok"),
            (col("cum") - col("n_tok")).as("start_off"),
            floor((col("cum") - col("n_tok")) / B).cast("long").as("bin"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("WITH d AS (SELECT source, doc_id, " +
        "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok FROM documents), " +
        "c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d) " +
        "SELECT source, doc_id, n_tok, cum - n_tok AS start_off, " +
        "CAST(floor((cum - n_tok) / 2048.0e0) AS BIGINT) AS bin " +
        "FROM c ORDER BY source, doc_id")),

    Q("tx_c4_filter",  // C4-style heuristic keep/drop over cheap text signals
      t => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        val nTok = size(toks).cast("long")
        val nStop = graft.functions.CountInSet(
          split(lower(trim(col("text"))), "\\s+"), STOP) // codegen'd stopword count
        val meanWordLen = length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") / nTok
        t.documents
          .select(col("doc_id"), nTok.as("n_tok"),
            (nStop.cast("double") / nTok).as("stop_ratio"),
            meanWordLen.as("mean_wlen"))
          .withColumn("keep",
            col("n_tok") >= 10L && col("n_tok") <= 10000L &&
              col("stop_ratio") >= 0.01e0 && col("mean_wlen") < 12.0e0)
          .orderBy(col("doc_id"))
      },
      Some("WITH d AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok, " +
        s"CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains($stopSqlList, x))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS stop_ratio, " +
        "CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS mean_wlen FROM documents) " +
        "SELECT doc_id, n_tok, stop_ratio, mean_wlen, " +
        "(n_tok >= 10 AND n_tok <= 10000 AND stop_ratio >= 0.01e0 AND mean_wlen < 12.0e0) AS keep " +
        "FROM d ORDER BY doc_id")),

    // Corpus-frequency heavy hitters through the mergeable Misra–Gries sketch
    // ([[graft.functions.FreqSketchAgg]]): each partition keeps ≤ capacity
    // counters, the shuffle moves sketches (not the token stream), and the
    // final merge is associative — at 100 TB this replaces a full-vocabulary
    // groupBy with a constant-size reduce. Capacity 256 ≥ the fixture
    // vocabulary, so counts are exact and the DuckDB oracle gates them
    // against a plain count(*); the lossy regime (capacity < distinct) is
    // property-tested in FreqSketchSpec.
    Q("tx_heavy_hitters",
      t => {
        val toks = t.documents.select(
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        val entries = toks
          .agg(graft.functions.FreqSketchAgg(col("token"), 256).as("sk"))
          .select(explode(graft.functions.FreqSketchEntries(col("sk"))).as("e"))
          .select(col("e.token").as("token"), col("e.est").as("est"))
        val w = Window.orderBy(col("est").desc, col("token"))
        entries.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20).orderBy(col("rk"))
      },
      Some("WITH tk AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token FROM documents), " +
        "c AS (SELECT token, count(*) AS est FROM tk GROUP BY token) " +
        "SELECT token, est, row_number() OVER (ORDER BY est DESC, token) AS rk " +
        "FROM c QUALIFY rk <= 20 ORDER BY rk")),

    // Gopher quality rules (Rae et al. 2021 §A1.1): mean word length within
    // [3, 10], most words contain an alphabetic character, lexical diversity
    // (type-token ratio) above a floor. Complements tx_c4_filter (stopword
    // density) and tx_repetition (duplicate-line mass) — together the three
    // cover the classic pre-training text-quality gate. All map-side.
    Q("tx_gopher_filter",
      t => {
        val toksLower = split(lower(trim(col("text"))), "\\s+")
        val nTok = size(toksLower).cast("long")
        val meanWordLen = length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") / nTok
        val nAlphaWord = graft.functions.CountAlphaTokens(
          split(trim(col("text")), "\\s+")) // codegen'd has-ASCII-letter count
        t.documents
          .select(col("doc_id"), nTok.as("n_tok"),
            meanWordLen.as("mean_wlen"),
            (nAlphaWord.cast("double") / nTok).as("alpha_word_ratio"),
            (size(array_distinct(toksLower)).cast("double") / nTok).as("ttr"))
          .withColumn("keep",
            col("n_tok") >= 10L && col("mean_wlen") >= 3.0e0 && col("mean_wlen") <= 10.0e0 &&
              col("alpha_word_ratio") > 0.8e0 && col("ttr") > 0.2e0)
          .orderBy(col("doc_id"))
      },
      Some("WITH d AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok, " +
        "CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS mean_wlen, " +
        "CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS alpha_word_ratio, " +
        "CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS ttr FROM documents) " +
        "SELECT doc_id, n_tok, mean_wlen, alpha_word_ratio, ttr, " +
        "(n_tok >= 10 AND mean_wlen >= 3.0e0 AND mean_wlen <= 10.0e0 " +
        "AND alpha_word_ratio > 0.8e0 AND ttr > 0.2e0) AS keep " +
        "FROM d ORDER BY doc_id")),

    // Learned-model quality scoring (the fasttext/classifier-filter stage of
    // CCNet/RefinedWeb pipelines): a linear model over the Gopher features
    // with broadcast-able literal weights, thresholded at 0. The weights are
    // plan literals here; at 100 TB they come from a broadcast lookup —
    // either way the scoring is map-side with no shuffle. The combination is
    // a FIXED left-associated chain of IEEE ops so both engines produce the
    // identical double (no exp/sigmoid — libm differs across engines in the
    // last ulp; a monotone linear score thresholds identically).
    Q("tx_linear_score",
      t => {
        val toksLower = split(lower(trim(col("text"))), "\\s+")
        val nTok = size(toksLower).cast("long")
        val meanWordLen = length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") / nTok
        val nAlphaWord = graft.functions.CountAlphaTokens(
          split(trim(col("text")), "\\s+")) // codegen'd has-ASCII-letter count
        val f = t.documents.select(col("doc_id"), nTok.as("n_tok"),
          meanWordLen.as("mean_wlen"),
          (nAlphaWord.cast("double") / nTok).as("alpha_word_ratio"),
          (size(array_distinct(toksLower)).cast("double") / nTok).as("ttr"))
        val tokNorm = least(col("n_tok"), lit(500L)).cast("double") / lit(500.0e0)
        val score = lit(0.35e0) * col("alpha_word_ratio") +
          lit(0.25e0) * col("ttr") + lit(0.2e0) * tokNorm +
          lit(0.2e0) * (col("mean_wlen") / lit(10.0e0)) - lit(0.5e0)
        f.select(col("doc_id"), score.as("score"), (score > 0.0e0).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("WITH d AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok, " +
        "CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS mean_wlen, " +
        "CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS alpha_word_ratio, " +
        "CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE) " +
        "/ len(string_split_regex(trim(text), '\\s+')) AS ttr FROM documents), " +
        "s AS (SELECT doc_id, 0.35e0 * alpha_word_ratio + 0.25e0 * ttr + " +
        "0.2e0 * (CAST(least(n_tok, 500) AS DOUBLE) / 500.0e0) + " +
        "0.2e0 * (mean_wlen / 10.0e0) - 0.5e0 AS score FROM d) " +
        "SELECT doc_id, score, score > 0.0e0 AS keep FROM s ORDER BY doc_id")),

    Q("smp_stratified",  // deterministic 10% hash-sample per (lang, source)
      // map-side decision — no shuffle to sample at any scale; the groupBy
      // here only audits per-stratum totals vs sampled counts
      t => t.documents
        .withColumn("picked", pmod(h48(col("doc_id").cast("string")), lit(100L)) < 10L)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("picked"), 1L).otherwise(0L)).as("n_sample"))
        .orderBy(col("lang"), col("source")),
      Some("SELECT lang, source, count(*) AS n_total, " +
        s"CAST(sum(CASE WHEN ${h48Sql("doc_id::VARCHAR")} % 100 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sample " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source")),

    // CCNet-shaped LM quality scoring: build the corpus unigram table (the
    // "language model"), broadcast it, score every doc by its tokens' corpus
    // frequencies. Integer tf statistics instead of ln(p) keep the score
    // bit-exact across engines (libm ln differs in the last ulp); the plan —
    // vocab aggregation, broadcast model join, per-doc reduce — is the real
    // CCNet shape and holds at 100 TB (the vocab is sublinear in the corpus).
    Q("tx_unigram_freq",
      t => {
        val tok = t.documents.select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .persist() // tokenized once; feeds the vocab build AND the scoring join
        val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        tok.join(broadcast(vocab), Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"), sum(col("tf")).as("sum_tf"),
            min(col("tf")).as("min_tf"))
          .select(col("doc_id"), col("n_tok"),
            (col("sum_tf").cast("double") / col("n_tok")).as("avg_tf"),
            col("min_tf"))
          .orderBy(col("doc_id"))
      },
      Some(raw"WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok FROM documents), " +
        "v AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok) " +
        "SELECT doc_id, count(*) AS n_tok, CAST(sum(tf) AS DOUBLE) / count(*) AS avg_tf, " +
        "min(tf) AS min_tf FROM tok JOIN v USING (tok) GROUP BY doc_id ORDER BY doc_id")),

    // Temperature-based mixture weighting (multilingual-corpus sampling):
    // p(lang) ∝ n^α with α=1/2 — sqrt is correctly rounded IEEE in both
    // engines, and the decimal-summed normalizer keeps p deterministic.
    // Constant-size aggregate at any corpus scale.
    Q("smp_temperature",
      t => {
        val w = t.documents.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", sqrt(col("n_docs").cast("double")).cast(graft.functions.Det.dec))
        val tot = w.agg(sum(col("w")).as("tw"))
        w.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"),
            col("w").cast("double").as("weight"),
            (col("w").cast("double") / col("tw").cast("double")).as("p"),
            floor(col("w").cast("double") / col("tw").cast("double") * 1000.0e0)
              .cast("long").as("n_budget"))
          .orderBy(col("lang"))
      },
      Some("WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
        "w AS (SELECT lang, n_docs, CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,9)) AS w FROM c), " +
        "t AS (SELECT CAST(CAST(SUM(w) AS VARCHAR) AS DOUBLE) AS tw FROM w) " +
        "SELECT lang, n_docs, CAST(CAST(w AS VARCHAR) AS DOUBLE) AS weight, " +
        "CAST(CAST(w AS VARCHAR) AS DOUBLE) / tw AS p, " +
        "CAST(floor(CAST(CAST(w AS VARCHAR) AS DOUBLE) / tw * 1000.0e0) AS BIGINT) AS n_budget " +
        "FROM w, t ORDER BY lang")),

    // Gopher-style repetition signals: fraction of a doc's word n-grams that
    // are duplicates of an earlier n-gram in the SAME doc. High values mark
    // boilerplate/looping text. Map-side: the codegen'd WordNGrams already
    // dedups, so dup_frac = 1 − distinct/total.
    Q("tx_repetition",
      t => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        val n = size(toks).cast("long")
        def dupFrac(k: Int) = {
          val total = greatest(n - (k - 1), lit(0L))
          val dist = size(graft.functions.WordNGrams(toks, k)).cast("long")
          when(total > 0, lit(1.0e0) - dist.cast("double") / total).otherwise(0.0e0)
        }
        t.documents.select(col("doc_id"), n.as("n_tok"),
            dupFrac(2).as("dup2_frac"), dupFrac(3).as("dup3_frac"))
          .orderBy(col("doc_id"))
      },
      Some {
        val toks = TextOps.TOKS_D
        def gramList(k: Int) = {
          val gram = (0 until k).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
          s"list_transform(range(1, len($toks)-${k - 2}), i -> ($gram))"
        }
        def dupFrac(k: Int) =
          s"CASE WHEN greatest(len($toks)-${k - 1}, 0) > 0 THEN " +
            s"1.0e0 - CAST(len(list_distinct(${gramList(k)})) AS DOUBLE) / greatest(len($toks)-${k - 1}, 0) " +
            "ELSE 0.0e0 END"
        s"SELECT doc_id, len($toks) AS n_tok, ${dupFrac(2)} AS dup2_frac, " +
          s"${dupFrac(3)} AS dup3_frac FROM documents ORDER BY doc_id"
      }),

    // Corpus composition report: hierarchical (lang, source) rollup in ONE
    // pass — Spark expands grouping sets inside a single hash aggregation,
    // so the per-lang and grand-total rows cost no extra scan at any scale.
    Q("smp_rollup_stats",
      t => t.documents.rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first),
      Some("SELECT lang, source, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents " +
        "GROUP BY ROLLUP (lang, source) " +
        "ORDER BY lang NULLS FIRST, source NULLS FIRST")),

    // Corpus length-distribution monitoring: exact per-source quantiles of
    // doc length. Both engines interpolate type-7 ((n-1)·q rank) over the
    // same integers, so the doubles agree bit-for-bit. At 100 TB swap the
    // exact percentile for percentile_approx (t-digest) — same plan shape,
    // bounded memory.
    Q("tx_len_quantiles",
      t => t.documents.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, 0.5e0)").as("p50"),
          expr("percentile(n_chars, 0.9e0)").as("p90"),
          expr("percentile(n_chars, 0.99e0)").as("p99"))
        .orderBy(col("source")),
      Some("SELECT source, count(*) AS n_docs, " +
        "quantile_cont(n_chars, 0.5e0) AS p50, " +
        "quantile_cont(n_chars, 0.9e0) AS p90, " +
        "quantile_cont(n_chars, 0.99e0) AS p99 " +
        "FROM documents GROUP BY source ORDER BY source")),

    // the 100 TB swap for the exact rank quantiles above: a mergeable
    // t-digest (constant memory per group, map-side partials, associative
    // merge — functions/TDigest.scala). A sketch is ε-approximate and merge-
    // order-sensitive, so the oracle gates the t-digest's actual guarantee —
    // RANK error: a second corpus pass (broadcast of the per-source digests)
    // computes each estimate's rank interval [#(x<est), #(x≤est)]/n (ties
    // widen it) and φ must fall inside within max(2%, 2/n). Exact quantiles
    // hash-match alongside; DuckDB asserts the rank gate as TRUE.
    Q("tx_len_quantiles_td",
      t => {
        import graft.functions.{TDigestAgg, TDigestQuantile}
        val agg = t.documents.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, 0.5e0)").as("p50"),
          expr("percentile(n_chars, 0.9e0)").as("p90"),
          expr("percentile(n_chars, 0.99e0)").as("p99"),
          TDigestAgg(col("n_chars").cast("double"), 100).as("dig"))
        val est = agg.select(col("source"), col("n_docs"),
          col("p50"), col("p90"), col("p99"),
          TDigestQuantile(col("dig"), 0.5).as("est50"),
          TDigestQuantile(col("dig"), 0.9).as("est90"),
          TDigestQuantile(col("dig"), 0.99).as("est99"))
        def rankOk(phi: Double, estCol: String): org.apache.spark.sql.Column = {
          val n = count(lit(1)).cast("double")
          val below = sum(when(col("n_chars") < col(estCol), 1).otherwise(0)) / n
          val atOrBelow = sum(when(col("n_chars") <= col(estCol), 1).otherwise(0)) / n
          val tol = greatest(lit(0.02e0), lit(2.0e0) / n)
          lit(phi) >= below - tol && lit(phi) <= atOrBelow + tol
        }
        t.documents.join(broadcast(est), Seq("source"))
          .groupBy(col("source")).agg(
            max(col("n_docs")).as("n_docs"), // per-source constants
            max(col("p50")).as("p50"), max(col("p90")).as("p90"),
            max(col("p99")).as("p99"),
            rankOk(0.5, "est50").as("p50_ok"),
            rankOk(0.9, "est90").as("p90_ok"),
            rankOk(0.99, "est99").as("p99_ok"))
          .orderBy(col("source"))
      },
      Some("SELECT source, count(*) AS n_docs, " +
        "quantile_cont(n_chars, 0.5e0) AS p50, " +
        "quantile_cont(n_chars, 0.9e0) AS p90, " +
        "quantile_cont(n_chars, 0.99e0) AS p99, " +
        "TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok " +
        "FROM documents GROUP BY source ORDER BY source")),

    // ------------------------------------------- corpus hygiene / leakage
    // Benchmark-contamination check: a training document is contaminated if
    // it shares any word-8-gram with the held-out benchmark corpus (here:
    // sources src0/src1). Plan shape for 100 TB: the benchmark shingle set
    // is tiny relative to the corpus -> distinct + broadcast; the training
    // side is a map-side explode of codegen'd hashes, one shuffle for the
    // per-doc hit count. 8-grams (vs the dedup 3-grams) keep the accidental
    // collision rate negligible so hits mean real overlap.
    Q("tx_contamination",
      t => {
        val sh = t.documents.select(col("doc_id"), col("source"),
          graft.functions.WordNGramHashes(
            split(lower(trim(col("text"))), "\\s+"), 8).as("hs"))
        val bench = sh.filter(col("source").isin("src0", "src1"))
          .select(explode(col("hs")).as("shh")).distinct()
        val train = sh.filter(!col("source").isin("src0", "src1"))
          .select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
            explode(col("hs")).as("shh"))
        train.join(broadcast(bench), Seq("shh"))
          .groupBy(col("doc_id"), col("n_sh"))
          .agg(count(lit(1)).as("n_hit"))
          .select(col("doc_id"), col("n_sh"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_sh")).as("contam_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("WITH sh AS (SELECT doc_id, source, " + shingleHashesSql(8) + " AS hs FROM documents), " +
        "bench AS (SELECT DISTINCT unnest(hs) AS shh FROM sh WHERE source IN ('src0', 'src1')), " +
        "train AS (SELECT doc_id, len(hs) AS n_sh, unnest(hs) AS shh FROM sh " +
        "WHERE source NOT IN ('src0', 'src1')) " +
        "SELECT doc_id, n_sh, n_hit, CAST(n_hit AS DOUBLE) / n_sh AS contam_ratio FROM (" +
        "SELECT t.doc_id, t.n_sh, count(*) AS n_hit FROM train t JOIN bench b USING (shh) " +
        "GROUP BY 1, 2) ORDER BY doc_id")),

    // Sketch-based cardinality — the 100 TB answer to "how many distinct
    // documents per source / overall": a DataSketches HLL per group (lgK=14,
    // rsd ≈ 0.8%), mergeable across partitions AND re-aggregable across
    // groups (hll_union_agg folds the per-source sketches into the global
    // row with no second corpus scan — sum of per-group exact distincts
    // can't do that when content repeats across sources). The exact
    // countDistinct alongside is the oracle anchor only; at 100 TB you ship
    // just the sketches. The oracle gates the sketch's actual guarantee:
    // |est/exact − 1| ≤ 5% (≫ the configured rsd) must hold on every row.
    Q("dd_hll_cardinality",
      t => {
        val d = t.documents.select(col("source"), h48(col("text")).as("h"))
        val sk = d.groupBy(col("source"))
          .agg(countDistinct(col("h")).as("n_exact"),
            hll_sketch_agg(col("h"), lit(14)).as("sk"))
        val per = sk.select(col("source"), col("n_exact"),
          hll_sketch_estimate(col("sk")).as("est"))
        val tot = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(d.agg(countDistinct(col("h")).as("n_exact")))
          .select(lit(null).cast("string").as("source"), col("n_exact"), col("est"))
        per.unionByName(tot)
          .select(col("source"), col("n_exact"),
            when(abs(col("est").cast("double") / col("n_exact") - lit(1.0e0))
              <= lit(0.05e0), lit(1L)).otherwise(lit(0L)).as("band_ok"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("WITH h AS (SELECT source, " + h48Sql("text") + " AS h FROM documents) " +
        "SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_exact, " +
        "CAST(1 AS BIGINT) AS band_ok FROM h GROUP BY source " +
        "UNION ALL SELECT NULL, CAST(count(DISTINCT h) AS BIGINT), CAST(1 AS BIGINT) FROM h " +
        "ORDER BY source NULLS FIRST")),

    // Bloom-prefiltered decontamination — the 100 TB shape for benchmark
    // overlap removal. The (small) benchmark side's 8-gram shingle hashes are
    // folded into Spark's own runtime-filter bloom sketch (mergeable
    // map-side partials — the same BloomFilterAggregate that
    // InjectRuntimeFilter ships to executors), planted as a ~0.5 MiB
    // constant, and the giant training side is pruned MAP-SIDE before any
    // shuffle: only bloom-flagged docs reach the exact shingle join, so the
    // explode+join cost scales with the contaminated fraction, not the
    // corpus. might_contain has no false negatives, so recall stays exact —
    // and the oracle PROVES it: it computes exact_hit with a full
    // (unprefiltered) join, so a bloom false negative would hash-mismatch.
    Q("tx_bloom_decontam",
      t => {
        import org.apache.spark.sql.graftshim
        val sh = t.documents.select(col("doc_id"), col("source"),
          graft.functions.WordNGramHashes(
            split(lower(trim(col("text"))), "\\s+"), 8).as("hs"))
        val bench = sh.filter(col("source").isin("src0", "src1"))
          .select(explode(col("hs")).as("shh")).distinct()
        // one-row driver artifact, like a broadcast variable's value
        val bloom = bench
          .agg(graftshim.bloomFilterAgg(col("shh"), 1L << 18, 1L << 22).as("bf"))
          .head().getAs[Array[Byte]]("bf")
        val train = sh.filter(!col("source").isin("src0", "src1"))
        val exact = train
          .filter(exists(col("hs"), h => graftshim.bloomMightContain(bloom, h)))
          .select(col("doc_id"), explode(col("hs")).as("shh"))
          .join(broadcast(bench), Seq("shh"))
          .select(col("doc_id")).distinct().withColumn("eh", lit(1L))
        train.select(col("doc_id")).join(exact, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("eh"), lit(0L)).as("exact_hit"))
          .orderBy(col("doc_id"))
      },
      Some("WITH sh AS (SELECT doc_id, source, " + shingleHashesSql(8) + " AS hs FROM documents), " +
        "bench AS (SELECT DISTINCT unnest(hs) AS shh FROM sh WHERE source IN ('src0', 'src1')), " +
        "train AS (SELECT doc_id, hs FROM sh WHERE source NOT IN ('src0', 'src1')), " +
        "exact AS (SELECT DISTINCT doc_id FROM " +
        "(SELECT doc_id, unnest(hs) AS shh FROM train) t JOIN bench USING (shh)) " +
        "SELECT t.doc_id, CASE WHEN e.doc_id IS NULL THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(1 AS BIGINT) END AS exact_hit " +
        "FROM train t LEFT JOIN exact e USING (doc_id) ORDER BY doc_id")),

    // PII/secret scrubbing: regex redaction of emails and IPv4 addresses.
    // The synthetic corpus is digit-free, so a deterministic per-doc payload
    // (doc_id-derived email / IP on a subset of docs) is appended INSIDE the
    // query and the oracle alike — the redaction logic runs against real
    // matches and real non-matches. Pure map-side at any scale; the patterns
    // are valid in both Java regex (Spark) and RE2 (DuckDB).
    Q("tx_pii_scrub",
      t => {
        val aug = concat(col("text"),
          when(pmod(col("doc_id"), lit(3L)) =!= 0L,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(2L)) === 0L,
            concat(lit(" from 10."), pmod(col("doc_id"), lit(240L)).cast("string"),
              lit(".0."), pmod(col("doc_id"), lit(250L)).cast("string")))
            .otherwise(lit("")))
        val scrubbed = regexp_replace(
          regexp_replace(aug, PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>")
        t.documents.select(col("doc_id"),
            size(regexp_extract_all(aug, lit(PII_EMAIL), lit(0))).cast("long").as("n_email"),
            size(regexp_extract_all(aug, lit(PII_IP), lit(0))).cast("long").as("n_ip"),
            md5(scrubbed).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("WITH a AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END || " +
        "CASE WHEN doc_id % 2 = 0 THEN ' from 10.' || (doc_id % 240) || '.0.' || (doc_id % 250) ELSE '' END AS aug " +
        "FROM documents) " +
        s"SELECT doc_id, len(regexp_extract_all(aug, '$PII_EMAIL')) AS n_email, " +
        s"len(regexp_extract_all(aug, '$PII_IP')) AS n_ip, " +
        s"md5(regexp_replace(regexp_replace(aug, '$PII_EMAIL', '<EMAIL>', 'g'), '$PII_IP', '<IP>', 'g')) AS fp " +
        "FROM a ORDER BY doc_id")),

    // C4-style cross-document segment dedup: split each doc into consecutive
    // 10-token segments ("lines" of this newline-free corpus), keep each
    // distinct segment only at its first occurrence (min doc_id, seg_no),
    // and reassemble the surviving text. The first-occurrence choice is a
    // window over the segment key — at 100 TB partition by a 64-bit segment
    // hash instead of the string and the same plan holds (the per-key group
    // is the segment's duplication count, never the corpus).
    Q("dd_line_dedup",
      t => {
        val tok = t.documents.select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
        val segs = tok.withColumn("seg_no", floor(col("pos") / 10).cast("long"))
          .groupBy(col("doc_id"), col("seg_no"))
          .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("seg"))
          .persist() // feeds both the rank window and the per-doc totals
        val ranked = segs.withColumn("rn", row_number().over(
          Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("seg_no"))))
        val rebuilt = ranked.filter(col("rn") === 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", transform(
              array_sort(collect_list(struct(col("seg_no"), col("seg")))),
              x => x.getField("seg"))).as("new_text"))
        segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_seg"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_seg"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            md5(coalesce(col("new_text"), lit(""))).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some(raw"WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents), " +
        "sg AS (SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(len(toks) / 10.0e0) AS BIGINT)), " +
        "i -> struct_pack(seg_no := i, seg := array_to_string(toks[i*10+1:i*10+10], ' ')))) AS u FROM tk), " +
        "segs AS (SELECT doc_id, u.seg_no AS seg_no, u.seg AS seg FROM sg), " +
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn FROM segs), " +
        "kept AS (SELECT doc_id, count(*) AS n_kept, string_agg(seg, ' ' ORDER BY seg_no) AS new_text " +
        "FROM ranked WHERE rn = 1 GROUP BY doc_id), " +
        "ns AS (SELECT doc_id, count(*) AS n_seg FROM segs GROUP BY doc_id) " +
        "SELECT ns.doc_id, ns.n_seg, coalesce(k.n_kept, 0) AS n_kept, " +
        "md5(coalesce(k.new_text, '')) AS fp " +
        "FROM ns LEFT JOIN kept k USING (doc_id) ORDER BY ns.doc_id")),

    // ------------------------------------------- curation ops, second wave
    // Per-source document cap — the C4/RefinedWeb "max pages per domain"
    // rule. Two-phase top-k so a hot domain never serializes through one
    // reducer: each (source, salt) slice rank-prunes to k rows FIRST, so the
    // final per-source window sees at most k×S rows per source regardless of
    // how many billions the domain contributed. Same pre-reduce shape as
    // Aggregations.topk (SURVEY §2.6).
    Q("smp_group_cap",
      t => {
        val k = 10
        val w1 = Window.partitionBy(col("source"), col("__graft_salt"))
          .orderBy(col("doc_id"))
        val w2 = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        t.documents
          .select(col("doc_id"), col("source"),
            pmod(col("doc_id"), lit(8L)).as("__graft_salt"))
          .withColumn("__graft_rn", row_number().over(w1))
          .filter(col("__graft_rn") <= k)
          .withColumn("__graft_rn2", row_number().over(w2))
          .filter(col("__graft_rn2") <= k)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, source FROM (SELECT doc_id, source, " +
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn " +
        "FROM documents) WHERE rn <= 10 ORDER BY doc_id")),

    // Leakage-safe train/holdout split: the split key is the NORMALIZED
    // content hash (dd_norm_exact's group key), so every duplicate/near-exact
    // copy of a document lands on the same side — eval contamination via
    // duplicated text is structurally impossible, which a row-wise random
    // split does not guarantee. Map-side hash decision (no shuffle to split);
    // the groupBy is only the constant-size audit of the result.
    Q("smp_leakfree_split",
      t => {
        val g = substring(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), 1, 96)
        t.documents
          .select(col("doc_id"), g.as("__graft_g"),
            when(pmod(h48(g), lit(100L)) < 90L, "train")
              .otherwise("holdout").as("side"))
          .groupBy(col("side"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("__graft_g")).as("n_groups"),
            sum(col("doc_id")).as("docid_sum"))
          .orderBy(col("side"))
      },
      Some("WITH n AS (SELECT doc_id, substr(trim(regexp_replace(" +
        "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), 1, 96) AS g " +
        "FROM documents), s AS (SELECT doc_id, g, CASE WHEN " +
        s"${h48Sql("g")} % 100 < 90 THEN 'train' ELSE 'holdout' END AS side FROM n) " +
        "SELECT side, count(*) AS n_docs, CAST(count(DISTINCT g) AS BIGINT) AS n_groups, " +
        "CAST(sum(doc_id) AS BIGINT) AS docid_sum FROM s GROUP BY side ORDER BY side")),

    // Deterministic output sharding (the trainer-facing "global shuffle"):
    // shard = content-independent hash of the doc id, so the assignment is
    // reproducible across runs/engines and needs no global sort — one hash
    // per row map-side, then `repartition(shard)` writes each shard
    // co-located. The audit per shard (count + id checksum + hash range)
    // verifies both balance and determinism.
    Q("smp_shard_assign",
      t => {
        val h = h48(col("doc_id").cast("string"))
        t.documents
          .select(col("doc_id"), pmod(h, lit(16L)).as("shard"), h.as("__graft_h"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("docid_sum"),
            min(col("__graft_h")).as("min_h"), max(col("__graft_h")).as("max_h"))
          .orderBy(col("shard"))
      },
      Some(s"WITH s AS (SELECT doc_id, ${h48Sql("doc_id::VARCHAR")} AS h FROM documents) " +
        "SELECT h % 16 AS shard, count(*) AS n_docs, " +
        "CAST(sum(doc_id) AS BIGINT) AS docid_sum, min(h) AS min_h, max(h) AS max_h " +
        "FROM s GROUP BY shard ORDER BY shard")),

    // Broadcast blocklist filter (C4's badwords stage): a doc is dropped when
    // any blocklist term appears as a whole token. The list is a literal
    // array in the plan (the 100 TB form broadcasts a lookup table) and the
    // check is a map-side set intersection over the deduped token array —
    // no join, no shuffle, scales linearly with the corpus.
    Q("tx_blocklist_filter",
      t => {
        val block = Seq("slow", "vector", "crash")
        val toks = array_distinct(split(lower(trim(col("text"))), "\\s+"))
        val hits = size(array_intersect(toks, array(block.map(lit): _*))).cast("long")
        t.documents.select(col("doc_id"), hits.as("n_hits"), (hits === 0L).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("WITH d AS (SELECT doc_id, CAST(len(list_filter(list_distinct(" +
        s"${TextOps.TOKS_D}), x -> list_contains(['slow', 'vector', 'crash'], x))) AS BIGINT) AS n_hits " +
        "FROM documents) SELECT doc_id, n_hits, n_hits = 0 AS keep FROM d ORDER BY doc_id")),

    // Normalization-based near-exact dedup (Falcon/RefinedWeb "exact dedup
    // after normalization"): lowercase, strip non-alphanumerics, collapse
    // whitespace, then dedup on the first 96 normalized chars (head dedup —
    // boilerplate-heavy corpora share heads long before full texts match).
    // Map-side normalize + one hash groupBy; scales like dd_exact.
    Q("dd_norm_exact",
      t => {
        val norm = substring(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")), 1, 96)
        t.documents.select(col("doc_id"), norm.as("__graft_norm"))
          .groupBy(col("__graft_norm"))
          .agg(min(col("doc_id")).as("canon_id"), count(lit(1)).as("n_copies"))
          .select(col("canon_id"), col("n_copies"))
          .orderBy(col("canon_id"))
      },
      Some("WITH n AS (SELECT doc_id, substr(trim(regexp_replace(" +
        "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), 1, 96) AS norm " +
        "FROM documents) SELECT CAST(min(doc_id) AS BIGINT) AS canon_id, " +
        "CAST(count(*) AS BIGINT) AS n_copies FROM n GROUP BY norm ORDER BY canon_id")),

    // Edit-distance contamination: benchmark rows that survive shingle
    // checks can still leak in lightly-edited form; block on the first 16
    // normalized chars (equi-join — candidates scale with real collisions,
    // not the corpus) and verify candidates with levenshtein over a fixed
    // 128-char prefix. The bench side is small by construction → broadcast.
    Q("tx_fuzzy_contam",
      t => {
        val nrm = lower(trim(col("text")))
        val bench = t.documents.filter(col("source").isin("src0", "src1"))
          .select(col("doc_id").as("bench_id"),
            substring(nrm, 1, 16).as("__graft_blk"),
            substring(nrm, 1, 128).as("__graft_pfx_b"))
        val train = t.documents.filter(!col("source").isin("src0", "src1"))
          .select(col("doc_id"),
            substring(nrm, 1, 16).as("__graft_blk"),
            substring(nrm, 1, 128).as("__graft_pfx"))
        train.join(broadcast(bench), Seq("__graft_blk"))
          .select(col("doc_id"), col("bench_id"),
            levenshtein(col("__graft_pfx"), col("__graft_pfx_b"))
              .cast("long").as("lev"))
          .filter(col("lev") <= 20)
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some("WITH b AS (SELECT doc_id AS bench_id, substr(lower(trim(text)),1,16) AS blk, " +
        "substr(lower(trim(text)),1,128) AS pfx FROM documents WHERE source IN ('src0','src1')), " +
        "t AS (SELECT doc_id, substr(lower(trim(text)),1,16) AS blk, " +
        "substr(lower(trim(text)),1,128) AS pfx FROM documents WHERE source NOT IN ('src0','src1')) " +
        "SELECT t.doc_id, b.bench_id, CAST(levenshtein(t.pfx, b.pfx) AS BIGINT) AS lev " +
        "FROM t JOIN b USING (blk) WHERE levenshtein(t.pfx, b.pfx) <= 20 " +
        "ORDER BY doc_id, bench_id")),

    // BPE pair-count — the hot inner step of tokenizer training at corpus
    // scale: adjacent character-pair frequencies within words. The pair
    // vocabulary is tiny (bounded by charset²), so the groupBy is one
    // near-constant-size shuffle after map-side partial aggregation; the
    // expensive explode stays fully map-side and codegen'd (sequence +
    // transform + substr builtins, no UDF).
    Q("tx_bpe_pairs",
      t => {
        val words = t.documents
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
          .filter(length(col("w")) >= 2)
        words
          .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(20)
      },
      Some("WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w " +
        "FROM documents), p AS (SELECT unnest(list_transform(range(1, length(w)), " +
        "i -> substr(w, CAST(i AS INT), 2))) AS pair FROM w WHERE length(w) >= 2) " +
        "SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY pair " +
        "ORDER BY cnt DESC, pair LIMIT 20")),

    // ------------------------------------------------- multimodal plumbing
    // Opaque binary column + typed metadata; the real decoder is a STUB
    // (deterministic byte-level features) because no image/audio codec ships
    // in this environment — the Spark-side schema/plumbing is real.
    Q("mm_binary_meta",
      t => t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("img_bytes"))
        .select(
          col("doc_id"),
          length(col("img_bytes")).cast("long").as("byte_len"),
          md5(col("img_bytes")).as("fp"),                      // STUB "decode"
          hex(substring(col("img_bytes"), 1, 16)).as("thumb_hex"),
          (lit(1) + pmod(length(col("img_bytes")), lit(640))).cast("long").as("width"),
          (lit(1) + pmod(length(col("img_bytes")) * 7, lit(480))).cast("long").as("height"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS fp, " +
        "hex(encode(substring(text, 1, 16))) AS thumb_hex, " +
        "1 + octet_length(encode(text)) % 640 AS width, " +
        "1 + (octet_length(encode(text)) * 7) % 480 AS height " +
        "FROM documents ORDER BY doc_id")),

    Q("mm_batch_decode",  // mapPartitions batch decoder (mapInPandas analog)
      t => {
        val f = graft.ops.Multimodal.featuresOf(t.spark, t.documents)
        f.select(col("doc_id"), col("media_type"), col("byte_len").cast("long").as("byte_len"),
            col("width").cast("long").as("width"), col("height").cast("long").as("height"),
            col("features")(0).as("f0"), col("features")(1).as("f1"),
            col("features")(2).as("f2"), col("features")(3).as("f3"))
          .orderBy(col("doc_id"))
      },
      Some("WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n, " +
        "list_sum(list_transform(range(1, length(text)+1), i -> ord(substr(text, CAST(i AS INT), 1)))) AS s0, " +
        "list_sum(list_transform(range(1, length(text)+1), i -> ord(substr(text, CAST(i AS INT), 1)) * ord(substr(text, CAST(i AS INT), 1)))) AS s1 " +
        "FROM documents) " +
        "SELECT doc_id, 'image/fake' AS media_type, n AS byte_len, " +
        "1 + n % 640 AS width, 1 + (n * 7) % 480 AS height, " +
        "CAST(n AS DOUBLE) AS f0, CAST(s0 AS DOUBLE) / n AS f1, CAST(s1 AS DOUBLE) / n AS f2, " +
        "CAST(s1 AS DOUBLE) / n - (CAST(s0 AS DOUBLE) / n) * (CAST(s0 AS DOUBLE) / n) AS f3 " +
        "FROM b ORDER BY doc_id")),

    Q("mm_frame_sample",  // frame-sampling plumbing: stride-64 byte windows
      t => t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("img_bytes"))
        .withColumn("frame_no", explode(sequence(lit(0L),
          greatest(floor((length(col("img_bytes")) - 8) / lit(64.0)).cast("long"), lit(0L)))))
        .select(col("doc_id"), col("frame_no"),
          expr("hex(substring(img_bytes, CAST(frame_no * 64 + 1 AS INT), 8))").as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_no")),
      Some("WITH f AS (SELECT doc_id, text, unnest(range(0, " +
        "greatest(CAST(floor((octet_length(encode(text)) - 8) / 64.0e0) AS BIGINT), 0) + 1)) AS frame_no " +
        "FROM documents) " +
        "SELECT doc_id, frame_no, hex(encode(substring(text, CAST(frame_no * 64 + 1 AS INT), 8))) AS frame_hex " +
        "FROM f ORDER BY doc_id, frame_no"))
  )
}
