package graft.queries

import org.apache.spark.sql.functions._
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
          size(split(trim(col("text")), "\\s+")).as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))).as("n_re"),
          length(col("text")).as("len_chars"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_ws, " +
        "len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_re, " +
        "length(text) AS len_chars FROM documents ORDER BY doc_id")),

    Q("tx_quality",
      t => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        val nTok = size(toks)
        val nStop = size(expr(
          s"filter(split(lower(trim(text)), '\\\\s+'), x -> x IN (${STOP.map(s => s"'$s'").mkString(", ")}))"))
        val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        t.documents.select(
            col("doc_id"),
            nTok.as("n_tok"),
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
        val nStop = size(expr(
          s"filter(split(lower(trim(text)), '\\\\s+'), x -> x IN (${STOP.map(s => s"'$s'").mkString(", ")}))"))
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
        "FROM documents ORDER BY doc_id"))
  )
}
