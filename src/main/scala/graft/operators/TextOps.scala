package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.syntax._

/** Text-analysis operators for the training-data-pipeline surface
  * (north star in BASELINE.json): token statistics, quality scoring,
  * language-ID, and document fingerprinting over the `documents`
  * fixture table.
  *
  * All operators are embarrassingly parallel per-document expressions
  * (no shuffle except final aggregation/sort) and stay inside
  * whole-stage codegen except the higher-order array functions — at
  * 100 TB they scan-and-project with full column pruning.
  */
object TextOps {

  /** Whitespace tokenization shared by all text operators. Documents
    * are pre-trimmed; `\s+` matches the same token boundaries in both
    * engines. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  val tokensSql = "string_split_regex(trim(text), '\\s+')"

  /** q40 — token statistics: counts, distinct counts, total token
    * length (an `aggregate` fold — the BPE-ish regex tokenizer's
    * bookkeeping primitive). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .select(
        $"doc_id",
        length($"text").cast(LongType).as("n_chars_actual"),
        size($"toks").cast(LongType).as("n_tokens"),
        size(array_distinct($"toks")).cast(LongType).as("n_distinct_tokens"),
        expr("aggregate(transform(toks, x -> length(x)), 0, (a, b) -> a + b)")
          .cast(LongType).as("total_token_len"))
      .orderBy($"doc_id")

  val tokenStatsSql: String =
    s"""SELECT doc_id, length(text) AS n_chars_actual,
       |  len($tokensSql) AS n_tokens,
       |  len(list_distinct($tokensSql)) AS n_distinct_tokens,
       |  list_reduce(list_prepend(0, list_transform($tokensSql,
       |    x -> length(x))), (a, b) -> a + b) AS total_token_len
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Stopword list used by quality scoring and language-ID. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** q41 — quality scoring (length / stopword-ratio / vocabulary
    * diversity), the reference-free quality gate of an LLM data
    * pipeline. Ratios and the blended score are IEEE-identical in both
    * engines (same operand order), rounded to 6dp. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreFrom(Tables.documents(spark, dir))

  /** q41 over any documents-shaped frame — q103 scores only the
    * cluster-member slice through this (row-local, so scoring a slice
    * equals slicing the scores). */
  def qualityScoreFrom(docs: DataFrame): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    docs
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast(LongType))
      .withColumn("n_stop",
        expr(s"size(filter(toks, x -> x IN ($stopList)))").cast(LongType))
      // NULLIF guard: a zero-token doc's ratios are NULL by explicit
      // construction, not by an engine's 0/0 convention — Spark's
      // non-ANSI Divide and DuckDB 1.0.0 both return NULL today, but
      // DuckDB under ieee_floating_point_ops yields NaN, which would
      // sort ABOVE every real score in a quality DESC ordering
      // (ADVICE r9). Identical output for every n_tokens > 0 row.
      .withColumn("nt_nz", nullif($"n_tokens", lit(0L)))
      .withColumn("uniq_ratio",
        size(array_distinct($"toks")).cast(DoubleType) / $"nt_nz")
      .withColumn("stop_ratio", $"n_stop".cast(DoubleType) / $"nt_nz")
      .select($"doc_id", $"n_tokens", $"n_stop",
        round($"uniq_ratio", 6).as("uniq_ratio"),
        round($"stop_ratio", 6).as("stop_ratio"),
        round(lit(0.4) * $"uniq_ratio"
          + lit(0.3) * least(lit(1.0), $"n_tokens" / 100.0)
          + lit(0.3) * (lit(1.0) - $"stop_ratio"), 6).as("quality"))
      .orderBy($"doc_id")
  }

  def qualityScoreSql: String = qualityScoreSqlFrom("documents")

  /** The q41 statement over an arbitrary documents-shaped source —
    * q104's oracle scores the current snapshot through this. */
  def qualityScoreSqlFrom(src: String): String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, $tokensSql AS toks FROM $src),
       |m AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    len(list_filter(toks, x -> x IN ($stopList))) AS n_stop,
       |    CAST(len(list_distinct(toks)) AS DOUBLE)
       |      / NULLIF(len(toks), 0) AS uniq_ratio,
       |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
       |      / NULLIF(len(toks), 0) AS stop_ratio
       |  FROM t)
       |SELECT doc_id, n_tokens, n_stop,
       |  ROUND(uniq_ratio, 6) AS uniq_ratio,
       |  ROUND(stop_ratio, 6) AS stop_ratio,
       |  ROUND(0.4 * uniq_ratio + 0.3 * LEAST(1.0, n_tokens / 100.0)
       |        + 0.3 * (1.0 - stop_ratio), 6) AS quality
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. (The fixture vocabulary is synthetic; the operator
    * structure — marker join → per-language scores → argmax — is what
    * a real n-gram profile LID does.) */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "data", "en" -> "query",
    "de" -> "table", "de" -> "join",
    "es" -> "fast", "es" -> "scan",
    "fr" -> "row", "fr" -> "sort",
    "zh" -> "hash", "zh" -> "merge")

  /** q42 — language identification: per-language marker-hit counts as
    * pure row-local array expressions, argmax via `array_max` over
    * (hits, -langIndex) structs. Zero shuffles (the old shape —
    * explode → broadcast-join → groupBy → window — paid two exchanges
    * to count occurrences the token array already holds; at 100 TB
    * the explode alone would multiply the scan by tokens-per-doc).
    * Tiebreak matches the old window (highest hits, then
    * lexicographically smallest language): languages are indexed in
    * sorted order and the struct max picks the LARGEST -index =
    * smallest index on equal hits. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val langs = LangMarkers.map(_._1).distinct.sorted
    val candidates = array(langs.zipWithIndex.map { case (l, i) =>
      val ms = LangMarkers.filter(_._1 == l)
        .map(m => s"'${m._2}'").mkString(", ")
      struct(
        expr(s"size(filter(toks, x -> x IN ($ms)))")
          .cast(LongType).as("hits"),
        lit(-i).as("nri"))
    }: _*)
    val langNames = array(langs.map(lit): _*)
    docs
      .withColumn("toks", tokens($"text"))
      .withColumn("best", array_max(candidates))
      .select($"doc_id", $"lang",
        when($"best.hits" > 0,
          element_at(langNames, -$"best.nri" + 1))
          .otherwise(lit("unknown")).as("predicted_lang"),
        $"best.hits".as("marker_hits"))
      .orderBy($"doc_id")
  }

  def langIdSql: String = {
    val values = LangMarkers
      .map { case (l, m) => s"('$l', '$m')" }.mkString(", ")
    s"""WITH markers(cand_lang, marker) AS (VALUES $values),
       |tok AS (
       |  SELECT doc_id, unnest($tokensSql) AS token FROM documents),
       |scores AS (
       |  SELECT doc_id, cand_lang, COUNT(*) AS hits
       |  FROM tok JOIN markers ON token = marker
       |  GROUP BY doc_id, cand_lang),
       |best AS (
       |  SELECT doc_id, cand_lang AS predicted_lang, hits
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |          ORDER BY hits DESC, cand_lang ASC) AS rn FROM scores)
       |  WHERE rn = 1)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(b.predicted_lang, 'unknown') AS predicted_lang,
       |  COALESCE(b.hits, 0) AS marker_hits
       |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q43 — document fingerprinting: whitespace-normalized md5 content
    * hash + its 64-bit prefix (both engines emit identical lowercase
    * hex, so fingerprints are directly comparable). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")
          .cast(BinaryType)).as("fp"))
      .withColumn("fp64", substring($"fp", 1, 16))
      .orderBy($"doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |  substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
      |            1, 16) AS fp64
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q44 — exact deduplication: hash-groupBy on the content
    * fingerprint; keeper = min doc_id per group (deterministic). At
    * scale this is the classic one-shuffle dedup — the fingerprint is
    * computed map-side, the groupBy shuffles only (hash, id). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")
          .cast(BinaryType)).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper_doc_id")

  val exactDedupSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |  MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin

  /** BPE-ish pretokenizer: letter runs / digit runs / single
    * punctuation, the regex shape GPT-style tokenizers pre-split on. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** q53 — regex token counting (the second tokenizer of the token-
    * counting operator family; q40 is the whitespace one): counts plus
    * an order-sensitive md5 digest of the token stream. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("btoks",
        expr(s"regexp_extract_all(lower(text), '${BpePattern.replace("\\", "\\\\")}', 0)"))
      .select($"doc_id",
        size($"btoks").cast(LongType).as("n_bpe_tokens"),
        size(array_distinct($"btoks")).cast(LongType).as("n_distinct_bpe"),
        md5(array_join($"btoks", "|").cast(BinaryType)).as("stream_digest"))
      .orderBy($"doc_id")

  val regexTokensSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
      |  len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS n_distinct_bpe,
      |  md5(array_to_string(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'), '|')) AS stream_digest
      |FROM documents ORDER BY doc_id""".stripMargin
}
