package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.syntax._

/** Near-duplicate detection for the training-data pipeline: shingling,
  * n-gram Jaccard (exact baseline), MinHash signatures, banded-LSH
  * candidate generation + verification (the 100 TB path), and SimHash.
  *
  * Hashing is md5 in both engines (identical lowercase hex), so every
  * stage — signatures, bands, verdicts — is oracle-checkable. MinHash
  * "permutations" are seed-prefixed md5s: h_i(s) = md5(i || ':' || s),
  * minimized as fixed-length hex strings (lexicographic == numeric
  * order).
  *
  * Scale notes: the exact all-pairs Jaccard (q45) is quadratic in docs
  * sharing a shingle — it exists as the correctness baseline. The LSH
  * path (q46/q47) is the one that survives 100×: signatures are one
  * groupBy over (doc × 16 seeds), banding reduces the self-join to
  * same-bucket pairs only, and verification touches candidate pairs
  * rather than all pairs.
  */
object Dedup {

  val NumHashes = 16
  val BandSize = 4        // 4 bands × 4 rows: catches J≳0.7 w.h.p.
  val JaccardThreshold = 0.5

  /** Distinct 3-word shingles per document: (doc_id, s). Narrow
    * (generate → explode → distinct is map-side except the distinct). */
  def shingles(spark: SparkSession, dir: String, maxDocId: Long = Long.MaxValue): DataFrame =
    shinglesFrom(Tables.documents(spark, dir).filter($"doc_id" < maxDocId))

  /** Shingles over any documents-shaped frame — emitted by the
    * [[graft.functions.WordShingles]] Generator (one tight loop per
    * document instead of an interpreted lambda per shingle). */
  def shinglesFrom(docs: DataFrame): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    docs
      .select($"doc_id", expr("graft_shingles(text, 3)").as("s"))
      .distinct()
  }

  /** shingle CTE for the oracle (DuckDB 1-based list indexing). */
  def shinglesCte(maxDocId: String = "9223372036854775807"): String =
    s"""tok AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents
       |  WHERE doc_id < $maxDocId),
       |shd AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks) - 2),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM tok WHERE len(toks) >= 3)""".stripMargin

  // ---------------------------------------------------------------
  // q45 — exact n-gram Jaccard pairs (the oracle baseline).
  // ---------------------------------------------------------------

  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val shd = shingles(spark, dir).cache()
    val sizes = shd.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val a = shd.select($"doc_id".as("doc_a"), $"s")
    val b = shd.select($"doc_id".as("doc_b"), $"s")
    val inter = a.join(b, Seq("s"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n", "nb"), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        ($"i" * lit(1.0) / ($"na" + $"nb" - $"i")).as("jaccard"))
      .filter($"jaccard" >= JaccardThreshold)
      .orderBy($"doc_a", $"doc_b")
  }

  val jaccardPairsSql: String =
    s"""WITH ${shinglesCte()},
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
       |FROM inter
       |JOIN sz sa ON sa.doc_id = doc_a
       |JOIN sz sb ON sb.doc_id = doc_b
       |WHERE i * 1.0 / (sa.n + sb.n - i) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // q46 — MinHash signatures, long form (doc_id, seed, minhash).
  // ---------------------------------------------------------------

  /** h_seed(s) = md5("<seed>:<s>") for a literal seed. */
  private def seedHash(seed: Int): Column =
    md5(concat(lit(seed.toString), lit(":"), $"s").cast(BinaryType))

  def minhashFromShingles(shd: DataFrame): DataFrame =
    shd
      .select($"doc_id", $"s",
        explode(sequence(lit(0), lit(NumHashes - 1))).as("seed"))
      .groupBy($"doc_id", $"seed")
      .agg(min(md5(concat($"seed".cast(StringType), lit(":"), $"s")
        .cast(BinaryType))).as("minhash"))

  def minhashLong(spark: SparkSession, dir: String): DataFrame =
    minhashFromShingles(shingles(spark, dir))

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    minhashLong(spark, dir)
      .select($"doc_id", $"seed".cast(LongType).as("seed"), $"minhash")
      .orderBy($"doc_id", $"seed")

  val minhashCte: String =
    s"""mh AS (
       |  SELECT doc_id, seed,
       |    MIN(md5(CAST(seed AS VARCHAR) || ':' || s)) AS minhash
       |  FROM shd, (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS seed)
       |  GROUP BY doc_id, seed)""".stripMargin

  val minhashSignaturesSql: String =
    s"""WITH ${shinglesCte()},
       |$minhashCte
       |SELECT doc_id, seed, minhash FROM mh ORDER BY doc_id, seed""".stripMargin

  // ---------------------------------------------------------------
  // q47 — banded LSH: hash each 4-seed band of the signature, pair up
  // docs sharing a band bucket, verify candidates with true Jaccard.
  // ---------------------------------------------------------------

  def lshNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    lshNearDupPairsFrom(shingles(spark, dir).cache())

  def lshNearDupPairsFrom(shd: DataFrame): DataFrame = {
    // Wide conditional-min aggregation instead of a collect_list object
    // aggregate: partial (map-side) min per seed collapses each doc to
    // one 16-column row BEFORE the shuffle — measured 30×+ faster than
    // the collect_list formulation, and the shape that survives 100 TB
    // (shuffle volume = docs, not docs × seeds × shingles).
    val wide = shd
      .groupBy($"doc_id")
      .agg(
        min(seedHash(0)).as("mh0"),
        (1 until NumHashes).map(k => min(seedHash(k)).as(s"mh$k")): _*)
    val numBands = NumHashes / BandSize
    val bandStructs = (0 until numBands).map { b =>
      val cols = (0 until BandSize).map(i => col(s"mh${b * BandSize + i}"))
      struct(lit(b).as("band_id"),
             md5(concat_ws("", cols: _*).cast(BinaryType)).as("band_val"))
    }
    // cached: the self-join below would otherwise compute the whole
    // signature subtree once per side
    val bands = wide
      .select($"doc_id", explode(array(bandStructs: _*)).as("bnd"))
      .select($"doc_id", $"bnd.band_id".as("band_id"),
              $"bnd.band_val".as("band_val"))
      .cache()
    val cand = bands.as("x")
      .join(bands.as("y"), Seq("band_id", "band_val"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val sizes = shd.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shd.select($"doc_id".as("doc_a"), $"s"), Seq("doc_a"))
      .join(shd.select($"doc_id".as("doc_b"), $"s"), Seq("doc_b", "s"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n", "nb"), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        ($"i" * lit(1.0) / ($"na" + $"nb" - $"i")).as("jaccard"))
      .filter($"jaccard" >= JaccardThreshold)
      .orderBy($"doc_a", $"doc_b")
  }

  val lshNearDupPairsSql: String =
    s"""WITH ${shinglesCte()},
       |$minhashCte,
       |bands AS (
       |  SELECT doc_id, CAST(seed // $BandSize AS INTEGER) AS band_id,
       |    md5(string_agg(minhash, '' ORDER BY seed)) AS band_val
       |  FROM mh GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.band_val = y.band_val
       |   AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN shd a ON a.doc_id = c.doc_a
       |  JOIN shd b ON b.doc_id = c.doc_b AND b.s = a.s
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
       |FROM inter
       |JOIN sz sa ON sa.doc_id = doc_a
       |JOIN sz sb ON sb.doc_id = doc_b
       |WHERE i * 1.0 / (sa.n + sb.n - i) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // q48 — SimHash: 128-bit md5-based signature reduced to a 32-symbol
  // bit string by per-hex-position majority vote over shingle hashes.
  // ---------------------------------------------------------------

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // One wide conditional aggregate (32 vote sums, map-side combined,
    // fully codegen'd) instead of a 32× explode + two shuffles + object
    // aggregate — same result, linear single-pass shape.
    val votes = shingles(spark, dir)
      .withColumn("h", md5($"s".cast(BinaryType)))
      .groupBy($"doc_id")
      .agg(
        voteSum(1).as("v1"),
        (2 to 32).map(p => voteSum(p).as(s"v$p")): _*)
    votes
      .select($"doc_id", concat(
        (1 to 32).map(p => when(col(s"v$p") > 0, "1").otherwise("0")): _*)
        .as("simhash"))
      .orderBy($"doc_id")
  }

  private def voteSum(p: Int): Column =
    sum(when(expr(s"substring(h, $p, 1)") >= "8", 1).otherwise(-1))

  // ---------------------------------------------------------------
  // q55 — winnowing fingerprints (the MOSS rolling-hash scheme): hash
  // every char k-gram, slide a w-position window, keep each window's
  // minimum hash; the distinct minima are the document's fingerprint
  // set. Guarantees any match of length ≥ w+k-1 shares a fingerprint.
  // ---------------------------------------------------------------

  val WinnowK = 8   // k-gram length
  val WinnowW = 4   // winnowing window (positions)

  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.currentRow, WinnowW - 1)
    Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_replace(lower(trim($"text")), "\\s+", " ").as("norm"))
      .filter(length($"norm") >= WinnowK)
      .select($"doc_id", $"norm",
        explode(sequence(lit(1), length($"norm") - (WinnowK - 1))).as("pos"))
      .select($"doc_id", $"pos",
        md5(expr(s"substring(norm, pos, $WinnowK)").cast(BinaryType)).as("h"))
      .withColumn("wfp", min($"h").over(w))
      .select($"doc_id", $"wfp".as("fp"))
      .distinct()
      .orderBy($"doc_id", $"fp")
  }

  val winnowFingerprintsSql: String =
    s"""WITH norm AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, CAST(pos AS INTEGER) AS pos,
       |    md5(substring(norm, CAST(pos AS INTEGER), $WinnowK)) AS h
       |  FROM (SELECT doc_id, norm,
       |          unnest(generate_series(1, length(norm) - ${WinnowK - 1})) AS pos
       |        FROM norm WHERE length(norm) >= $WinnowK)),
       |winnowed AS (
       |  SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
       |  FROM grams)
       |SELECT DISTINCT doc_id, fp FROM winnowed ORDER BY doc_id, fp""".stripMargin

  val simhashSql: String =
    s"""WITH ${shinglesCte()},
       |votes AS (
       |  SELECT doc_id, p,
       |    SUM(CASE WHEN substring(md5(s), CAST(p AS INTEGER), 1) >= '8'
       |             THEN 1 ELSE -1 END) AS v
       |  FROM shd, (SELECT unnest(generate_series(1, 32)) AS p)
       |  GROUP BY doc_id, p)
       |SELECT doc_id,
       |  string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
       |    AS simhash
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
