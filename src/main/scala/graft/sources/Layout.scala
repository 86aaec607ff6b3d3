package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: bucketing (co-located
  * joins — the Spark analogue of the reference's `(site, ts_utc)`
  * indexes, SURVEY S6) and salting (skew mitigation).
  */
object Layout {

  /** Persist `df` bucketed by `cols` into the session catalog. Joins
    * and aggregations on the bucket columns between tables bucketed
    * the same way run shuffle-free — at 100 TB that removes the
    * dominant exchange from every fact-fact join on the bucket key. */
  def writeBucketed(df: DataFrame, table: String,
                    cols: Seq[String], numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the skewed (big) side gets a
    * deterministic salt in [0, buckets); the small side is replicated
    * across all salt values. Converts one hot key's single reducer
    * into `buckets` parallel reducers. AQE's skew-join handles
    * moderate skew automatically; explicit salting is for the extreme
    * tail (one key >> one executor's memory).
    *
    * The salt is derived from STABLE row content (`saltCols`, default
    * all of `big`'s columns) — never from monotonically_increasing_id
    * or rand, whose values change across task/stage retries after an
    * upstream shuffle (the SPARK-23207 class of bug: a retried
    * partition re-salts its rows differently and the join silently
    * duplicates or drops them).
    *
    * CAVEAT on the default salt: hashing ALL of big's columns means
    * fully-duplicate rows of the hot key hash to ONE salt bucket —
    * exactly the degenerate corpus (many identical rows per key) that
    * salting is meant to spread, leaving one reducer hot again. When
    * the skewed side can contain duplicate rows, pass `saltCols`
    * including a column that varies WITHIN the hot key (an event id,
    * a file/offset lineage column, a pre-assigned bucket id); content
    * hashing only spreads what actually differs. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, saltCols: Seq[Column] = Nil): DataFrame = {
    val src = if (saltCols.nonEmpty) saltCols
              else big.columns.map(col).toSeq
    val saltedBig = big.withColumn("_salt", pmod(hash(src: _*), lit(buckets)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
