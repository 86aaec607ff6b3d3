package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classify, Corpus}

class ClassifySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q114 NB: hand arithmetic — priors, add-one smoothing, argmax") {
    // model: en trained on 2 docs {hello:2, world:1}, de on 1 {hallo:1}
    // → tot_en=3, tot_de=1, V=3, priors ln(2/3) / ln(1/3)
    val wc = Seq(("en", "hello", 2L), ("en", "world", 1L),
      ("de", "hallo", 1L)).toDF("lang", "token", "cnt")
    val cdoc = Seq(("en", 2L), ("de", 1L)).toDF("lang", "n_docs_c")
    val docs = Seq((1L, "xx", "hello hallo")).toDF("doc_id", "lang", "text")
    val out = Classify.nbScore(docs, Classify.docTf(docs),
      Classify.nbModelOf(wc, cdoc)).collect()
    assert(out.length === 1)
    val r = out.head
    // en: ln(2/3) + ln(3/6) + ln(1/6)  = -2.890371 (each term 6dp)
    // de: ln(1/3) + ln(1/4) + ln(2/4)  = -3.178053 → en wins
    assert(r.getString(2) === "en")
    assert(r.getDouble(3) === -2.890371)
    assert(!r.getBoolean(4), "true lang 'xx' cannot be correct")
  }

  test("q114 NB: exact score tie breaks to the lexicographically " +
       "first class") {
    // perfectly symmetric model: identical counts under both classes
    val wc = Seq(("bb", "tok", 1L), ("aa", "tok", 1L))
      .toDF("lang", "token", "cnt")
    val cdoc = Seq(("bb", 1L), ("aa", 1L)).toDF("lang", "n_docs_c")
    val docs = Seq((1L, "bb", "tok tok")).toDF("doc_id", "lang", "text")
    val r = Classify.nbScore(docs, Classify.docTf(docs),
      Classify.nbModelOf(wc, cdoc)).collect().head
    assert(r.getString(2) === "aa")
  }

  test("q114 NB on the fixture: one deterministic prediction per doc, " +
       "classes drawn from the train split, log-scores negative") {
    val out = Classify.nbClassify(spark, sf).collect()
    assert(out.length.toLong === Tables.documents(spark, sf).count())
    val trainLangs = Classify.trainSlice(Tables.documents(spark, sf))
      .select($"lang").distinct().as[String].collect().toSet
    out.foreach { r =>
      assert(trainLangs.contains(r.getString(2)))
      assert(r.getDouble(3) < 0.0, "a log-probability score must be < 0")
      assert(r.getBoolean(4) === (r.getString(1) == r.getString(2)))
    }
    val again = Classify.nbClassify(spark, sf).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("q114 NB: held-out docs contribute no counts — removing a " +
       "non-train doc never changes the model's predictions") {
    val docs = Tables.documents(spark, sf)
    val nonTrain = docs
      .filter(Corpus.splitCol(Corpus.bucketCol) =!= "train")
      .select($"doc_id").as[Long].head()
    val full = Classify.nbClassifyFrom(docs)
      .filter($"doc_id" =!= nonTrain).collect()
    val dropped = Classify.nbClassifyFrom(docs.filter($"doc_id" =!= nonTrain))
      .collect()
    assert(full.toSeq === dropped.toSeq)
  }
}
