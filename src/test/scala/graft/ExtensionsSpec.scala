package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wiring, tested on an ISOLATED `newSession()`: a new
  * session starts with a fresh temp-function registry (so functions
  * registered by other suites' operator calls cannot leak in) but
  * re-applies the builder's SparkSessionExtensions — exactly the
  * `spark.sql.extensions=graft.GraftExtensions` deployment story where
  * pure-SQL users never call a graft API first. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val fresh: SparkSession = TestSpark.spark.newSession()

  test("vector kernels resolve in pure SQL via the session extension") {
    assert(fresh.sql("SELECT graft_l2norm(array(3.0D, 4.0D))")
      .collect()(0).getDouble(0) === 5.0)
    assert(fresh.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect()(0).getDouble(0) === 11.0)
    assert(fresh.sql("SELECT graft_sqdist(array(0.0D, 0.0D), array(3.0D, 4.0D))")
      .collect()(0).getDouble(0) === 25.0)
  }

  test("text generators resolve in pure SQL via the session extension") {
    val shingles = fresh.sql(
      "SELECT graft_shingles('a b c d', 3) AS s").collect().map(_.getString(0))
    assert(shingles.toSeq === Seq("a b c", "b c d"))
    val fps = fresh.sql(
      "SELECT graft_shingle_fps('a b c d', 3) AS fp").collect().map(_.getLong(0))
    assert(fps.length === 2 && fps.forall(f => f >= 0 && f < (1L << 32)))
    val wfp = fresh.sql(
      "SELECT graft_winnow('abcdefghij', 8, 4) AS fp").collect().map(_.getString(0))
    assert(wfp.nonEmpty && wfp.forall(_.matches("[0-9a-f]{32}")))
  }

  test("media + cell generators resolve in pure SQL via the session extension") {
    val frames = fresh.sql(
      "SELECT graft_frames(encode('abcdefghij', 'UTF-8'), 4, 2) " +
        "AS (frame_idx, frame_md5, frame_chars)").collect()
    // 10 chars / 4-char frames = 3 frames, stride 2 keeps idx 0 and 2
    assert(frames.map(_.getLong(0)).toSeq === Seq(0L, 2L))
    assert(frames.map(_.getLong(2)).toSeq === Seq(4L, 2L))
    val cells = fresh.sql(
      "SELECT graft_nearest_cells(array(0.0D), " +
        "array(struct(10L, array(5.0D)), struct(20L, array(1.0D))), 1) " +
        "AS cell_id").collect()
    assert(cells.map(_.getLong(0)).toSeq === Seq(20L),
      "nearest cell by squared distance")
  }

  test("arity/literal validation surfaces at analysis time") {
    intercept[Exception] {
      fresh.sql("SELECT graft_shingles('a b c')").collect()
    }
    intercept[Exception] {
      fresh.sql("SELECT graft_dot(array(1.0D))").collect()
    }
    intercept[Exception] {
      fresh.sql("SELECT graft_winnow('abc', 8, -1)").collect()
    }
  }
}
