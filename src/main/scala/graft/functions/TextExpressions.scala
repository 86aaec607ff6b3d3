package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle generator (UDTF-shaped Catalyst `Generator`, the
  * escalation path SURVEY §2.11 names for the J-family parsers).
  *
  * Emits every k-word shingle of the whitespace-tokenized input — the
  * same strings as `transform(sequence(0, size(toks)-k), i ->
  * concat_ws(' ', toks[i..i+k-1]))`, but in one tight loop per row
  * instead of an interpreted lambda per shingle (measured ~2-3× on the
  * shingle-heavy dedup queries; the HOF chain allocates boxed indices
  * and per-element Catalyst eval frames).
  *
  * Tokenization matches `TextOps.tokens`: trim, split on `\s+`.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("s", StringType) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects a string column, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    // Replicate Spark's trim/split semantics exactly (and therefore
    // the DuckDB oracle's): UTF8String.trim strips only spaces (Java
    // String.trim would also strip tabs/newlines), and split uses
    // limit -1 (keeps trailing empty tokens) like Spark's StringSplit.
    val toks = raw.asInstanceOf[UTF8String].trim().toString.split("\\s+", -1)
    if (toks.length < k) return Nil
    val n = toks.length - k + 1
    val out = new Array[InternalRow](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = InternalRow(UTF8String.fromString(sb.toString))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Register `graft_shingles(text, k)` (idempotent, per-session).
    * `k` must be a foldable integer literal — validated here so SQL
    * callers get an analysis-time message, not a ClassCastException. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      { exprs =>
        require(exprs.length == 2,
          s"graft_shingles(text, k) expects 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case e if e.foldable =>
            e.eval(null) match {
              case i: Int if i >= 1 => i
              case other => throw new IllegalArgumentException(
                s"graft_shingles k must be a positive INT literal, got $other")
            }
          case _ => throw new IllegalArgumentException(
            "graft_shingles k must be a literal, not a column")
        }
        WordShingles(exprs.head, k)
      },
      "scala_udf")
}
