package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library entry point for `SparkSessionExtensions` — the deployment
  * path where users never call a graft API before writing SQL:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * }}}
  *
  * injects every graft SQL function (the codegen'd vector kernels and
  * the text generators) into the session's function registry at build
  * time. Sessions built without the extension keep working: each
  * operator path still calls the idempotent
  * `TextExpressions.register` / `VectorExpressions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val all = graft.functions.VectorExpressions.builders ++
      graft.functions.TextExpressions.builders ++
      graft.functions.MediaExpressions.builders
    all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}
