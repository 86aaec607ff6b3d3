package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator. `spark.implicits._` provides the
  * same thing but requires a SparkSession instance in scope; the query
  * library is a collection of static functions, so this standalone
  * version keeps call sites idiomatic. */
object syntax {
  implicit class ColumnInterpolator(private val sc: StringContext)
      extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
