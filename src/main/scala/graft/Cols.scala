package graft

import org.apache.spark.sql.ColumnName

/** `$"col"` interpolator without needing a SparkSession's implicits in scope
  * (library code declares plans; sessions belong to callers).
  */
object Cols {
  implicit class StrCtx(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
