package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prometheus naming conventions for metric/label names (reference:
  * assertsprocessor/utils.go:140-158 applyPromConventions): the char set
  * ` ,\t/\.-:=“@<>` maps to `_`, `%` maps to `_percent`, then lowercase.
  * Used both at plan-build time (label column names) and as a column
  * expression for label values that become series names.
  */
object Norm {

  private val underscoreChars = " ,\t/\\.-:=“@<>"

  def promName(c: Column): Column =
    lower(translate(regexp_replace(c, "%", "_percent"), underscoreChars, "_" * underscoreChars.length))

  /** Driver-side variant for column/label names. */
  def promName(s: String): String =
    s.replace("%", "_percent")
      .map(ch => if (underscoreChars.contains(ch)) '_' else ch)
      .toLowerCase
}
