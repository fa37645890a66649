package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Form-tagged gate entries (round-14 verdict #1): when several
  * registered queries are provably-equal FORMS of one operator (live
  * vs artifact-served vs in-place append), registering the shared
  * oracle SQL once per name re-pays its full DuckDB chain per name —
  * the suite growth that zeroed round 14's correctness artifact
  * (~39 s × 2 for the sub-probe chain alone). Instead the forms fold
  * into ONE entry: the Spark side unions the forms' rows under a
  * `form` tag; the oracle runs the shared chain ONCE and cross-joins
  * it to the tag list. The hash compare still proves every form
  * row-exact against the rebuild — the tag keys each form's rows to
  * its copy of the oracle rows. */
object OracleForms {

  /** Union the named forms under a `form` tag column. */
  def union(forms: (String, DataFrame)*): DataFrame =
    forms.map { case (tag, df) => df.withColumn("form", lit(tag)) }
      .reduce(_ unionByName _)

  /** Cross-join `base`'s rows (one shared chain) to the tag list.
    * Tags are builder-authored literals, never user input. */
  def sql(base: String, forms: Seq[String]): String = {
    val vals = forms.map(f => s"('$f')").mkString(", ")
    s"SELECT f.form, t.* FROM ($base) t CROSS JOIN (VALUES $vals) f(form)"
  }
}
