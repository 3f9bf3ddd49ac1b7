package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctionRegistry

/** SparkSessionExtensions entry point: makes the ENTIRE graft function
  * surface available to ANY session via config — no code changes for SQL
  * users:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT dot_long(a, b), fingerprint(text), lang_id(text),
  *        extract_publication_type(bib) FROM ...
  * }}}
  *
  * Every function is injected as a native expression builder (the SQL form
  * plans and codegens identically to the DataFrame form) — see
  * [[org.apache.spark.sql.graft.GraftFunctionRegistry]] for the catalog.
  * The session-local alternative is `GraftFunctionRegistry.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.injectAll(ext)
}
