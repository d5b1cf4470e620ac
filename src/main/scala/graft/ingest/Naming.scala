package graft.ingest

/** Table-name derivation from file names, matching the reference's
  * sanitization semantics (localsql/localsql.py:41 regex, :147-153):
  *  - every char in `:*?-<=>|"'.{}[]() ` and whitespace becomes `_`
  *  - runs of `_` collapse to one
  *  - a leading digit gets a `t` prefix
  * e.g. `one.json` -> `one_json`, `2024.csv` -> `t2024_csv`.
  */
object Naming {

  private val Special = """[:*?\-<=>|"'.{}\[\]() \t\n\r]""".r

  def tableName(fileName: String): String = {
    val base = java.nio.file.Paths.get(fileName).getFileName.toString
    val replaced = Special.replaceAllIn(base, "_")
    val collapsed = replaced.replaceAll("_+", "_")
    if (collapsed.nonEmpty && collapsed.head.isDigit) "t" + collapsed
    else collapsed
  }
}
