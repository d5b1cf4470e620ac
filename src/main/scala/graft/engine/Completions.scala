package graft.engine

/** Word completion over the session catalog — the reference's
  * prompt-toolkit WordCompleter fed with table names then column names
  * (localsql/localsql.py:323-333), column names quoted when they match
  * the special-character regex (ref :40). The reference emits SQLite
  * double-quoted identifiers; here the quote form is Spark SQL's
  * backtick. Pure functions so the REPL surface is testable without a
  * terminal.
  */
object Completions {

  // port of the reference's re_quotated_column (localsql.py:40):
  // "[ -.,{}\[\]()<>?/\\'!@#$%^&*:;`~ ]" — note the leading " -." is a
  // character RANGE (space through '.'), covering most punctuation
  private val NeedsQuote = java.util.regex.Pattern.compile(
    "[ -.,{}\\[\\]()<>?/\\\\'!@#$%^&*:;`~]")

  /** Backtick-quote a column name when it would not survive as a bare
    * identifier (embedded backticks doubled, Spark SQL's escape). */
  def quoteIfNeeded(name: String): String =
    if (NeedsQuote.matcher(name).find())
      "`" + name.replace("`", "``") + "`"
    else name

  /** Candidate list: table names first, then each table's columns
    * (quoted as needed), first-seen order, deduplicated — the exact
    * construction of ref :324-333. */
  def candidates(tables: Iterable[(String, Seq[String])]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    tables.foreach { case (name, _) => out += name }
    tables.foreach { case (_, cols) => cols.foreach(c => out += quoteIfNeeded(c)) }
    out.toSeq
  }

  /** Prefix completion on the buffer's last whitespace-separated word
    * (WordCompleter's default matching). Empty last word -> everything. */
  def complete(cands: Seq[String], buffer: String): Seq[String] = {
    val word = buffer.split("\\s+").lastOption.filter(_ => !buffer.endsWith(" "))
      .getOrElse("")
    if (word.isEmpty) cands else cands.filter(_.startsWith(word))
  }
}
