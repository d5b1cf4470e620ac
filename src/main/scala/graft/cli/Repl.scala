package graft.cli

import scala.io.StdIn
import graft.engine.Session
import graft.io.Save

/** Interactive SQL shell over discovered files — the reference's REPL
  * surface (localsql/localsql.py:269-364) on the Spark engine.
  *
  * Supported, matching the reference:
  *  - positional files, `-d DIR`, `-r` recursive, `-q SQL` one-shot,
  *    `-jn` JSON-normalize mode (CLI: ref :269-279)
  *  - specials: `\t` tables, `\td` table descriptions, `\s file`
  *    export, `\q` quit, unknown `\x` -> help (ref :155-214)
  *  - bare table name -> schema info (ref :226-228)
  *  - `/t` suffix -> transposed (vertical) display (ref :349-358)
  *
  * Not carried over: the `\lpy` raw-Python eval mode — its Spark analog
  * is the spark-shell Dataset API itself (SURVEY.md §2.6).
  */
object Repl {

  val Version = "graft/0.2.0"

  def main(args: Array[String]): Unit = {
    var files = List.empty[String]
    var dir: Option[String] = None
    var recursive = false
    var query: Option[String] = None
    var jsonNormalize = false
    var verbose = false
    var silent = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-d" | "--directory" => dir = Some(args(i + 1)); i += 1
        case "-r" | "--recursive" => recursive = true
        case "-q" | "--query" => query = Some(args(i + 1)); i += 1
        case "-jn" | "--json-normalize" => jsonNormalize = true
        case "-v" | "--verbose" => verbose = true
        case "-s" | "--silent" => silent = true
        case "-V" | "--version" => println(Version); return
        case f => files = files :+ f
      }
      i += 1
    }
    // informational output goes through eprint, suppressed by -s and
    // enriched by -v — the reference's silent/verbose modes
    // (localsql.py:57-64, :306-309)
    def eprint(msg: => String): Unit = if (!silent) println(msg)
    val base = Session.local("graft-repl")
    if (verbose) base.spark.sparkContext.setLogLevel("INFO")
    val session = new Session(base.spark, jsonNormalize = jsonNormalize)
    def describe(name: String): String = {
      val df = session.tables(name)
      if (verbose) s"table=$name, columns=${df.columns.length}, rows=${df.count()}"
      else s"table '$name'"
    }
    files.foreach { f =>
      session.loadFile(f) match {
        case Some(name) => eprint(s"Load '$f' as ${describe(name)}")
        case None => eprint(s"Unknown file type or load error: $f")
      }
    }
    dir.orElse(if (recursive) Some(".") else None).foreach { d =>
      session.loadDir(d, recursive).foreach(n => eprint(s"Load ${describe(n)}"))
    }
    if (session.tables.isEmpty && query.isEmpty)
      eprint("Warning: no tables loaded. Try -r, -d or --help")

    query match {
      case Some(q) => run(session, q)
      case None => loop(session)
    }
    session.spark.stop()
  }

  private def loop(session: Session): Unit = {
    var done = false
    while (!done) {
      print("lsql> ")
      Console.flush()
      val line = StdIn.readLine()
      if (line == null || line.trim == "\\q") done = true
      else if (line.trim.nonEmpty) run(session, line.trim)
    }
  }

  /** `\pp` pretty-print toggle (ref :203-206): truncate + 20 rows vs
    * full-width 50 rows. */
  private var pretty = false

  private[cli] def run(session: Session, raw: String): Unit = {
    val (line, transpose) =
      if (raw.endsWith("/t")) (raw.dropRight(2).trim, true) else (raw, false)
    try {
      if (line.startsWith("\\")) special(session, line)
      else if (session.tables.contains(line)) println(session.info(line))
      else {
        val df = session.sql(line)
        if (transpose) df.show(20, truncate = 0, vertical = true)
        else if (pretty) df.show(20, truncate = 24)
        else df.show(50, truncate = false)
      }
    } catch {
      case e: Exception =>
        // surface Catalyst errors cleanly (ref error rewriting :235-242):
        // keep the message, drop the internal plan fragment / stack noise
        val msg = Option(e.getMessage).getOrElse(e.toString)
        println(msg.linesIterator
          .takeWhile(l => !l.trim.startsWith("'") && !l.contains("SQLSTATE"))
          .take(3).mkString("\n")
          + msg.linesIterator.find(_.contains("SQLSTATE")).map("\n" + _).getOrElse(""))
    }
  }

  private def special(session: Session, cmd: String): Unit =
    cmd.split("\\s+", 2) match {
      case Array("\\t") => session.tableNames.foreach(println)
      case Array("\\td") =>
        session.describeTables().foreach { case (n, r, c, b) =>
          println(f"$n%-30s rows=$r%-10d cols=$c%-5d bytes=$b")
        }
      case Array("\\pp") =>
        pretty = !pretty
        println(s"Pretty print: ${if (pretty) "on" else "off"}")
      case Array("\\s", file) =>
        session.latestResult match {
          case Some(df) => Save.save(df, file); println(s"Saved to $file")
          case None => println("There is no result to save")
        }
      // word completion (ref WordCompleter, localsql.py:323-333): the
      // plain-stdin analog of TAB — list catalog names matching a prefix
      case Array("\\c") =>
        session.completions.foreach(println)
      case Array("\\c", prefix) =>
        graft.engine.Completions.complete(session.completions, prefix)
          .foreach(println)
      case _ =>
        println("""Special commands: \t tables, \td describe, \pp pretty toggle, \s FILE save last result, \c [PREFIX] complete names, \q quit""")
    }
}
