package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File discovery, matching the reference CLI surface
  * (localsql/localsql.py:288-300): explicit file list, `-d DIR` glob
  * `*.*`, or `-r` recursive glob from the current directory.
  * Driver-side metadata walk only — the (possibly huge) file contents
  * are never touched here; Spark readers open them lazily at action
  * time.
  */
object Discover {

  /** Non-recursive: every regular file directly in `dir` whose name
    * contains a dot (the reference's `*.*` glob). */
  def inDir(dir: String): Seq[Path] =
    Files.list(Paths.get(dir)).iterator.asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.contains("."))
      .toSeq.sortBy(_.toString)

  /** Recursive walk (the reference's recursive glob). */
  def recursive(dir: String): Seq[Path] =
    Files.walk(Paths.get(dir)).iterator.asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.contains("."))
      .toSeq.sortBy(_.toString)

  def explicit(files: Seq[String]): Seq[Path] = files.map(Paths.get(_))
}
