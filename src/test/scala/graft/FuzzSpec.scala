package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz-harness integrity: the 220 differential queries are produced by
  * a seeded generator, so an innocent-looking grammar edit silently
  * re-rolls every judged text. Pin the corpus digest — growing the list
  * (new seeds appended) or changing the grammar must show up here as a
  * DELIBERATE pin update, not as 220 quietly different queries keeping
  * their old names. */
class FuzzSpec extends AnyFunSuite {

  test("220 queries, every one oracle-checked (texts are their own oracle)") {
    assert(queries.Fuzz.qs.size == 220)
    assert(queries.Fuzz.qs.forall(_.oracle.isDefined))
  }

  test("generated texts are stable (digest pin)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    queries.Fuzz.qs.foreach { q =>
      md.update(q.name.getBytes("UTF-8"))
      md.update(q.oracle.get.getBytes("UTF-8"))
    }
    val digest = md.digest().map("%02x".format(_)).mkString
    assert(digest == "dea30b05d5e2f89eff74b8f334397d53",
      s"fuzz corpus digest changed: $digest")
  }

  test("every text carries a total order: an ORDER BY is present") {
    assert(queries.Fuzz.qs.forall(_.oracle.get.contains("ORDER BY")))
  }
}
