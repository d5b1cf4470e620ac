package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz-harness integrity: the differential queries are produced by
  * a seeded generator, so an innocent-looking grammar edit silently
  * re-rolls every judged text. Pin the corpus digest — growing the list
  * (new seeds appended) or changing the grammar must show up here as a
  * DELIBERATE pin update, not as hundreds of quietly different queries keeping
  * their old names. */
class FuzzSpec extends AnyFunSuite {

  private def digestOf(qs: Seq[queries.Q]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    qs.foreach { q =>
      md.update(q.name.getBytes("UTF-8"))
      md.update(q.oracle.get.getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  test("700 queries, every one oracle-checked (texts are their own oracle)") {
    assert(queries.Fuzz.qs.size == 700)
    assert(queries.Fuzz.qs.forall(_.oracle.isDefined))
  }

  test("round-11 corpus (fz000-fz219) is frozen byte-for-byte") {
    // The UNCHANGED round-11 pin: the grammar extension appended shapes,
    // it must never re-roll the already-judged texts.
    assert(digestOf(queries.Fuzz.qs.take(220)) ==
      "dea30b05d5e2f89eff74b8f334397d53")
  }

  test("round-12 corpus (fz220-fz399) is frozen byte-for-byte") {
    // The UNCHANGED round-12 pin (was the full-corpus digest then).
    assert(digestOf(queries.Fuzz.qs.take(400)) ==
      "52b7c661f1e08c294fe3579bd05352db")
  }

  test("round-13 corpus (fz400-fz499) is frozen byte-for-byte") {
    // The UNCHANGED round-13 pin (was the full-corpus digest then).
    assert(digestOf(queries.Fuzz.qs.take(500)) ==
      "2bb949d1f8e572dea369528e16c11eb5")
  }

  test("round-14 corpus (fz500-fz599) is frozen byte-for-byte") {
    // The UNCHANGED round-14 pin (was the full-corpus digest then).
    assert(digestOf(queries.Fuzz.qs.take(600)) ==
      "d9ef4d78bec072b4e9a999ea8c08b9ca")
  }

  test("generated texts are stable (digest pin)") {
    val digest = digestOf(queries.Fuzz.qs)
    assert(digest == "b888131af8f92e9d7e27399e265b747e",
      s"fuzz corpus digest changed: $digest")
  }

  test("every text carries a total order: an ORDER BY is present") {
    assert(queries.Fuzz.qs.forall(_.oracle.get.contains("ORDER BY")))
  }
}
