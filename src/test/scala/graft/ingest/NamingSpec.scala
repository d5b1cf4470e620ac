package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class NamingSpec extends AnyFunSuite {

  test("reference examples") {
    // README.md:47: one.json -> one_json; leading digit gets t prefix
    assert(Naming.tableName("one.json") == "one_json")
    assert(Naming.tableName("2024.csv") == "t2024_csv")
    assert(Naming.tableName("lines_nested.json") == "lines_nested_json")
    assert(Naming.tableName("/some/dir/excel.xlsx") == "excel_xlsx")
    assert(Naming.tableName("a b-c.d(e).csv") == "a_b_c_d_e_csv")
  }

  test("property: collapses underscore runs, never emits specials or leading digit") {
    val gen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(':', '*', '?', '-', '<', '>', '|', '.', '(', ')', ' ')
    )).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val n = Naming.tableName(s + ".csv")
      !n.contains("__") &&
        n.forall(c => !":*?-<=>|\"'.{}[]() ".contains(c)) &&
        (n.isEmpty || !n.head.isDigit)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
