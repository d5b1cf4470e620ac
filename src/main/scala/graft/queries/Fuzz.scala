package graft.queries

import scala.util.Random

/** Differential SQL fuzz harness (VERDICT r11 next-round #5): seeded
  * random queries from a grammar over the TPC-H-ish test schema, each
  * registered like any catalog entry and judged against DuckDB running
  * the IDENTICAL text. The hand-written catalog tests what the builder
  * thought of; this tests what nobody did.
  *
  * The grammar is restricted to the dialect intersection where the two
  * engines are VALUE-IDENTICAL, so any mismatch is a real bug, not
  * drift:
  *  - every query ends in a TOTAL order (unique key or the full group
  *    key set, explicit NULLS FIRST) — the driver compares row-by-row;
  *  - no order-dependent float accumulation: double SUMs go through
  *    DECIMAL(18,2) (exact, order-free), doubles otherwise appear only
  *    under min/max/comparison (bit-exact in both engines);
  *  - integer SUMs reduce the operand mod a small prime and CAST the
  *    result (DuckDB widens sum(BIGINT) to HUGEINT, which pandas reads
  *    as float);
  *  - key-valued literals are scale-invariant (modulo classes, not
  *    absolute ids), so the same text is meaningful at every SF;
  *  - no raw timestamp outputs (cast to DATE), no collation-sensitive
  *    ORDER BY on free text, no engine-specific functions.
  *
  * Determinism: each query's text is produced by a fixed-seed LCG
  * ([[scala.util.Random]] wraps java.util.Random — the algorithm is
  * specified, so the text is stable across JVMs and rounds); the
  * FuzzSpec locks the generated texts' digest so an accidental
  * grammar change renames itself loudly instead of silently re-rolling
  * the judged corpus.
  */
object Fuzz {

  // ---- schema model ---------------------------------------------------

  /** kind: i = integral, d = double, s = low-cardinality string,
    * t = timestamp (DATE-cast before use). */
  private final case class C(name: String, kind: Char)
  private final case class T(
      name: String,
      cols: Seq[C],
      key: Seq[String], // unique total-order key
      lits: Map[String, Seq[String]]) { // string-col literal domains
    def ints: Seq[C] = cols.filter(_.kind == 'i')
    def dbls: Seq[C] = cols.filter(_.kind == 'd')
    def strs: Seq[C] = cols.filter(_.kind == 's')
    def dates: Seq[C] = cols.filter(_.kind == 't')
  }

  private val lineitem = T("lineitem",
    Seq(C("l_orderkey", 'i'), C("l_partkey", 'i'), C("l_suppkey", 'i'),
      C("l_linenumber", 'i'), C("l_quantity", 'd'),
      C("l_extendedprice", 'd'), C("l_discount", 'd'), C("l_tax", 'd'),
      C("l_returnflag", 's'), C("l_linestatus", 's'), C("l_shipdate", 't')),
    // NOT (l_orderkey, l_linenumber): the synthetic lineitem duplicates
    // that pair (verify SKILL gotcha); the 4-column key IS unique at
    // both gate SFs
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    Map("l_returnflag" -> Seq("A", "N", "R"),
      "l_linestatus" -> Seq("F", "O")))
  private val orders = T("orders",
    Seq(C("o_orderkey", 'i'), C("o_custkey", 'i'), C("o_orderstatus", 's'),
      C("o_totalprice", 'd'), C("o_orderdate", 't'),
      C("o_orderpriority", 's')),
    Seq("o_orderkey"),
    Map("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")))
  private val customer = T("customer",
    Seq(C("c_custkey", 'i'), C("c_nationkey", 'i'), C("c_acctbal", 'd'),
      C("c_mktsegment", 's')),
    Seq("c_custkey"),
    Map("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")))
  private val supplier = T("supplier",
    Seq(C("s_suppkey", 'i'), C("s_nationkey", 'i'), C("s_acctbal", 'd')),
    Seq("s_suppkey"), Map.empty)
  private val part = T("part",
    Seq(C("p_partkey", 'i'), C("p_size", 'i'), C("p_retailprice", 'd'),
      C("p_brand", 's'), C("p_type", 's')),
    Seq("p_partkey"),
    Map("p_brand" -> (1 to 25).map(i => s"Brand#$i"),
      "p_type" -> Seq("ECONOMY", "STANDARD", "PROMO", "SMALL", "MEDIUM",
        "LARGE")))
  private val nation = T("nation",
    Seq(C("n_nationkey", 'i'), C("n_regionkey", 'i'), C("n_name", 's')),
    Seq("n_nationkey"),
    Map("n_name" -> (0 to 24).map(i => s"NATION_$i")))
  private val events = T("events",
    Seq(C("event_id", 'i'), C("user_id", 'i'), C("value", 'd'),
      C("event_type", 's'), C("ts", 't')),
    Seq("event_id"),
    Map("event_type" -> Seq("click", "error", "purchase", "signup",
      "view")))
  private val documents = T("documents",
    Seq(C("doc_id", 'i'), C("n_chars", 'i'), C("lang", 's'),
      C("source", 's')),
    Seq("doc_id"),
    Map("lang" -> Seq("de", "en", "es", "fr", "zh"),
      "source" -> (0 to 19).map(i => s"src$i")))

  private val singleTables =
    Seq(lineitem, orders, customer, part, events, documents)

  /** FK join edges: (left, right, ON clause). */
  private val joins2 = Seq(
    (lineitem, orders, "l_orderkey = o_orderkey"),
    (lineitem, part, "l_partkey = p_partkey"),
    (lineitem, supplier, "l_suppkey = s_suppkey"),
    (orders, customer, "o_custkey = c_custkey"),
    (customer, nation, "c_nationkey = n_nationkey"),
    (supplier, nation, "s_nationkey = n_nationkey"))
  /** 3-table chains: (a, b, c, ON ab, ON bc). */
  private val joins3 = Seq(
    (lineitem, orders, customer,
      "l_orderkey = o_orderkey", "o_custkey = c_custkey"),
    (orders, customer, nation,
      "o_custkey = c_custkey", "c_nationkey = n_nationkey"),
    (lineitem, supplier, nation,
      "l_suppkey = s_suppkey", "s_nationkey = n_nationkey"))

  // ---- grammar pieces ---------------------------------------------------

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** A date-typed SQL expression for a timestamp column. */
  private def asDate(c: C) = s"CAST(${c.name} AS DATE)"

  private def dateLit(r: Random, t: T): String =
    if (t.name == "events") { // 2024-01 window
      f"DATE '2024-01-${1 + r.nextInt(29)}%02d'"
    } else { // order/ship dates: 1995..2001
      f"DATE '${1995 + r.nextInt(6)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d'"
    }

  /** One atomic predicate over table t (alias-free: single-table or
    * disambiguated-by-name joined schemas). */
  private def atom(r: Random, t: T): String = {
    val kinds = Seq.newBuilder[Int]
    if (t.strs.exists(c => t.lits.contains(c.name))) { kinds += 0; kinds += 1 }
    if (t.ints.nonEmpty) kinds += 2
    if (t.dbls.nonEmpty) kinds += 3
    if (t.dates.nonEmpty) kinds += 4
    pick(r, kinds.result()) match {
      case 0 => // string equality / inequality
        val c = pick(r, t.strs.filter(c => t.lits.contains(c.name)))
        val v = pick(r, t.lits(c.name))
        val op = pick(r, Seq("=", "<>", "<=", ">="))
        s"${c.name} $op '$v'"
      case 1 => // string IN-list
        val c = pick(r, t.strs.filter(c => t.lits.contains(c.name)))
        val dom = t.lits(c.name)
        val k = 1 + r.nextInt(math.min(3, dom.size))
        val vs = r.shuffle(dom.toList).take(k).sorted
        s"${c.name} IN (${vs.map(v => s"'$v'").mkString(", ")})"
      case 2 => // scale-invariant integer modulo class
        val c = pick(r, t.ints)
        val m = pick(r, Seq(2, 3, 5, 7, 11, 13))
        val cmp = pick(r, Seq("=", "<>", "<", ">="))
        s"${c.name} % $m $cmp ${r.nextInt(m)}"
      case 3 => // double comparison against an in-domain literal
        val c = pick(r, t.dbls)
        val lit = c.name match {
          case "l_quantity" => (1 + r.nextInt(49)).toString + ".5"
          case "l_discount" => s"0.0${r.nextInt(10)}"
          case "l_tax" => s"0.0${r.nextInt(8)}"
          case "l_extendedprice" => (5000 + r.nextInt(90) * 1000).toString
          case "o_totalprice" => (20000 + r.nextInt(40) * 10000).toString
          case "c_acctbal" | "s_acctbal" => (-500 + r.nextInt(19) * 500).toString
          case "p_retailprice" => (1000 + r.nextInt(40) * 50).toString
          case _ => (10 + r.nextInt(400)).toString // events.value
        }
        s"${c.name} ${pick(r, Seq("<", "<=", ">", ">="))} $lit"
      case _ => // date comparison
        val c = pick(r, t.dates)
        s"${asDate(c)} ${pick(r, Seq("<", ">="))} ${dateLit(r, t)}"
    }
  }

  /** 1-3 atoms joined by AND/OR (parenthesized — precedence-proof). */
  private def predicate(r: Random, ts: T*): String = {
    val n = 1 + r.nextInt(3)
    val atoms = (0 until n).map(_ => atom(r, pick(r, ts)))
    atoms.map(a => s"($a)").mkString(s" ${pick(r, Seq("AND", "OR", "AND"))} ")
  }

  /** Aggregate select-items over t; every item aliased a0, a1, ... */
  private def aggs(r: Random, t: T, n: Int): Seq[String] =
    (0 until n).map { i =>
      val menu = Seq.newBuilder[String]
      menu += "CAST(count(*) AS BIGINT)"
      if (t.ints.nonEmpty) {
        val c = pick(r, t.ints).name
        menu += s"CAST(count(DISTINCT $c) AS BIGINT)"
        menu += s"CAST(min($c) AS BIGINT)"
        menu += s"CAST(max($c) AS BIGINT)"
        menu += s"CAST(sum($c % 97) AS BIGINT)"
      }
      if (t.dbls.nonEmpty) {
        val c = pick(r, t.dbls).name
        menu += s"min($c)"
        menu += s"max($c)"
        menu += s"CAST(round(sum(CAST($c AS DECIMAL(18,2))), 2) AS DOUBLE)"
      }
      if (t.strs.nonEmpty) {
        val c = pick(r, t.strs).name
        menu += s"min($c)"
        menu += s"count(DISTINCT $c)" // count is BIGINT pre-widen in both
      }
      menu += s"CAST(sum(CASE WHEN ${atom(r, t)} THEN 1 ELSE 0 END) AS BIGINT)"
      s"${pick(r, menu.result())} AS a$i"
    }

  /** Group keys over t: (select-exprs aliased g0.., bare alias list). */
  private def groupKeys(r: Random, t: T): (Seq[String], Seq[String]) = {
    val n = 1 + r.nextInt(2)
    val exprs = (0 until n).map { i =>
      val menu = Seq.newBuilder[String]
      if (t.strs.nonEmpty) menu += pick(r, t.strs).name
      if (t.ints.nonEmpty)
        menu += s"${pick(r, t.ints).name} % ${pick(r, Seq(4, 5, 8, 10))}"
      if (t.dates.nonEmpty)
        menu += s"CAST(EXTRACT(YEAR FROM ${pick(r, t.dates).name}) AS BIGINT)"
      s"${pick(r, menu.result())} AS g$i"
    }
    (exprs, (0 until n).map(i => s"g$i"))
  }

  // ---- query shapes -----------------------------------------------------

  private def orderTail(keys: Seq[String]): String =
    s"ORDER BY ${keys.map(k => s"$k NULLS FIRST").mkString(", ")}"

  /** Shape A: single-table filtered aggregate (optionally HAVING). */
  private def shapeAgg(r: Random): String = {
    val t = pick(r, singleTables)
    val (gx, gk) = groupKeys(r, t)
    val as = aggs(r, t, 1 + r.nextInt(3))
    val having =
      if (r.nextInt(3) == 0) s"\nHAVING count(*) > ${r.nextInt(5)}" else ""
    s"""SELECT ${(gx ++ as).mkString(", ")}
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |GROUP BY ${gk.mkString(", ")}$having
       |${orderTail(gk)}""".stripMargin
  }

  /** Shape B: projection + filter + total order + LIMIT. */
  private def shapeProj(r: Random): String = {
    val t = pick(r, singleTables)
    val exprs = Seq.newBuilder[String]
    var i = 0
    def alias = { i += 1; s"e$i" }
    (0 until 1 + r.nextInt(3)).foreach { _ =>
      val menu = Seq.newBuilder[String]
      if (t.ints.size >= 2) {
        val a = pick(r, t.ints).name; val b = pick(r, t.ints).name
        menu += s"CAST($a % 1000 + $b % 7 AS BIGINT)"
      }
      if (t.strs.nonEmpty) {
        val c = pick(r, t.strs).name
        menu += pick(r, Seq(s"upper($c)", s"substr($c, 1, 3)",
          s"concat($c, '_', '${t.name}')",
          s"CASE WHEN ${atom(r, t)} THEN $c ELSE 'other' END"))
      }
      if (t.dbls.nonEmpty) {
        // the raw column: parquet doubles read bit-identically in both
        // engines (round(double) would NOT match — Spark rounds the
        // shortest-repr decimal, DuckDB the binary value)
        menu += pick(r, t.dbls).name
      }
      if (t.dates.nonEmpty)
        // as STRING: a projected DATE reads back as datetime64 on the
        // DuckDB side of the compare ('yyyy-mm-dd 00:00:00') but as a
        // python date ('yyyy-mm-dd') on the Spark side
        menu += s"CAST(${asDate(pick(r, t.dates))} AS STRING)"
      exprs += s"${pick(r, menu.result())} AS $alias"
    }
    s"""SELECT ${(t.key ++ exprs.result()).mkString(", ")}
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |${orderTail(t.key)}
       |LIMIT ${50 + r.nextInt(4) * 50}""".stripMargin
  }

  /** Shape C: FK join (2 tables) + aggregate over the pair schema. */
  private def shapeJoin2(r: Random): String = {
    val (a, b, on) = pick(r, joins2)
    val (gx, gk) = groupKeys(r, if (r.nextBoolean()) a else b)
    val as = aggs(r, a, 1 + r.nextInt(2))
    s"""SELECT ${(gx ++ as).mkString(", ")}
       |FROM ${a.name} JOIN ${b.name} ON $on
       |WHERE ${predicate(r, a, b)}
       |GROUP BY ${gk.mkString(", ")}
       |${orderTail(gk)}""".stripMargin
  }

  /** Shape D: 3-table FK chain + aggregate. */
  private def shapeJoin3(r: Random): String = {
    val (a, b, c, ab, bc) = pick(r, joins3)
    val (gx, gk) = groupKeys(r, pick(r, Seq(b, c)))
    val as = aggs(r, a, 1 + r.nextInt(2))
    s"""SELECT ${(gx ++ as).mkString(", ")}
       |FROM ${a.name}
       |JOIN ${b.name} ON $ab
       |JOIN ${c.name} ON $bc
       |WHERE ${predicate(r, a, c)}
       |GROUP BY ${gk.mkString(", ")}
       |${orderTail(gk)}""".stripMargin
  }

  /** Shape E: window over a filtered table, totally ordered + LIMIT. */
  private def shapeWindow(r: Random): String = {
    val t = pick(r, Seq(lineitem, orders, customer, events, documents))
    val partCol = pick(r, t.strs).name
    val keyList = t.key.mkString(", ")
    val wf = pick(r, Seq(
      s"CAST(row_number() OVER (PARTITION BY $partCol ORDER BY $keyList) AS BIGINT)",
      s"CAST(rank() OVER (PARTITION BY $partCol ORDER BY ${t.key.head} % 5, $keyList) AS BIGINT)",
      s"CAST(count(*) OVER (PARTITION BY $partCol) AS BIGINT)",
      s"CAST(sum(${pick(r, t.ints).name} % 97) OVER (PARTITION BY $partCol ORDER BY $keyList ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
      s"CAST(lag(${t.key.head}, 1, -1) OVER (PARTITION BY $partCol ORDER BY $keyList) AS BIGINT)"))
    s"""SELECT ${keyList}, $partCol, $wf AS w0
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |${orderTail(t.key)}
       |LIMIT ${100 + r.nextInt(3) * 50}""".stripMargin
  }

  /** Shape F: set operation between two predicates' key sets. */
  private def shapeSetOp(r: Random): String = {
    val t = pick(r, singleTables)
    val keyExpr = t.key.head
    val op = pick(r, Seq("UNION", "INTERSECT", "EXCEPT", "UNION ALL"))
    // UNION ALL can duplicate a key matched by both predicates, but the
    // duplicated rows are byte-identical single-column rows, so any
    // tie-order under ORDER BY k yields the same output sequence.
    s"""SELECT $keyExpr AS k FROM ${t.name} WHERE ${predicate(r, t)}
       |$op
       |SELECT $keyExpr FROM ${t.name} WHERE ${predicate(r, t)}
       |ORDER BY k NULLS FIRST
       |LIMIT 500""".stripMargin
  }

  /** Shape G: IN / scalar subquery. */
  private def shapeSubquery(r: Random): String = {
    pick(r, Seq(0, 1, 2)) match {
      case 0 => // orders driven by a customer-segment IN-list
        s"""SELECT o_orderkey, o_orderstatus
           |FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer
           |  WHERE ${predicate(r, customer)})
           |  AND ${predicate(r, orders)}
           |ORDER BY o_orderkey NULLS FIRST
           |LIMIT ${100 + r.nextInt(3) * 100}""".stripMargin
      case 1 => // parts near the max size
        val off = 1 + r.nextInt(10)
        s"""SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS sz
           |FROM part
           |WHERE p_size >= (SELECT max(p_size) - $off FROM part)
           |  AND ${predicate(r, part)}
           |ORDER BY p_partkey NULLS FIRST""".stripMargin
      case _ => // docs from sources that clear a size floor
        s"""SELECT doc_id, source
           |FROM documents
           |WHERE source IN (SELECT source FROM documents
           |  GROUP BY source HAVING count(*) > ${2 + r.nextInt(8)})
           |  AND ${predicate(r, documents)}
           |ORDER BY doc_id NULLS FIRST
           |LIMIT 300""".stripMargin
    }
  }

  // ---- round-12 grammar extension (shapes H-M) --------------------------
  //
  // Adds the null-producing and multi-level shapes the first seven never
  // reach: LEFT JOIN (unmatched-row NULLs through aggregates), correlated
  // [NOT] EXISTS, ROLLUP/CUBE/GROUPING SETS (super-aggregate NULL keys +
  // GROUPING()), scalar-expression torture (COALESCE/NULLIF/CASE/string
  // functions/date arithmetic), CTE re-aggregation, and the second window
  // tier (dense_rank/ntile/lead/first_value/last_value/bounded frames).
  // Same dialect-intersection rules as shapes A-G.

  /** LEFT-join edges: (left, right, ON). Right-side predicates go in the
    * ON clause (a WHERE predicate on the right side would silently turn
    * the join inner — the classic outer-join bug this shape exists to
    * cross-check). */
  private val leftJoins = Seq(
    (customer, orders, "o_custkey = c_custkey"),
    (orders, lineitem, "l_orderkey = o_orderkey"),
    (part, lineitem, "l_partkey = p_partkey"),
    (supplier, lineitem, "l_suppkey = s_suppkey"),
    (nation, customer, "c_nationkey = n_nationkey"),
    (nation, supplier, "s_nationkey = n_nationkey"))

  /** Shape H: LEFT JOIN + aggregate — counts/sums over the NULL-padded
    * right side, grouped by (never-null) left-table keys. */
  private def shapeLeftJoin(r: Random): String = {
    val (a, b, on) = pick(r, leftJoins)
    val (gx, gk) = groupKeys(r, a)
    val bi = pick(r, b.ints).name
    val as = Seq.newBuilder[String]
    as += "CAST(count(*) AS BIGINT) AS a0"
    as += s"CAST(count($bi) AS BIGINT) AS a1" // NULLs not counted
    pick(r, 0 to 2) match {
      case 0 => as += s"CAST(count(DISTINCT $bi) AS BIGINT) AS a2"
      case 1 => as += s"CAST(sum(CASE WHEN $bi IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS a2"
      case _ => as += s"CAST(sum($bi % 97) AS BIGINT) AS a2" // sum skips NULLs
    }
    // 1/4 of the time: the anti-join flavor (keep only unmatched rows).
    // predicate() can be an OR-chain, so composed uses MUST parenthesize
    // it: a bare `pred AND x` would rebind `... OR (atom) AND x` and,
    // in the EXISTS shape, push the correlation off the top level —
    // semantics leak AND a decorrelation-killer (nested-loop oracle).
    val anti = if (r.nextInt(4) == 0) s"\n  AND ${b.key.head} IS NULL" else ""
    s"""SELECT ${(gx ++ as.result()).mkString(", ")}
       |FROM ${a.name} LEFT JOIN ${b.name} ON $on AND (${atom(r, b)})
       |WHERE (${predicate(r, a)})$anti
       |GROUP BY ${gk.mkString(", ")}
       |${orderTail(gk)}""".stripMargin
  }

  /** Correlated-subquery edges: (outer, inner, correlation). */
  private val existsEdges = Seq(
    (customer, orders, "o_custkey = c_custkey"),
    (orders, lineitem, "l_orderkey = o_orderkey"),
    (part, lineitem, "l_partkey = p_partkey"),
    (supplier, lineitem, "l_suppkey = s_suppkey"))

  /** Shape I: correlated [NOT] EXISTS semi/anti join. */
  private def shapeExists(r: Random): (String, String) = {
    val (a, b, corr) = pick(r, existsEdges)
    val neg = r.nextBoolean()
    val kw = if (neg) "NOT EXISTS" else "EXISTS"
    val proj = a.key ++ a.strs.take(1).map(_.name)
    val tag = if (neg) "nexists" else "exists"
    (tag,
      s"""SELECT ${proj.mkString(", ")}
         |FROM ${a.name}
         |WHERE $kw (SELECT 1 FROM ${b.name}
         |  WHERE $corr AND (${predicate(r, b)}))
         |  AND (${predicate(r, a)})
         |${orderTail(a.key)}
         |LIMIT ${200 + r.nextInt(3) * 100}""".stripMargin)
  }

  /** Tables with two plain low-cardinality string columns — GROUPING()
    * needs bare columns, not aliased expressions. */
  private val rollupTables = Seq(
    (lineitem, "l_returnflag", "l_linestatus"),
    (orders, "o_orderstatus", "o_orderpriority"),
    (documents, "lang", "source"),
    (part, "p_brand", "p_type"))

  /** Shape J: ROLLUP / CUBE / GROUPING SETS with GROUPING() flags —
    * (gr0, gr1, g0, g1) is a unique total-order key at every level. */
  private def shapeRollup(r: Random): String = {
    val (t, g0, g1) = pick(r, rollupTables)
    val groupBy = pick(r, Seq(
      s"ROLLUP($g0, $g1)",
      s"CUBE($g0, $g1)",
      s"GROUPING SETS (($g0, $g1), ($g0), ())"))
    val as = aggs(r, t, 1 + r.nextInt(2))
    s"""SELECT $g0, $g1, CAST(GROUPING($g0) AS BIGINT) AS gr0,
       |  CAST(GROUPING($g1) AS BIGINT) AS gr1, ${as.mkString(", ")}
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |GROUP BY $groupBy
       |${orderTail(Seq("gr0", "gr1", g0, g1))}""".stripMargin
  }

  /** Shape K: scalar-expression torture — COALESCE/NULLIF/CASE chains,
    * string functions, date arithmetic, greatest/least — projected over
    * a filtered table with the unique key carried through. */
  private def shapeExpr(r: Random): String = {
    val t = pick(r, singleTables)
    var i = 0
    def alias = { i += 1; s"e$i" }
    val exprs = (0 until 2 + r.nextInt(3)).map { _ =>
      val menu = Seq.newBuilder[String]
      if (t.ints.nonEmpty) {
        val a = pick(r, t.ints).name
        val m = 2 + r.nextInt(9)
        menu += s"CAST(COALESCE(NULLIF($a % $m, ${r.nextInt(m)}), -1) AS BIGINT)"
        menu += s"CAST(abs($a % 100 - 50) AS BIGINT)"
        if (t.ints.size >= 2) {
          val b = pick(r, t.ints).name
          val fn = pick(r, Seq("greatest", "least"))
          menu += s"CAST($fn($a % 13, $b % 13) AS BIGINT)"
        }
      }
      if (t.strs.nonEmpty) {
        val c = pick(r, t.strs).name
        menu += pick(r, Seq(
          s"CAST(length($c) AS BIGINT)",
          s"replace($c, '${pick(r, Seq("a", "e", "r", "_", "1"))}', '+')",
          s"lpad($c, ${4 + r.nextInt(9)}, '*')",
          s"rpad($c, ${4 + r.nextInt(9)}, '.')",
          s"reverse($c)",
          s"substr(lower($c), ${1 + r.nextInt(2)}, ${2 + r.nextInt(4)})"))
        if (t.strs.size >= 2) {
          val d = pick(r, t.strs).name
          menu += s"concat_ws('-', $c, $d)"
        }
        if (t.lits.contains(c)) {
          val dom = t.lits(c)
          menu += s"CASE WHEN $c = '${pick(r, dom)}' THEN 'hit' WHEN $c >= '${pick(r, dom)}' THEN 'high' ELSE $c END"
        }
      }
      if (t.dates.nonEmpty) {
        val d = pick(r, t.dates)
        val k = 1 + r.nextInt(30)
        // DuckDB types DATE + INTERVAL as TIMESTAMP; the double CAST
        // lands both engines on the same printed date string.
        menu += s"CAST(CAST(${asDate(d)} + INTERVAL '$k' DAY AS DATE) AS STRING)"
        menu += s"CAST(EXTRACT(${pick(r, Seq("YEAR", "MONTH", "DAY"))} FROM ${d.name}) AS BIGINT)"
      }
      s"${pick(r, menu.result())} AS $alias"
    }
    s"""SELECT ${(t.key ++ exprs).mkString(", ")}
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |${orderTail(t.key)}
       |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
  }

  /** CTE fact→dim edges: (fact, fact FK, dim, dim key). */
  private val cteEdges = Seq(
    (orders, "o_custkey", customer, "c_custkey"),
    (lineitem, "l_orderkey", orders, "o_orderkey"),
    (lineitem, "l_partkey", part, "p_partkey"),
    (lineitem, "l_suppkey", supplier, "s_suppkey"),
    (customer, "c_nationkey", nation, "n_nationkey"))

  /** Shape L: CTE pre-aggregation re-aggregated through a dim join —
    * the two-level GROUP BY shape (sums of counts) none of A-G produce. */
  private def shapeCte(r: Random): String = {
    val (fact, fk, dim, dk) = pick(r, cteEdges)
    val fi = pick(r, fact.ints).name
    val (gx, gk) = groupKeys(r, dim)
    s"""WITH agg AS (
       |  SELECT $fk AS k, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum($fi % 97) AS BIGINT) AS s
       |  FROM ${fact.name}
       |  WHERE ${predicate(r, fact)}
       |  GROUP BY $fk)
       |SELECT ${gx.mkString(", ")}, CAST(count(*) AS BIGINT) AS a0,
       |  CAST(sum(n) AS BIGINT) AS a1, CAST(min(s) AS BIGINT) AS a2,
       |  CAST(max(n) AS BIGINT) AS a3
       |FROM ${dim.name} JOIN agg ON $dk = k
       |WHERE ${predicate(r, dim)}
       |GROUP BY ${gk.mkString(", ")}
       |${orderTail(gk)}""".stripMargin
  }

  /** Shape M: second window tier — dense_rank / ntile / lead /
    * first_value / last_value (explicit full frame) / bounded-frame
    * min-max, always over the unique-key order. */
  private def shapeWindow2(r: Random): String = {
    val t = pick(r, Seq(lineitem, orders, customer, events, documents))
    val partCol = pick(r, t.strs).name
    val keyList = t.key.mkString(", ")
    val k0 = t.key.head
    val ic = pick(r, t.ints).name
    val wf = pick(r, Seq(
      s"CAST(dense_rank() OVER (PARTITION BY $partCol ORDER BY $k0 % ${3 + r.nextInt(5)}, $keyList) AS BIGINT)",
      s"CAST(ntile(${2 + r.nextInt(5)}) OVER (PARTITION BY $partCol ORDER BY $keyList) AS BIGINT)",
      s"CAST(lead($k0, ${1 + r.nextInt(2)}, -7) OVER (PARTITION BY $partCol ORDER BY $keyList) AS BIGINT)",
      s"CAST(first_value($k0) OVER (PARTITION BY $partCol ORDER BY $keyList) AS BIGINT)",
      s"CAST(last_value($k0) OVER (PARTITION BY $partCol ORDER BY $keyList ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)",
      s"CAST(min($ic % 1000) OVER (PARTITION BY $partCol ORDER BY $keyList ROWS BETWEEN ${2 + r.nextInt(4)} PRECEDING AND CURRENT ROW) AS BIGINT)",
      s"CAST(max($ic % 1000) OVER (PARTITION BY $partCol ORDER BY $keyList ROWS BETWEEN ${2 + r.nextInt(4)} PRECEDING AND 1 FOLLOWING) AS BIGINT)"))
    s"""SELECT ${keyList}, $partCol, $wf AS w0
       |FROM ${t.name}
       |WHERE ${predicate(r, t)}
       |${orderTail(t.key)}
       |LIMIT ${100 + r.nextInt(3) * 50}""".stripMargin
  }

  // ---- round-13 grammar extension (shapes N-O) ---------------------------
  //
  // The NULL/edge semantics the first thirteen shapes never reach
  // (VERDICT r12 next-round #6): three-valued-logic torture — IS [NOT]
  // DISTINCT FROM, [NOT] IN over NULL-producing subqueries (the
  // null-aware anti-join), empty-group global aggregates over filtered
  // joins (sum=NULL vs count=0), COALESCE/NULLIF chains over outer-join
  // NULLs — and DECIMAL boundary arithmetic (exact cents/basis-point
  // integers through pinned-scale DECIMAL casts, so both engines must
  // agree bit-for-bit or the query fails loudly). Same
  // dialect-intersection rules as A-M: NULLs are SYNTHESIZED with
  // NULLIF over scale-invariant modulo classes (the base tables carry
  // few organic NULLs), every output lands in BIGINT/STRING via
  // explicit CASTs, and every scale-reducing DECIMAL cast happens on a
  // value whose dropped digits are exactly zero (no rounding-mode
  // exposure: Spark rounds half-up, DuckDB half-even — a tie would
  // diverge).

  /** A nullable scale-invariant integer expression over t: NULL on one
    * residue class, the residue otherwise. */
  private def nullableInt(r: Random, t: T): String = {
    val c = pick(r, t.ints).name
    val m = 2 + r.nextInt(9)
    s"NULLIF($c % $m, ${r.nextInt(m)})"
  }

  /** [NOT] IN edges: (outer table, outer key expr, inner table, inner
    * key column — both reduced to the same modulo domain). */
  private val inEdges = Seq(
    (orders, "o_custkey", customer, "c_custkey"),
    (lineitem, "l_partkey", part, "p_partkey"),
    (lineitem, "l_suppkey", supplier, "s_suppkey"),
    (customer, "c_nationkey", nation, "n_nationkey"))

  /** Shape N: three-valued-logic torture. */
  private def shapeTvl(r: Random): String = pick(r, Seq(0, 1, 2, 3)) match {
    case 0 => // IS [NOT] DISTINCT FROM over synthesized NULLs
      val t = pick(r, singleTables)
      val x = nullableInt(r, t); val y = nullableInt(r, t)
      s"""SELECT ${t.key.mkString(", ")},
         |  CAST(CASE WHEN $x IS DISTINCT FROM $y THEN 1 ELSE 0 END AS BIGINT) AS e1,
         |  CAST(CASE WHEN $x IS NOT DISTINCT FROM $y THEN 1 ELSE 0 END AS BIGINT) AS e2,
         |  CAST(COALESCE($x, $y, -1) AS BIGINT) AS e3
         |FROM ${t.name}
         |WHERE ($x IS DISTINCT FROM ${r.nextInt(4)}) AND (${predicate(r, t)})
         |${orderTail(t.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    case 1 => // [NOT] IN over a NULL-producing subquery list
      val (a, ak, b, bk) = pick(r, inEdges)
      val m = pick(r, Seq(100, 250, 500, 1000))
      val kw = if (r.nextBoolean()) "NOT IN" else "IN"
      val proj = a.key ++ a.strs.take(1).map(_.name)
      s"""SELECT ${proj.mkString(", ")}
         |FROM ${a.name}
         |WHERE ($ak % $m) $kw (SELECT NULLIF($bk % $m, ${r.nextInt(m)})
         |  FROM ${b.name} WHERE ${predicate(r, b)})
         |  AND (${predicate(r, a)})
         |${orderTail(a.key)}
         |LIMIT ${200 + r.nextInt(3) * 100}""".stripMargin
    case 2 => // empty-group global aggregate over a filtered join:
      // count()=0 beside sum/min/max=NULL when the predicate stack
      // matches nothing — the NULL-vs-zero seam of SQL aggregation
      val (a, b, on) = pick(r, joins2)
      val ai = pick(r, a.ints).name; val bi = pick(r, b.ints).name
      val sc = (a.strs ++ b.strs).headOption.map(_.name).getOrElse(ai)
      s"""SELECT CAST(count(*) AS BIGINT) AS a0,
         |  CAST(sum($ai % 97) AS BIGINT) AS a1,
         |  CAST(min($bi) AS BIGINT) AS a2,
         |  CAST(max($bi % 1000) AS BIGINT) AS a3,
         |  CAST(count(DISTINCT $sc) AS BIGINT) AS a4
         |FROM ${a.name} JOIN ${b.name} ON $on
         |WHERE (${atom(r, a)}) AND (${atom(r, a)}) AND (${atom(r, b)})
         |ORDER BY a0 NULLS FIRST""".stripMargin
    case _ => // COALESCE chain over LEFT-JOIN NULLs, grouped by the
      // nullable right-side key (unmatched rows form the NULL group)
      val (a, b, on) = pick(r, leftJoins)
      val bi = pick(r, b.ints).name
      val bs = b.strs.headOption.map(_.name).getOrElse(b.key.head)
      val m = 2 + r.nextInt(7)
      s"""SELECT COALESCE($bs, '(none)') AS g0,
         |  CAST(count(*) AS BIGINT) AS a0,
         |  CAST(count($bi) AS BIGINT) AS a1,
         |  CAST(sum(COALESCE(NULLIF($bi % $m, ${r.nextInt(m)}), -1)) AS BIGINT) AS a2
         |FROM ${a.name} LEFT JOIN ${b.name} ON $on AND (${atom(r, b)})
         |WHERE (${predicate(r, a)})
         |GROUP BY $bs
         |ORDER BY g0 NULLS FIRST""".stripMargin
  }

  /** Shape O: DECIMAL boundary arithmetic. Every double goes through
    * CAST(AS DECIMAL(18,2)) (the proven value-identical bridge), every
    * result through an integral-valued DECIMAL(38,0) (scale reduction
    * drops only exact zeros) and lands in BIGINT. */
  private def shapeDec(r: Random): String = {
    val p = pick(r, Seq(999983, 1000003, 524287))
    pick(r, Seq(0, 1, 2, 3)) match {
      case 0 => // grouped exact-cents rollup (sum/min/max through cents)
        val t = pick(r, Seq(lineitem, orders, customer, part, events))
        val c = pick(r, t.dbls).name
        val (gx, gk) = groupKeys(r, t)
        s"""SELECT ${gx.mkString(", ")},
           |  CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) % $p AS a0,
           |  CAST(CAST(max(CAST($c AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS a1,
           |  CAST(CAST(min(CAST($c AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS a2
           |FROM ${t.name}
           |WHERE ${predicate(r, t)}
           |GROUP BY ${gk.mkString(", ")}
           |${orderTail(gk)}""".stripMargin
      case 1 => // per-row products and signed differences at the
        // DECIMAL(36,4) boundary, projected with the unique key
        val a = pick(r, lineitem.dbls).name
        val b = pick(r, lineitem.dbls).name
        s"""SELECT ${lineitem.key.mkString(", ")},
           |  CAST(CAST(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2)) * 10000 AS DECIMAL(38,0)) AS BIGINT) % $p AS e1,
           |  CAST(CAST((CAST($a AS DECIMAL(18,2)) + CAST($b AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS e2,
           |  CAST(CAST((CAST($a AS DECIMAL(18,2)) - CAST($b AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS e3
           |FROM lineitem
           |WHERE ${predicate(r, lineitem)}
           |${orderTail(lineitem.key)}
           |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
      case 2 => // the revenue shape, exact: per-row basis points folded
        // mod p BEFORE the sum so the output is scale-invariant-bounded
        val (gx, gk) = groupKeys(r, lineitem)
        s"""SELECT ${gx.mkString(", ")},
           |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS DECIMAL(38,0)) AS BIGINT) % $p) AS BIGINT) AS a0,
           |  CAST(count(*) AS BIGINT) AS a1
           |FROM lineitem
           |WHERE ${predicate(r, lineitem)}
           |GROUP BY ${gk.mkString(", ")}
           |${orderTail(gk)}""".stripMargin
      case _ => // HAVING on an exact decimal sum (the predicate seam:
        // DECIMAL >= DECIMAL literal, no doubles anywhere)
        val t = pick(r, Seq(lineitem, orders, customer))
        val c = pick(r, t.dbls).name
        val (gx, gk) = groupKeys(r, t)
        val floor = (5 + r.nextInt(50)) * 100
        s"""SELECT ${gx.mkString(", ")},
           |  CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) % $p AS a0,
           |  CAST(count(*) AS BIGINT) AS a1
           |FROM ${t.name}
           |WHERE ${predicate(r, t)}
           |GROUP BY ${gk.mkString(", ")}
           |HAVING sum(CAST($c AS DECIMAL(18,2))) >= CAST($floor AS DECIMAL(18,2))
           |${orderTail(gk)}""".stripMargin
    }
  }

  // ---- round-14 grammar extension (shapes P-Q) ---------------------------
  //
  // The two seams the 500-query corpus still never reached (VERDICT r13
  // next-round #6): timestamp/interval BOUNDARY arithmetic and
  // multi-level set-op/window COMPOSITION. Same dialect-intersection
  // rules as A-O. Every piece used here was probed value-identical in
  // Spark 4.1 (UTC session) and DuckDB before pinning: month arithmetic
  // CLAMPS at end-of-month in both (2024-01-31 + 1 MONTH = 2024-02-29;
  // 2024-02-29 + 12 MONTHS = 2025-02-28), last_day/make_date/
  // date_trunc('week'|'month'|'quarter') agree, EXTRACT(QUARTER|DOY|
  // WEEK) agree (ISO week — 2021-01-01 is week 53 in both), and date
  // day-math is DST-free under the UTC session. DATE + INTERVAL types
  // as TIMESTAMP in DuckDB, so every shifted date passes through the
  // shape-K double cast (CAST(... AS DATE) then STRING for output).
  // DOW is deliberately ABSENT: Spark numbers Sunday=1..7, DuckDB 0..6.

  /** Shape P: timestamp/interval boundary arithmetic. */
  private def shapeTime(r: Random): String = pick(r, Seq(0, 1, 2, 3)) match {
    case 0 => // month arithmetic at end-of-month (clamp semantics) +
      // last_day, with an is-end-of-month flag
      val t = pick(r, Seq(lineitem, orders, events))
      val d = asDate(pick(r, t.dates))
      val k = 1 + r.nextInt(14)
      s"""SELECT ${t.key.mkString(", ")},
         |  CAST(CAST($d + INTERVAL '$k' MONTH AS DATE) AS STRING) AS e1,
         |  CAST(last_day($d) AS STRING) AS e2,
         |  CAST(CASE WHEN $d = last_day($d) THEN 1 ELSE 0 END AS BIGINT) AS e3,
         |  CAST(CAST(last_day($d) + INTERVAL '${1 + r.nextInt(3)}' MONTH AS DATE) AS STRING) AS e4
         |FROM ${t.name}
         |WHERE ${predicate(r, t)}
         |${orderTail(t.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    case 1 => // epoch-field round-trip: make_date(EXTRACT Y/M/D) must
      // reconstruct the date; DOY/WEEK boundary fields carried along
      val t = pick(r, Seq(lineitem, orders, events))
      val d = asDate(pick(r, t.dates))
      s"""SELECT ${t.key.mkString(", ")},
         |  CAST(EXTRACT(DOY FROM $d) AS BIGINT) AS e1,
         |  CAST(EXTRACT(WEEK FROM $d) AS BIGINT) AS e2,
         |  CAST(EXTRACT(QUARTER FROM $d) AS BIGINT) AS e3,
         |  CAST(make_date(EXTRACT(YEAR FROM $d), EXTRACT(MONTH FROM $d), EXTRACT(DAY FROM $d)) AS STRING) AS e4,
         |  CAST(CASE WHEN make_date(EXTRACT(YEAR FROM $d), EXTRACT(MONTH FROM $d), EXTRACT(DAY FROM $d)) = $d THEN 1 ELSE 0 END AS BIGINT) AS e5
         |FROM ${t.name}
         |WHERE ${predicate(r, t)}
         |${orderTail(t.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    case 2 => // grouped by a date_trunc bucket (week buckets cross year
      // boundaries — the ISO seam), min/max dates as strings
      val t = pick(r, Seq(lineitem, orders, events))
      val d = asDate(pick(r, t.dates))
      val unit = pick(r, Seq("week", "month", "quarter"))
      val ic = pick(r, t.ints).name
      s"""SELECT CAST(CAST(date_trunc('$unit', $d) AS DATE) AS STRING) AS g0,
         |  CAST(count(*) AS BIGINT) AS a0,
         |  CAST(min($d) AS STRING) AS a1,
         |  CAST(max($d) AS STRING) AS a2,
         |  CAST(sum($ic % 97) AS BIGINT) AS a3
         |FROM ${t.name}
         |WHERE ${predicate(r, t)}
         |GROUP BY date_trunc('$unit', $d)
         |ORDER BY g0 NULLS FIRST""".stripMargin
    case _ => // DST-free day math: chained ±DAY shifts compared against
      // a ±MONTH shift, with a shifted-date boundary filter
      val t = pick(r, Seq(lineitem, orders, events))
      val d = asDate(pick(r, t.dates))
      val a = 1 + r.nextInt(40); val b = 1 + r.nextInt(20)
      s"""SELECT ${t.key.mkString(", ")},
         |  CAST(CAST($d + INTERVAL '$a' DAY - INTERVAL '$b' DAY AS DATE) AS STRING) AS e1,
         |  CAST(CASE WHEN CAST($d + INTERVAL '${a - b}' DAY AS DATE) = CAST($d + INTERVAL '$a' DAY - INTERVAL '$b' DAY AS DATE) THEN 1 ELSE 0 END AS BIGINT) AS e2,
         |  CAST(CASE WHEN CAST($d + INTERVAL '30' DAY AS DATE) <= CAST($d + INTERVAL '1' MONTH AS DATE) THEN 1 ELSE 0 END AS BIGINT) AS e3
         |FROM ${t.name}
         |WHERE (CAST($d + INTERVAL '$b' DAY AS DATE) >= ${dateLit(r, t)}) AND (${predicate(r, t)})
         |${orderTail(t.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
  }

  /** Shape Q: multi-level set-op/window composition. */
  private def shapeCompose(r: Random): String = pick(r, Seq(0, 1, 2, 3)) match {
    case 0 => // EXCEPT/INTERSECT over a windowed subquery's top-N per
      // partition vs a plain predicate key set
      val t = pick(r, Seq(lineitem, orders, customer, events, documents))
      val partCol = pick(r, t.strs).name
      val keyList = t.key.mkString(", ")
      val k0 = t.key.head
      val op = pick(r, Seq("EXCEPT", "INTERSECT"))
      val topN = 5 + r.nextInt(20)
      s"""SELECT k FROM (
         |  SELECT $k0 AS k,
         |    row_number() OVER (PARTITION BY $partCol ORDER BY $keyList) AS rn
         |  FROM ${t.name} WHERE ${predicate(r, t)}) s1
         |WHERE rn <= $topN
         |$op
         |SELECT $k0 FROM ${t.name} WHERE ${predicate(r, t)}
         |ORDER BY k NULLS FIRST
         |LIMIT 500""".stripMargin
    case 1 => // INTERSECT/EXCEPT of two GROUPING-SETS results: groups
      // whose (keys incl. super-aggregate NULLs, exact count) agree or
      // differ between two predicate stacks — set ops match NULL keys
      val (t, g0, g1) = pick(r, rollupTables)
      val op = pick(r, Seq("INTERSECT", "EXCEPT"))
      val sets = pick(r, Seq(
        s"GROUPING SETS (($g0, $g1), ($g0), ())",
        s"ROLLUP($g0, $g1)"))
      def arm: String =
        s"""SELECT $g0, $g1, CAST(count(*) AS BIGINT) AS a0
           |  FROM ${t.name} WHERE ${predicate(r, t)}
           |  GROUP BY $sets""".stripMargin
      s"""SELECT * FROM ($arm) s1
         |$op
         |SELECT * FROM ($arm) s2
         |ORDER BY $g0 NULLS FIRST, $g1 NULLS FIRST, a0 NULLS FIRST""".stripMargin
    case 2 => // windows OVER a set-op result (the composition the
      // grammar never produced: analytic functions downstream of
      // UNION/INTERSECT/EXCEPT)
      val t = pick(r, singleTables)
      val k0 = t.key.head
      val op = pick(r, Seq("UNION", "INTERSECT", "EXCEPT"))
      s"""SELECT k,
         |  CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rn,
         |  CAST(sum(k % 97) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
         |FROM (
         |  SELECT $k0 AS k FROM ${t.name} WHERE ${predicate(r, t)}
         |  $op
         |  SELECT $k0 FROM ${t.name} WHERE ${predicate(r, t)}) u
         |ORDER BY k NULLS FIRST
         |LIMIT ${300 + r.nextInt(3) * 100}""".stripMargin
    case _ => // EXCEPT ALL / INTERSECT ALL on modulo-reduced MULTISETS
      // (bag semantics: the copy counts must subtract/min exactly)
      val t = pick(r, singleTables)
      val c = pick(r, t.ints).name
      val m = pick(r, Seq(50, 100, 250))
      val op = pick(r, Seq("EXCEPT ALL", "INTERSECT ALL"))
      s"""SELECT CAST($c % $m AS BIGINT) AS k FROM ${t.name} WHERE ${predicate(r, t)}
         |$op
         |SELECT CAST($c % $m AS BIGINT) FROM ${t.name} WHERE ${predicate(r, t)}
         |ORDER BY k NULLS FIRST
         |LIMIT 500""".stripMargin
  }

  // ---- round-15 grammar extension (shapes R-S) ---------------------------
  //
  // The two remaining untouched seams in the dialect-intersection
  // grammar (VERDICT r14 next-round #6): (R) correlated SCALAR
  // subqueries in the SELECT list + chained/self-referencing CTEs with
  // re-aggregation — shape I only ever produced EXISTS/NOT EXISTS
  // correlation and shape L a single linear CTE; (S) mixed-type
  // CASE/COALESCE lattices over LEFT-JOIN NULLs with pinned-scale
  // DECIMAL and DATE branches (type-coercion torture). Same
  // dialect-intersection rules as A-Q: scalar subqueries are
  // aggregated with equality correlation only (both engines
  // decorrelate those identically); count(*) over an empty correlated
  // group is 0 and sum/min are NULL in both engines (folded through
  // coalesce); every CASE/COALESCE branch is explicitly CAST so no
  // implicit coercion rule is ever exercised ACROSS engines — a
  // mixed-scale lattice is normalized by an outer CAST to a superset
  // scale (lossless — values are exact cents), then folded to BIGINT
  // via an integer-valued multiply, so no decimal rounding tie can
  // ever occur; DATE branches stay DATE end-to-end and exit through
  // the shape-K double cast to STRING.

  /** Shape R: correlated scalar subqueries + chained/self-joined CTEs. */
  private def shapeScalarSub(r: Random): String = pick(r, Seq(0, 1, 2, 3)) match {
    case 0 => // two correlated scalar aggregates in the SELECT list
      val (a, b, corr) = pick(r, existsEdges)
      val bi = pick(r, b.ints).name
      s"""SELECT ${a.key.mkString(", ")},
         |  (SELECT CAST(count(*) AS BIGINT) FROM ${b.name}
         |   WHERE $corr AND (${predicate(r, b)})) AS e1,
         |  (SELECT CAST(coalesce(sum($bi % 97), 0) AS BIGINT)
         |   FROM ${b.name} WHERE $corr) AS e2
         |FROM ${a.name}
         |WHERE (${predicate(r, a)})
         |${orderTail(a.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    case 1 => // chained CTEs: b re-aggregates a, the final SELECT joins
      // BOTH levels back together and aggregates once more
      val (fact, fk, _, _) = pick(r, cteEdges)
      val fi = pick(r, fact.ints).name
      val m = pick(r, Seq(5, 8, 10, 13))
      s"""WITH a AS (
         |  SELECT $fk AS k, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum($fi % 97) AS BIGINT) AS s
         |  FROM ${fact.name}
         |  WHERE (${predicate(r, fact)})
         |  GROUP BY $fk),
         |b AS (
         |  SELECT k % $m AS bucket, CAST(sum(n) AS BIGINT) AS tn,
         |    CAST(max(s) AS BIGINT) AS ms, CAST(count(*) AS BIGINT) AS nk
         |  FROM a GROUP BY k % $m)
         |SELECT b.bucket, CAST(min(a.n) AS BIGINT) AS e1,
         |  CAST(max(a.s) AS BIGINT) AS e2, CAST(max(b.tn) AS BIGINT) AS e3,
         |  CAST(max(b.nk) AS BIGINT) AS e4
         |FROM a JOIN b ON a.k % $m = b.bucket
         |GROUP BY b.bucket
         |ORDER BY bucket NULLS FIRST""".stripMargin
    case 2 => // correlated scalar aggregate in BOTH the WHERE gate and
      // the SELECT list
      val (a, b, corr) = pick(r, existsEdges)
      val bi = pick(r, b.ints).name
      val k = 1 + r.nextInt(3)
      s"""SELECT ${a.key.mkString(", ")},
         |  (SELECT CAST(coalesce(min($bi), -1) AS BIGINT)
         |   FROM ${b.name} WHERE $corr) AS e1
         |FROM ${a.name}
         |WHERE (SELECT count(*) FROM ${b.name}
         |    WHERE $corr AND (${predicate(r, b)})) >= $k
         |  AND (${predicate(r, a)})
         |${orderTail(a.key)}
         |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    case _ => // one CTE referenced TWICE (self-join on the group grid)
      val t = pick(r, singleTables)
      val g = pick(r, t.strs).name
      val ti = pick(r, t.ints).name
      s"""WITH a AS (
         |  SELECT $g AS g, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum($ti % 97) AS BIGINT) AS s
         |  FROM ${t.name}
         |  WHERE (${predicate(r, t)})
         |  GROUP BY $g)
         |SELECT x.g AS g1, y.g AS g2, CAST(x.n + y.n AS BIGINT) AS e1,
         |  CAST(abs(x.s - y.s) AS BIGINT) AS e2
         |FROM a AS x JOIN a AS y ON x.g < y.g
         |ORDER BY g1 NULLS FIRST, g2 NULLS FIRST""".stripMargin
  }

  /** LEFT-JOIN edges whose nullable side has ints + doubles + a date —
    * the coercion lattices need all three branch types. */
  private val coerceEdges = Seq(
    (customer, orders, "o_custkey = c_custkey"),
    (orders, lineitem, "l_orderkey = o_orderkey"),
    (part, lineitem, "l_partkey = p_partkey"),
    (supplier, lineitem, "l_suppkey = s_suppkey"))

  /** Shape S: mixed-type CASE/COALESCE lattices over LEFT-JOIN NULLs. */
  private def shapeCoerce(r: Random): String = {
    val (a, b, on) = pick(r, coerceEdges)
    val bk = b.key.head
    val bd = pick(r, b.dbls).name
    val bi = pick(r, b.ints).name
    val bdate = pick(r, b.dates)
    val keys = a.key ++ b.key
    pick(r, Seq(0, 1, 2, 3)) match {
      case 0 => // coalesce lattice: DECIMAL with a pinned fallback,
        // DATE with a literal fallback, string CASE, NULLIF chain
        val m = 2 + r.nextInt(9)
        s"""SELECT ${keys.mkString(", ")},
           |  CAST(CAST(coalesce(CAST($bd AS DECIMAL(18,2)), CAST(-1 AS DECIMAL(18,2))) AS DECIMAL(19,3)) * 1000 AS BIGINT) AS e1,
           |  CAST(coalesce(CAST(${bdate.name} AS DATE), ${dateLit(r, b)}) AS STRING) AS e2,
           |  CASE WHEN $bk IS NULL THEN 'none' WHEN (${atom(r, b)}) THEN 'hit' ELSE 'miss' END AS e3,
           |  CAST(coalesce(NULLIF($bi % $m, ${r.nextInt(m)}), -9) AS BIGINT) AS e4
           |FROM ${a.name} LEFT JOIN ${b.name} ON $on AND (${atom(r, b)})
           |WHERE (${predicate(r, a)})
           |${orderTail(keys)}
           |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
      case 1 => // mixed-SCALE decimal CASE (12,2 vs 15,3 branches),
        // normalized by the outer superset cast — lossless by scale
        s"""SELECT ${keys.mkString(", ")},
           |  CAST(CAST(CASE WHEN $bk IS NULL THEN CAST(-1 AS DECIMAL(12,2))
           |    WHEN (${atom(r, b)}) THEN CAST($bd AS DECIMAL(12,2))
           |    ELSE CAST($bd AS DECIMAL(15,3)) END AS DECIMAL(19,3)) * 1000 AS BIGINT) AS e1,
           |  CAST(greatest(coalesce(CAST($bi % 13 AS BIGINT), -1), CAST(${pick(r, a.ints).name} % 13 AS BIGINT)) AS BIGINT) AS e2
           |FROM ${a.name} LEFT JOIN ${b.name} ON $on
           |WHERE (${predicate(r, a)})
           |${orderTail(keys)}
           |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
      case 2 => // aggregated lattice: the NULL-padded branches fold
        // through exact-decimal sums and a sentinel-coalesced date min
        val (gx, gk) = groupKeys(r, a)
        s"""SELECT ${gx.mkString(", ")},
           |  CAST(count(*) AS BIGINT) AS a0,
           |  CAST(sum(CASE WHEN $bk IS NULL THEN 0 ELSE $bi % 97 END) AS BIGINT) AS a1,
           |  CAST(CAST(sum(coalesce(CAST($bd AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))) * 100 AS DECIMAL(38,0)) AS BIGINT) % 999983 AS a2,
           |  CAST(min(coalesce(CAST(${bdate.name} AS DATE), DATE '2099-12-31')) AS STRING) AS a3
           |FROM ${a.name} LEFT JOIN ${b.name} ON $on AND (${atom(r, b)})
           |WHERE (${predicate(r, a)})
           |GROUP BY ${gk.mkString(", ")}
           |${orderTail(gk)}""".stripMargin
      case _ => // nested CASE with DATE-arithmetic branches + an
        // EXTRACT/NULLIF chain over the nullable date
        val k = 1 + r.nextInt(30)
        val m = 1 + r.nextInt(12)
        s"""SELECT ${keys.mkString(", ")},
           |  CAST(CASE WHEN $bk IS NULL THEN DATE '1970-01-01'
           |    WHEN (${atom(r, b)}) THEN CAST(${bdate.name} AS DATE)
           |    ELSE CAST(CAST(${bdate.name} AS DATE) + INTERVAL '$k' DAY AS DATE) END AS STRING) AS e1,
           |  CAST(coalesce(NULLIF(CAST(EXTRACT(MONTH FROM ${bdate.name}) AS BIGINT), $m), -1) AS BIGINT) AS e2,
           |  CASE WHEN $bk IS NULL THEN '(none)' ELSE CAST(CAST($bi % 10 AS BIGINT) AS STRING) END AS e3
           |FROM ${a.name} LEFT JOIN ${b.name} ON $on
           |WHERE (${predicate(r, a)})
           |${orderTail(keys)}
           |LIMIT ${100 + r.nextInt(4) * 50}""".stripMargin
    }
  }

  // ---- registration -----------------------------------------------------

  /** Seeded query list. Indices 0-219 are the round-11 corpus across
    * shapes A-G (frozen byte-for-byte — the FuzzSpec digest pins them);
    * 220-399 are the round-12 extension across shapes H-M; 400-499 the
    * round-13 extension (N-O); 500-599 the round-14 extension (P-Q);
    * 600-699 the round-15 extension (R-S).
    * Seeds are a fixed affine family — append NEW seeds to grow the
    * list; never renumber (names carry the index, and CORRECTNESS
    * history reads better when fz042 stays fz042). */
  val qs: Seq[Q] = (0 until 220).map { i =>
    val r = new Random(0x5EEDL * 1000003L + i)
    val (tag, text) = (i % 11) match {
      case 0 | 1 | 2 => ("agg", shapeAgg(r))
      case 3 | 4 => ("proj", shapeProj(r))
      case 5 | 6 => ("join2", shapeJoin2(r))
      case 7 => ("join3", shapeJoin3(r))
      case 8 => ("win", shapeWindow(r))
      case 9 => ("setop", shapeSetOp(r))
      case _ => ("subq", shapeSubquery(r))
    }
    Q.sql(f"fz$i%03d_$tag", text)
  } ++ (220 until 400).map { i =>
    val r = new Random(0x5EEDL * 1000003L + i)
    val (tag, text) = (i % 9) match {
      case 0 | 1 => ("ljoin", shapeLeftJoin(r))
      case 2 | 3 => shapeExists(r)
      case 4 => ("rollup", shapeRollup(r))
      case 5 | 6 => ("expr", shapeExpr(r))
      case 7 => ("cte", shapeCte(r))
      case _ => ("win2", shapeWindow2(r))
    }
    Q.sql(f"fz$i%03d_$tag", text)
  } ++ (400 until 500).map { i =>
    val r = new Random(0x5EEDL * 1000003L + i)
    val (tag, text) =
      if (i % 2 == 0) ("tvl", shapeTvl(r)) else ("dec", shapeDec(r))
    Q.sql(f"fz$i%03d_$tag", text)
  } ++ (500 until 600).map { i =>
    val r = new Random(0x5EEDL * 1000003L + i)
    val (tag, text) =
      if (i % 2 == 0) ("time", shapeTime(r)) else ("comp", shapeCompose(r))
    Q.sql(f"fz$i%03d_$tag", text)
  } ++ (600 until 700).map { i =>
    val r = new Random(0x5EEDL * 1000003L + i)
    val (tag, text) =
      if (i % 2 == 0) ("csub", shapeScalarSub(r)) else ("coer", shapeCoerce(r))
    Q.sql(f"fz$i%03d_$tag", text)
  }
}
