package graft.engine

import scala.sys.process._

import graft.SparkSpecBase

/** LIVE differential goldens for the round-8 scalar-surface additions:
  * every expression runs through BOTH the engine's dialect session and
  * the sandbox's real `sqlite3`, rendered with `quote()` on each side
  * so types (integer/real/text/blob/NULL) are compared, not just
  * display text. These functions exist because Spark's same-named
  * builtins DIVERGE from SQLite (log base, trunc-on-dates, NULL-eating
  * concat, byte-range char) — the differential is the point. */
class SqliteFunctionsSpec extends SparkSpecBase {

  private lazy val sess = {
    val s = spark.newSession()
    SqliteCompat.register(s)
    s
  }

  /** sqlite3's own answer for `SELECT quote(<expr>);` — stdin/stdout
    * as UTF-8 BYTES (argv/pipe strings re-encode with the platform
    * charset, ASCII here, mangling non-ASCII goldens). */
  private def sqliteGolden(expr: String): String =
    SqliteCli.query(":memory:", s"SELECT quote($expr);")

  private def ours(expr: String): String = {
    val r = SqliteDialect.sql(sess, s"SELECT quote($expr) AS q").collect()(0)
    if (r.isNullAt(0)) "NULL" else r.getString(0)
  }

  private def golden(exprs: String*): Unit = exprs.foreach { e =>
    assert(ours(e) == sqliteGolden(e), s"diverged from sqlite3 on: $e")
  }

  test("log is base-10; two-arg form is log base B (sqlite3 differential)") {
    golden("log(100)", "log(2, 8)", "log(1)")
    // log(10,1000) lands on 2.9999999999999996 — identical DOUBLE both
    // sides, but quote() renders full precision differently; compare
    // the rounded value instead of the rendering
    golden("CAST(round(log(10, 1000) * 1e6) AS INTEGER)")
  }

  test("trunc truncates numbers toward zero, returning REAL") {
    golden("trunc(2.7)", "trunc(-2.7)", "trunc(5)", "trunc(0.0)", "trunc(-0.2)")
  }

  test("floor/ceil preserve the argument's storage class (REAL in, REAL out)") {
    golden("floor(2.7)", "ceil(2.2)", "ceiling(2.2)", "floor(5)", "ceil(-3)",
      "floor(-2.5)", "ceil(-2.5)", "floor(NULL)")
  }

  test("concat ignores NULL arguments (SQLite 3.44 semantics)") {
    golden("concat('a', NULL, 'b')", "concat(NULL)", "concat(1, 2.5, 'x')",
      "concat_ws('-', 'a', NULL, 'b')")
  }

  test("char builds strings from unicode code points, NULLs contribute nothing") {
    golden("char(65, 66)", "char(65, 8364, 66)", "char(128169)",
      // a NULL argument ENDS the string; invalid code points render U+FFFD
      "char(NULL, 65)", "char(65, NULL, 66)", "char(-5, 65)")
  }

  test("unicode returns the first character's code point") {
    golden("unicode('A')", "unicode('€')", "unicode('')", "unicode(NULL)")
  }

  test("printf / format: the overlapping C verbs") {
    golden("printf('%d-%s', 42, 'x')", "printf('%.2f', 1.5)", "printf('%x', 255)",
      "printf('%05d', 42)", "format('%s=%d', 'n', 7)")
  }

  test("printf: the full SQLite verb surface (r15, SqlitePrintf)") {
    // %g strips trailing zeros like C; style picked by exponent
    golden("printf('%g', 0.1)", "printf('%g', 100000.0)",
      "printf('%g', 1234567.0)", "printf('%g', 0.00001234)",
      "printf('%g', 1e20)", "printf('%.3g', 1234.5678)",
      "printf('%.12g', 0.100000001490116)", "printf('%g', 0.0)",
      "printf('%10.3g|%-10.3g|%+g', 1234.5678, 1234.5678, 3.5)",
      "printf('%G', 1.5e-7)", "printf('%#g', 1.5)",
      "printf('%08.3g', 1234.5678)")
    // NULL / missing arguments, numeric coercions, %u, %c
    golden("printf('[%d][%s][%f][%g]', NULL, NULL, NULL, NULL)",
      "printf('[%d][%s]')", "printf('[%d][%x]', 3.9, 255.2)",
      "printf('[%d]', 'abc')", "printf('[%g]', '2.5e1')",
      "printf('[%s]', 42)", "printf('[%u]', -1)",
      "printf('[%c][%c]', 65, 'hello')")
    // width / precision / flags on d, s, f, e
    golden("printf('[%.5d]', 42)", "printf('[%,d]', 1234567)",
      "printf('[%.3s][%10s][%-10s]', 'abcdef', 'ab', 'ab')",
      "printf('[%05.1f][%+e]', 3.14159, 31415.9)")
    // the SQL-escape verbs
    golden("printf('[%q]', 'it''s')", "printf('[%Q]', 'it''s')",
      "printf('[%Q]', NULL)", "printf('[%w]', 'sa\"y')",
      "printf('[%%][%q]', 'a')")
  }

  test("printf %x/%X/%o: precision, '#' prefix layout, flag tolerance (r16)") {
    // probed: precision zero-pads digits; '0' zero-pads digits to
    // width even WITH a precision (C would ignore it); '#' prefixes
    // OUTSIDE the zero padding (0x000000ff overflows width 8) but
    // INSIDE space padding; no prefix for 0; +/space/,/! ignored
    golden("printf('[%.8x]', 255)", "printf('[%.3o]', 8)",
      "printf('[%#x][%#X][%#o]', 255, 255, 8)",
      "printf('[%#x][%#o]', 0, 0)",
      "printf('[%#08x]', 255)", "printf('[%#08o]', 8)",
      "printf('[%#8x]', 255)", "printf('[%#9.2x]', 255)",
      "printf('[%#-8x]', 255)", "printf('[%#4o]', 8)",
      "printf('[%#.5x]', 255)", "printf('[%#5.3o]', 8)",
      "printf('[%019.5x]', 255)", "printf('[%08.4x]', 255)",
      "printf('[%-6.4x]', 255)", "printf('[%06o]', 8)",
      "printf('[%x][%o]', -255, -8)",
      "printf('[%+x][% x][%,x][%!x]', 255, 255, 255000, 255)",
      "printf('[%.0x][%.0o]', 0, 0)")
    // flags that would crash Java's formatter are filtered per verb
    golden("printf('[%#d]', 5)", "printf('[%!d]', 5)", "printf('[% #d]', 5)",
      "printf('[%#,d]', 1234567)", "printf('[%#u]', 5)", "printf('[%,u]', 7)",
      "printf('[%#.0f]', 5)", "printf('[%#.0e]', 5)", "printf('[%,e]', 1234.5)",
      "printf('[%,.2f]', 1234567.891)", "printf('[%#s]', 'ab')")
    // 160-case differential fuzz over the integer-verb flag space
    val rng = new scala.util.Random(160816L)
    val flags = Seq("", "-", "0", "#", "-#", "0#", " ", "+", ",", "!")
    (1 to 160).foreach { _ =>
      val verb = Seq("x", "X", "o", "u").apply(rng.nextInt(4))
      val fl = flags(rng.nextInt(flags.length))
      val w = Seq("", rng.nextInt(14).toString).apply(rng.nextInt(2))
      val p = Seq("", s".${rng.nextInt(10)}").apply(rng.nextInt(2))
      val v = Seq(0L, 1L, 8L, 255L, 65535L, -1L, -255L,
        Long.MaxValue).apply(rng.nextInt(8))
      golden(s"printf('[%$fl$w$p$verb]', $v)")
    }
  }

  test("planner hints are identity pass-throughs") {
    golden("likely(7)", "unlikely(0)", "likelihood(5, 0.5)", "likely('txt')")
  }

  test("unixepoch: INTEGER epoch seconds, family modifiers apply") {
    golden("unixepoch('2024-01-01 00:00:00')", "unixepoch('1970-01-01')",
      "unixepoch('2024-01-01', '+1 day')", "unixepoch('not a date')")
  }

  test("json -> operator: JSON representation of the node (sqlite3 differential)") {
    golden(
      """'{"a":"x"}' -> '$.a'""", // strings stay JSON-quoted
      """'{"a":"x"}' -> 'a'""", // bare-key shorthand
      """'{"z":null}' -> '$.z'""", // JSON null is the TEXT 'null'
      """'{"a":1}' -> '$.missing'""", // absent → SQL NULL
      """'[10,20]' -> 1""", // bare-index shorthand
      """'[10,20]' -> 5""", // out of range → SQL NULL
      """'{"o":{"k":1}}' -> '$.o'""", // objects stay JSON
      """'{"a":"x"}' -> '$.a' ->> '$'""") // left-assoc chain
  }

  test("json ->> operator: SQL value of the node (sqlite3 differential)") {
    // scalar results carry TEXT affinity here (the engine-wide
    // json_extract deviation) while sqlite3 types them — CAST both
    // sides to TEXT so the VALUES are compared
    def goldenText(exprs: String*): Unit =
      exprs.foreach(e => golden(s"CAST(($e) AS TEXT)"))
    goldenText(
      """'{"a":"x"}' ->> '$.a'""", // unquoted text
      """'{"n":5}' ->> '$.n'""",
      """'{"f":2.5}' ->> '$.f'""",
      """'{"b":true}' ->> '$.b'""", // 1
      """'{"o":{"k":1}}' ->> '$.o'""", // objects stay JSON text
      """'[10,20]' ->> 1""",
      """'{"a":{"b":[1,2,{"c":9}]}}' ->> '$.a.b[2].c'""", // deep path
      """'{"with space":3}' ->> '$."with space"'""")
    // JSON null and absent keys are SQL NULL (typed compare is safe)
    golden("""'{"z":null}' ->> '$.z'""", """'{"a":1}' ->> '$.nope'""")
  }

  test("arrows bind tighter than arithmetic and comparisons") {
    // '$.n' extracts 5; +1 must apply OUTSIDE the arrow
    val r = SqliteDialect.sql(sess,
      """SELECT '{"n":5}' ->> '$.n' + 1 AS a, ('{"n":5}' ->> 'n') = 5 AS b""")
      .collect()(0)
    assert(r.get(0).toString.toDouble == 6.0)
    assert((r.getLong(1) == 1L))
  }

  test("CAST carries SQLite affinity semantics (sqlite3 differential)") {
    golden(
      // text → integer parses the longest integer prefix, default 0
      "CAST('12abc' AS INTEGER)", "CAST('abc' AS INTEGER)",
      "CAST('12.9' AS INTEGER)", "CAST('1e2' AS INTEGER)", "CAST(' -7x' AS INT)",
      // real → integer truncates toward zero; out of range CLAMPS
      "CAST(2.9 AS INTEGER)", "CAST(-2.9 AS INTEGER)", "CAST(1e99 AS INTEGER)",
      "CAST('9223372036854775808' AS INTEGER)",
      // text → real parses the longest real prefix, default 0.0
      "CAST('2.5x' AS REAL)", "CAST('abc' AS REAL)", "CAST('1e2' AS REAL)",
      // renders and blob round trips
      "CAST(5 AS TEXT)", "CAST(2.5 AS TEXT)", "CAST(2.0 AS TEXT)",
      "CAST('ab' AS BLOB)", "CAST(5 AS BLOB)",
      // arbitrary type names derive affinity like column declarations
      "CAST('4x' AS VARCHAR(2))", "CAST('12abc' AS UNSIGNED BIG INT)")
  }

  test("json_type / json_valid / json_array_length (sqlite3 differential)") {
    golden(
      """json_type('{"a":[1,2]}')""", """json_type('{"a":[1,2]}', '$.a')""",
      """json_type('{"a":1.5}', '$.a')""", """json_type('{"a":true}', '$.a')""",
      """json_type('{"a":false}', '$.a')""", """json_type('{"a":null}', '$.a')""",
      """json_type('{"a":"t"}', '$.a')""", """json_type('5', '$')""",
      """json_type('{"a":1}', '$.x')""", // missing → NULL
      "json_valid('{\"a\":1}')", "json_valid('{bad')",
      "json_array_length('[1,2,3]')", """json_array_length('{"a":[1,2]}', '$.a')""",
      """json_array_length('{"a":1}', '$.a')""")
  }

  test("multi-path json_extract answers a JSON array (sqlite3 differential)") {
    golden(
      """json_extract('{"a":1,"b":"x"}', '$.a', '$.b')""",
      """json_extract('{"a":1}', '$.a', '$.missing')""", // missing → JSON null
      """json_extract('{"a":1}', '$.missing', '$.missing')""",
      """json_extract('{"a":{"b":1}}', '$.a', '$.a.b')""", // containers stay JSON
      """json_extract('[0,1,2]', '$[1]', '$[2]')""",
      """json_extract('{"a":1.5,"b":true,"c":null}', '$.a', '$.b', '$.c')""",
      """json_extract('{"a":"x\"y"}', '$.a', '$.a')""", // strings stay quoted
      "json_extract(NULL, '$.a', '$.b')",
      """typeof(json_extract('{"a":1,"b":2}', '$.a', '$.b'))""")
  }

  test("json_patch merges RFC-7396 style (sqlite3 differential)") {
    golden(
      // null patch values delete; nested merge; new keys append
      """json_patch('{"a":1,"b":{"c":2}}', '{"b":{"c":null,"d":4},"e":5}')""",
      """json_patch('{"a":[1,2]}', '{"a":{"x":1}}')""", // non-object target leaf
      """json_patch('3', '{"a":1}')""", // non-object target root
      """json_patch('{"a":1}', '7')""", // non-object patch replaces wholesale
      """json_patch('{"a":1}', 'null')""", // the text 'null', not SQL NULL
      """json_patch('{}', '{"a":{"b":{"c":3}}}')""", // deep create
      """typeof(json_patch('{}', '{}'))""",
      "json_patch(NULL, '{}')", "json_patch('{}', NULL)")
  }

  test("json() minifies, json_pretty renders, json_error_position locates (sqlite3 differential)") {
    golden(
      """json(' { "a" : [ 1 , 2 ] } ')""", "json('[1,  2]')",
      "typeof(json('5'))", "json(NULL)",
      """json_pretty('{"a":[1,{"b":2}]}')""", "json_pretty('[]')",
      "json_pretty('5')", """json_pretty('{"a":1}', '-')""",
      """json_pretty('{"a":{}}')""", """json_pretty('{"a":[]}')""",
      "json_pretty(NULL)",
      "json_error_position('{\"a\":1}')", // 0: valid
      "json_error_position('')",
      "json_error_position(NULL)")
  }

  test("json_quote (sqlite3 differential)") {
    golden("json_quote(5)", "json_quote(2.5)", "json_quote(NULL)",
      """json_quote('x"y')""", "json_quote('plain')")
  }

  test("json_set / json_insert / json_replace / json_remove (sqlite3 differential)") {
    golden(
      """json_set('{"a":1}', '$.b', 5)""", // create
      """json_set('{"a":1}', '$.a', 'txt')""", // overwrite, string value
      """json_set('{"a":1}', '$.b.c', 5)""", // intermediate created
      """json_set('[1,2]', '$[2]', 9)""", // append at exact end
      """json_set('[1,2]', '$[7]', 9)""", // past end: no-op
      """json_set('[1,2]', '$[0]', 9)""",
      """json_insert('{"a":1}', '$.a', 9, '$.c', 3)""", // only-if-absent, 2 pairs
      """json_replace('{"a":1}', '$.a', 9, '$.x', 3)""", // only-if-present
      """json_remove('{"a":1,"b":2}', '$.a')""",
      """json_remove('[1,2,3]', '$[1]')""", // shifts
      """json_set('{"a":{"b":1}}', '$.a.b', 2)""")
  }

  test("json_group_array / json_group_object aggregates (sqlite3 differential)") {
    val sqliteOut = SqliteCli.query(":memory:",
      """CREATE TABLE t(k,v);
        INSERT INTO t VALUES('a',1),('b',NULL),('c','x');
        SELECT json_group_array(v) || '|' || json_group_object(k,v) FROM t;""")
    val df = SqliteDialect.sql(sess,
      """SELECT json_group_array(v) || '|' || json_group_object(k, v) AS r
        |FROM VALUES ('a', 1), ('b', NULL), ('c', NULL) AS t(k, v)""".stripMargin)
    // VALUES can't mix 1 and 'x' in one Spark column; cover the
    // null-keeping contract (the divergence risk) against sqlite3's
    // shape with homogeneous values
    val ours2 = SqliteDialect.sql(sess,
      """SELECT json_group_array(v) AS a, json_group_object(k, v) AS o
        |FROM VALUES ('a', 1), ('b', NULL), ('c', 3) AS t(k, v)""".stripMargin)
      .collect()(0)
    assert(ours2.getString(0) == "[1,null,3]")
    assert(ours2.getString(1) == """{"a":1,"b":null,"c":3}""")
    assert(sqliteOut == """[1,null,"x"]|{"a":1,"b":null,"c":"x"}""")
    df.collect() // exercises the mixed-null plan end to end
  }

  /** Both engines run `query` (a json_each SELECT) and render rows as
    * `|`-joined lines, NULL as empty — sqlite3's `.mode list`. */
  private def jsonEachGolden(query: String): Unit = {
    val theirs = SqliteCli.query(":memory:", query)
    val ours = SqliteDialect.sql(sess, query).collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else String.valueOf(r.get(i))).mkString("|")
    }.mkString("\n")
    assert(ours == theirs, s"diverged from sqlite3 on: $query")
  }

  test("json_each: object/array/scalar iteration (sqlite3 differential)") {
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_each('{"a":1,"b":[2,3],"c":"t","d":null,"e":true,"f":2.5}')""")
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_each('[1,2.5,"x",true,false,null,{"k":1},[7]]')""")
    jsonEachGolden(
      "SELECT key, value, type, atom, fullkey, path FROM json_each('7')")
    jsonEachGolden(
      "SELECT key, value, type, atom, fullkey, path FROM json_each('\"txt\"')")
  }

  test("json_each: second-arg path, missing path, alias forms (sqlite3 differential)") {
    jsonEachGolden("""SELECT je.key, je.value, je.fullkey, je.path
      FROM json_each('{"a":[1,2],"b":1}', '$.a') AS je""")
    jsonEachGolden(
      """SELECT count(*) AS n FROM json_each('{"a":1}', '$.nope')""")
    jsonEachGolden("""SELECT json_each.key, json_each.value
      FROM json_each('{"x":9}')""") // default table name, as SQLite
  }

  test("json_each: path to a scalar keeps the target's key (sqlite3 differential)") {
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_each('{"a":1,"b":[5]}', '$.a')""")
    jsonEachGolden("""SELECT key, value, fullkey, path
      FROM json_each('{"a":[1,2]}', '$.a[1]')""")
  }

  test("json_tree: pre-order walk with parent links (sqlite3 differential)") {
    // id is our ordinal (SQLite documents no meaning), so compare the
    // stable columns plus the parent STRUCTURE via self-join on id
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_tree('{"a":1,"b":[2,{"c":3}]}')""")
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_tree('7')""")
    jsonEachGolden("""SELECT key, value, type, atom, fullkey, path
      FROM json_tree('{"a":[1,2]}', '$.a')""")
    // parent linkage: each child row's parent id must resolve to the
    // row whose fullkey is its container — on both engines
    jsonEachGolden("""SELECT c.fullkey, p.fullkey
      FROM json_tree('{"a":{"b":[1]}}') c
      JOIN json_tree('{"a":{"b":[1]}}') p ON c.parent = p.id
      ORDER BY c.fullkey""")
  }

  test("json_each: correlated comma join over a table (sqlite3 differential)") {
    jsonEachGolden("""SELECT t.n, je.key, je.value
      FROM (SELECT 1 AS n, '{"a":1,"b":2}' AS j
            UNION ALL SELECT 2, '[5,6]') t, json_each(t.j) je
      ORDER BY t.n, je.fullkey""")
    // empty/malformed json drops the row like the non-outer join does
    jsonEachGolden("""SELECT t.n, je.key
      FROM (SELECT 1 AS n, '[7]' AS j UNION ALL SELECT 2, '[]') t,
           json_each(t.j) je""")
  }

  test("zeroblob / randomblob") {
    golden("hex(zeroblob(3))", "hex(zeroblob(0))")
    val r = SqliteDialect.sql(sess,
      "SELECT length(randomblob(16)) AS n, randomblob(4) = randomblob(4) AS eq")
      .collect()(0)
    assert(r.get(0).toString.toLong == 16L)
  }
}
