package graft.engine

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.StringType

import graft.SparkSpecBase

/** Column-DECLARED collations (`a TEXT COLLATE NOCASE|RTRIM`,
  * datatype3.html §7.1), DIFFERENTIAL against the sandbox `sqlite3`
  * CLI: the same schema + script + query must answer identically on
  * both engines, covering comparisons (WHERE / IN / BETWEEN), ORDER
  * BY, GROUP BY, DISTINCT, min/max, explicit COLLATE overrides (rule
  * 1 beats the declared collation — including COLLATE BINARY, which
  * must NOT silently fall back to the column's NOCASE), UNIQUE/PK
  * conflict detection on the write path, and the `.sqlite` export
  * round trip (DDL re-renders the clause; index B-trees lay out in
  * collation order so real sqlite3's lookups and integrity_check
  * agree). The reference delegates all of this to libsqlite3
  * (trough/read.py:63-67, write.py:28-40). */
class CollationSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-coll").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"coll-$n"
    engine.schemas.put(s"coll-schema-$n", schema)
    engine.provisionWritable(id, s"coll-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("coll-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  private def render(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map { i =>
      if (r.isNullAt(i)) ""
      else r.get(i) match {
        case l: Long => l.toString
        case d: Double => d.toString
        case s: String => s
        case other => other.toString
      }
    }.mkString("|")

  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  /** Both sides must REFUSE the script; returns the engine's message. */
  private def bothFail(id: String, db: Path, script: String): String = {
    val e = intercept[Exception](engine.write(id, script))
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") != 0,
      s"sqlite3 accepted what the engine refused: $script\n(${e.getMessage})")
    e.getMessage
  }

  private val schema =
    "CREATE TABLE t (id INTEGER PRIMARY KEY, a TEXT COLLATE NOCASE, b TEXT);"
  private val fill =
    "INSERT INTO t VALUES (1,'abc','abc'), (2,'ABC','ABC'), (3,'AbC','AbC')," +
      " (4,'zzz','zzz'), (5,'Ärger','Ärger'), (6,'ärger','ärger'), (7,NULL,NULL);"

  test("DDL records and re-renders the collation; unknown names refused") {
    val td = SqliteDdl.parseCreateTable(
      "CREATE TABLE c (x TEXT COLLATE nocase, y TEXT COLLATE RTRIM, " +
        "z TEXT COLLATE BINARY, w TEXT)")
    def coll(name: String) = td.schema.fields
      .find(_.name == name).flatMap(SqliteDdl.collationOf)
    assert(coll("x").contains("NOCASE"))
    assert(coll("y").contains("RTRIM"))
    assert(coll("z").isEmpty) // BINARY is the default: not recorded
    assert(coll("w").isEmpty)
    val ddl = SqliteDdl.renderCreateTable("c", td.schema, Nil, None)
    assert(ddl.contains("\"x\" TEXT COLLATE NOCASE"))
    assert(ddl.contains("\"y\" TEXT COLLATE RTRIM"))
    assert(!ddl.contains("\"z\" TEXT COLLATE"))
    // sqlite3: Error: no such collation sequence: utf16
    val e = intercept[IllegalArgumentException](SqliteDdl.parseCreateTable(
      "CREATE TABLE c (x TEXT COLLATE utf16)"))
    assert(e.getMessage == "no such collation sequence: utf16")
    // a COLLATE inside a CHECK body or DEFAULT literal is NOT the
    // column's clause
    val td2 = SqliteDdl.parseCreateTable(
      "CREATE TABLE c (x TEXT DEFAULT 'COLLATE NOCASE' " +
        "CHECK (x <> 'q' COLLATE NOCASE))")
    assert(td2.schema.fields.flatMap(SqliteDdl.collationOf).isEmpty)
  }

  test("quoted collation names apply like bare ones (ADVICE r10)") {
    // SQLite accepts any identifier quoting (and a string literal)
    // for the collation name; each must behave as NOCASE, not
    // silently fall back to BINARY — differential per form
    Seq("\"NOCASE\"", "[nocase]", "`NoCase`", "'nocase'").foreach { q =>
      val s = s"CREATE TABLE t (id INTEGER PRIMARY KEY, a TEXT COLLATE $q);"
      val id = seg(s); val db = cliDb(s)
      runBoth(id, db, "INSERT INTO t VALUES (1,'abc'), (2,'ABC');")
      same(id, db, "SELECT id FROM t WHERE a = 'aBc' ORDER BY id;")
    }
    // a quoted UNKNOWN name still gets SQLite's refusal text
    val e = intercept[IllegalArgumentException](SqliteDdl.parseCreateTable(
      "CREATE TABLE c (x TEXT COLLATE \"utf16\")"))
    assert(e.getMessage == "no such collation sequence: utf16")
  }

  test("NOCASE column governs WHERE comparisons, ASCII-only like SQLite") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    same(id, db, "SELECT id FROM t WHERE a = 'ABC' ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE 'aBc' = a ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE a <> 'abc' ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE a < 'B' ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE a >= 'Z' ORDER BY id;")
    // the uncollated twin column stays BINARY
    same(id, db, "SELECT id FROM t WHERE b = 'ABC' ORDER BY id;")
    // non-ASCII case variants stay distinct (SQLite's NOCASE is
    // ASCII-only — Ärger ≠ ärger)
    same(id, db, "SELECT id FROM t WHERE a = 'ärger' ORDER BY id;")
    // IN and BETWEEN pick up the LHS column's collation
    same(id, db, "SELECT id FROM t WHERE a IN ('aBC', 'ZZZ') ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE a BETWEEN 'AB' AND 'AC' ORDER BY id;")
    // comparison in a VALUE position folds too (0/1 integers)
    same(id, db, "SELECT id, (a = 'abc') AS m FROM t ORDER BY id;")
  }

  test("IN-subquery membership follows the left operand's collation (VERDICT r10 #6)") {
    // lang_expr.html: "x IN (SELECT y ...)" uses x's collating
    // sequence — sqlite3-differential per shape
    val s = schema + " CREATE TABLE probe (p TEXT);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, fill +
      "INSERT INTO probe VALUES ('aBC'), ('ZZZ'), ('ärGER');")
    // NOCASE x: case variants in the subquery result all match
    same(id, db,
      "SELECT id FROM t WHERE a IN (SELECT p FROM probe) ORDER BY id;")
    same(id, db,
      "SELECT id FROM t WHERE a NOT IN (SELECT p FROM probe) ORDER BY id;")
    // BINARY x against the same subquery: only exact-case matches
    same(id, db,
      "SELECT id FROM t WHERE b IN (SELECT p FROM probe) ORDER BY id;")
    // explicit COLLATE on x overrides its declared collation (rule 1)
    same(id, db,
      "SELECT id FROM t WHERE a COLLATE BINARY IN (SELECT p FROM probe) ORDER BY id;")
    same(id, db,
      "SELECT id FROM t WHERE b COLLATE NOCASE IN (SELECT p FROM probe) ORDER BY id;")
    // correlated-free EXISTS shape unaffected; membership in a VALUE
    // position folds the same way (0/1 integers)
    same(id, db,
      "SELECT id, (a IN (SELECT p FROM probe)) AS m FROM t ORDER BY id;")
  }

  test("UNION / INTERSECT / EXCEPT compare under the LEFT column's collation (r11)") {
    // select.html: compound comparisons use the collation determined
    // for the LEFT select's column — all probed differentially
    val s = "CREATE TABLE a (x TEXT COLLATE NOCASE); CREATE TABLE b (y TEXT);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO a VALUES ('abc'), ('DEF'), ('ghi'), (NULL);" +
        "INSERT INTO b VALUES ('ABC'), ('def'), ('zzz'), (NULL);")
    // coalesce makes a NULL row visible (the CLI harness trims edge
    // blank lines); set-op membership is null-safe on both engines
    // (probed: SELECT NULL INTERSECT SELECT NULL answers a row)
    def compound(op: String, left: String, lc: String, right: String,
        rc: String): String =
      s"SELECT coalesce(v, '<null>') AS v FROM " +
        s"(SELECT $lc AS v FROM $left $op SELECT $rc FROM $right) ORDER BY 1;"
    same(id, db, compound("INTERSECT", "a", "x", "b", "y"))
    same(id, db, compound("EXCEPT", "a", "x", "b", "y"))
    // binary LEFT ignores the right side's declared collation
    same(id, db, compound("INTERSECT", "b", "y", "a", "x"))
    same(id, db, compound("EXCEPT", "b", "y", "a", "x"))
    // UNION dedups under the left collation (count it — the surviving
    // representative of a folded pair is arbitrary on both engines)
    same(id, db,
      "SELECT count(*) AS n FROM (SELECT x FROM a UNION SELECT y FROM b);")
    same(id, db,
      "SELECT count(*) AS n FROM (SELECT y FROM b UNION SELECT x FROM a);")
  }

  test("explicit COLLATE overrides the declared collation (rule 1)") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    // BINARY on a NOCASE column: only the exact-case row matches
    same(id, db, "SELECT id FROM t WHERE a = 'ABC' COLLATE BINARY ORDER BY id;")
    same(id, db, "SELECT id FROM t WHERE a COLLATE BINARY = 'ABC' ORDER BY id;")
    // NOCASE on the binary column: all case variants match
    same(id, db, "SELECT id FROM t WHERE b = 'ABC' COLLATE NOCASE ORDER BY id;")
    same(id, db, "SELECT count(*) AS n FROM t WHERE a = 'abc' COLLATE BINARY;")
  }

  test("ORDER BY / GROUP BY / DISTINCT / min-max under the column collation") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    // deterministic ORDER BY: collation-equal keys tie-broken by id
    same(id, db, "SELECT id FROM t ORDER BY a, id;")
    same(id, db, "SELECT id FROM t ORDER BY a DESC, id;")
    // GROUP BY folds case classes; counts are representative-free
    same(id, db,
      "SELECT count(*) AS n FROM t WHERE a IS NOT NULL GROUP BY a ORDER BY n, count(*);")
    same(id, db, "SELECT count(DISTINCT a) AS n FROM t;")
    // DISTINCT keeps one row per class (count it, not the arbitrary
    // representative)
    same(id, db, "SELECT count(*) AS n FROM (SELECT DISTINCT a FROM t);")
    // min/max COMPARE folded but ANSWER a stored value: with ties the
    // representative is arbitrary on both engines, so probe via a
    // tie-free subset
    same(id, db, "SELECT min(a) AS lo, max(a) AS hi FROM t WHERE id IN (1, 4, 5);")
    // GROUP BY representative + aggregate over another column
    same(id, db,
      "SELECT sum(id) AS s FROM t WHERE a IS NOT NULL GROUP BY a ORDER BY s;")
    // HAVING over the folded groups
    same(id, db,
      "SELECT count(*) AS n FROM t GROUP BY a HAVING count(*) > 1 ORDER BY n;")
  }

  test("RTRIM column: trailing spaces ignored in compares, kept in values") {
    val s = "CREATE TABLE r (id INTEGER PRIMARY KEY, v TEXT COLLATE RTRIM);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO r VALUES (1,'x'), (2,'x  '), (3,' x'), (4,'y'), (5,'');")
    same(id, db, "SELECT id FROM r WHERE v = 'x' ORDER BY id;")
    same(id, db, "SELECT id FROM r WHERE v = 'x   ' ORDER BY id;")
    same(id, db, "SELECT id FROM r WHERE v = '  ' ORDER BY id;") // matches ''
    same(id, db, "SELECT id FROM r ORDER BY v, id;")
    same(id, db, "SELECT count(DISTINCT v) AS n FROM r;")
    same(id, db, "SELECT id, length(v) AS len FROM r ORDER BY id;") // values intact
  }

  test("UNIQUE on a NOCASE column: case variants conflict on both engines") {
    val s = "CREATE TABLE u (id INTEGER PRIMARY KEY, k TEXT COLLATE NOCASE UNIQUE);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO u VALUES (1, 'abc');")
    // sqlite3: UNIQUE constraint failed: u.k
    val msg = bothFail(id, db, "INSERT INTO u VALUES (2, 'ABC');")
    assert(msg.contains("UNIQUE constraint failed: u.k"))
    // batch-internal conflict too
    val msg2 = bothFail(id, db, "INSERT INTO u VALUES (3, 'Qq'), (4, 'qQ');")
    assert(msg2.contains("UNIQUE constraint failed: u.k"))
    // OR IGNORE keeps the first arrival; OR REPLACE the last
    runBoth(id, db, "INSERT OR IGNORE INTO u VALUES (5, 'aBc'), (6, 'new');")
    same(id, db, "SELECT id, k FROM u ORDER BY id;")
    runBoth(id, db, "INSERT OR REPLACE INTO u VALUES (7, 'ABC');")
    same(id, db, "SELECT id, k FROM u ORDER BY id;")
    // exact-case distinct values still insert fine
    runBoth(id, db, "INSERT INTO u VALUES (8, 'zz'), (9, 'z z');")
    same(id, db, "SELECT id, k FROM u ORDER BY id;")
  }

  test("TEXT PRIMARY KEY with NOCASE: conflict detection and upsert target") {
    val s = "CREATE TABLE p (k TEXT COLLATE NOCASE PRIMARY KEY, v INTEGER);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, "INSERT INTO p VALUES ('Key', 1);")
    val msg = bothFail(id, db, "INSERT INTO p VALUES ('KEY', 2);")
    assert(msg.contains("UNIQUE constraint failed: p.k"))
    // upsert diverts on the collation-aware conflict
    runBoth(id, db,
      "INSERT INTO p VALUES ('kEy', 10) ON CONFLICT (k) DO UPDATE SET v = v + excluded.v;")
    same(id, db, "SELECT k, v FROM p ORDER BY k;")
    runBoth(id, db, "INSERT INTO p VALUES ('other', 5) ON CONFLICT (k) DO NOTHING;")
    runBoth(id, db, "INSERT INTO p VALUES ('OTHER', 9) ON CONFLICT (k) DO NOTHING;")
    same(id, db, "SELECT k, v FROM p ORDER BY k;")
  }

  test("UPDATE and DELETE WHERE use the declared collation") {
    val id = seg(schema); val db = cliDb(schema)
    runBoth(id, db, fill)
    runBoth(id, db, "UPDATE t SET b = 'hit' WHERE a = 'ABC';")
    same(id, db, "SELECT id, b FROM t ORDER BY id;")
    // ASCII-only fold: 'äRGER' folds to 'ärger' (ä untouched) — hits
    // row 6 only, never 5 ('Ärger')
    runBoth(id, db, "DELETE FROM t WHERE a = 'äRGER';")
    same(id, db, "SELECT id FROM t ORDER BY id;")
    runBoth(id, db, "DELETE FROM t WHERE a = 'ZZZ';")
    same(id, db, "SELECT id FROM t ORDER BY id;")
  }

  test("export: DDL keeps the clause, trees search correctly, integrity_check ok") {
    val s = "CREATE TABLE e (id INTEGER PRIMARY KEY, k TEXT COLLATE NOCASE UNIQUE, v TEXT);\n" +
      "CREATE INDEX e_k ON e (v);"
    val id = seg(s)
    engine.write(id,
      "INSERT INTO e VALUES (1,'Delta','d'), (2,'alpha','a'), (3,'CHARLIE','c')," +
        " (4,'bravo','b'), (5,'Echo','e');")
    val out = Files.createTempDirectory("coll-exp").resolve("e.sqlite")
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    // the exported catalog carries the collation clause
    val ddl = SqliteCli.query(out.toString,
      "SELECT sql FROM sqlite_master WHERE name = 'e';")
    assert(ddl.contains("COLLATE NOCASE"), ddl)
    // real sqlite3 must be able to USE the unique index for a
    // case-insensitive point lookup (a binary-ordered tree would miss)
    assert(SqliteCli.query(out.toString,
      "SELECT id FROM e WHERE k = 'delta';") == "1")
    assert(SqliteCli.query(out.toString,
      "SELECT id FROM e WHERE k = 'ALPHA';") == "2")
    assert(SqliteCli.query(out.toString,
      "SELECT id FROM e WHERE k = 'charlie';") == "3")
    // collation-ordered range scan over the index
    assert(SqliteCli.query(out.toString,
      "SELECT id FROM e WHERE k < 'c' ORDER BY k;") == "2\n4")
    // uniqueness still enforced by real sqlite3 on the exported file
    assert(SqliteCli.run(out.toString, "INSERT INTO e VALUES (9,'DELTA','x');") != 0)
    // and the round trip back into the engine keeps the collation
    val back = s"${id}-back"
    store.ingestSqliteSegment(out.toString, back)
    val meta = store.tableMeta(back, "e")
    assert(meta.schema.fields.find(_.name == "k")
      .flatMap(SqliteDdl.collationOf).contains("NOCASE"))
    assert(engine.read(back, "SELECT id FROM e WHERE k = 'echo';")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("cross-table comparison: left column's collation wins (rule 2 precedence)") {
    val s = "CREATE TABLE l (x TEXT COLLATE NOCASE);\nCREATE TABLE rr (y TEXT);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO l VALUES ('AA'), ('bb'); INSERT INTO rr VALUES ('aa'), ('BB');")
    // x's NOCASE governs x = y; join matches case-insensitively
    same(id, db,
      "SELECT l.x, rr.y FROM l, rr WHERE x = y ORDER BY x, y;")
    // y = x: y has no collation, so the RIGHT operand's (x) applies
    same(id, db,
      "SELECT l.x, rr.y FROM l, rr WHERE y = x ORDER BY x, y;")
  }

  test("collation survives a view over the table") {
    val s = schema + "\nCREATE VIEW va AS SELECT id, a AS av FROM t;"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db, fill)
    same(id, db, "SELECT id FROM va WHERE av = 'ABC' ORDER BY id;")
    same(id, db, "SELECT count(DISTINCT av) AS n FROM va;")
  }

  test("loadTable exposes the collation as attribute metadata") {
    val id = seg(schema)
    engine.write(id, "INSERT INTO t VALUES (1, 'x', 'x');")
    val df = store.loadTable(id, "t")
    val f = df.schema.fields.find(_.name == "a").get
    assert(f.dataType == StringType)
    assert(SqliteDdl.collationOf(f).contains("NOCASE"))
    assert(df.schema.fields.find(_.name == "b")
      .flatMap(SqliteDdl.collationOf).isEmpty)
  }
}
