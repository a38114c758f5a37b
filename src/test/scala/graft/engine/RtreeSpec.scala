package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** SQLite `rtree` / `rtree_i32` virtual tables (r15, Rtree.scala),
  * DIFFERENTIAL against the sandbox sqlite3: the same CREATE VIRTUAL
  * TABLE + DML + range queries must answer identically — float32
  * OUTWARD coordinate rounding (min toward −∞, max toward +∞), int32
  * truncation for rtree_i32, the module's min≤max and unique-id
  * constraints with its probed error texts, UPDATE/DELETE, and module
  * arity errors. The reference reaches rtree only through libsqlite3
  * (trough/write.py:40) — the same delegation as fts5. */
class RtreeSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-rtree").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)

  private var n = 0
  private def seg(schema: String): String = {
    n += 1
    val id = s"rt-$n"
    engine.schemas.put(s"rt-schema-$n", schema)
    engine.provisionWritable(id, s"rt-schema-$n")
    id
  }

  private def cliDb(schema: String): Path = {
    val db = Files.createTempFile("rtree-cli", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString, schema) == 0)
    db
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  private def same(id: String, db: Path, select: String): Unit = {
    val engineSide = engine.read(id, select).collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
    }.mkString("\n")
    val cliSide = SqliteCli.query(db.toString, select)
    assert(engineSide == cliSide,
      s"\n-- engine --\n$engineSide\n-- sqlite3 --\n$cliSide\n-- for --\n$select")
  }

  private val schema2d =
    "CREATE VIRTUAL TABLE idx USING rtree(id, minX, maxX, minY, maxY);"

  test("float32 outward rounding and range queries match real rtree") {
    val id = seg(schema2d); val db = cliDb(schema2d)
    runBoth(id, db,
      "INSERT INTO idx VALUES (1, 1.1, 2.2, 3.3, 4.4);\n" +
        "INSERT INTO idx VALUES (2, -0.1, 0.1, -1e9, 1e9);\n" +
        "INSERT INTO idx(id, minX, maxX, minY, maxY) " +
        "VALUES (3, 0.1000000001, 0.1000000002, 0, 0);")
    // printf pins the float32-coerced doubles digit for digit
    same(id, db, "SELECT id, printf('%.12e|%.12e|%.12e|%.12e', " +
      "minX, maxX, minY, maxY) FROM idx ORDER BY id;")
    same(id, db, "SELECT id FROM idx WHERE minX <= 1.5 AND maxX >= 1.5 " +
      "ORDER BY id;")
    same(id, db, "SELECT id FROM idx WHERE minY <= 0 AND maxY >= 0 " +
      "ORDER BY id;")
    // boxes only touch at the coerced float32 bound
    same(id, db, "SELECT id FROM idx WHERE maxX >= 0.1 ORDER BY id;")
  }

  test("UPDATE/DELETE re-coerce; constraints raise the probed texts") {
    val id = seg(schema2d); val db = cliDb(schema2d)
    runBoth(id, db, "INSERT INTO idx VALUES (1, 0, 1, 0, 1), " +
      "(2, 5, 6, 5, 6);")
    runBoth(id, db, "UPDATE idx SET maxX = 9.9 WHERE id = 1;")
    runBoth(id, db, "DELETE FROM idx WHERE id = 2;")
    same(id, db, "SELECT id, printf('%.12e', maxX) FROM idx ORDER BY id;")
    // min > max: the module's named pair error
    val e1 = intercept[Exception](engine.write(id,
      "INSERT INTO idx VALUES (7, 5, 3, 0, 0);"))
    assert(e1.getMessage.contains("rtree constraint failed: idx.(minX<=maxX)"),
      e1.getMessage)
    val e1b = intercept[Exception](engine.write(id,
      "UPDATE idx SET maxY = -1 WHERE id = 1;"))
    assert(e1b.getMessage.contains("rtree constraint failed: idx.(minY<=maxY)"),
      e1b.getMessage)
    // duplicate id
    val e2 = intercept[Exception](engine.write(id,
      "INSERT INTO idx VALUES (1, 0, 0, 0, 0);"))
    assert(e2.getMessage.contains("UNIQUE constraint failed: idx.id"),
      e2.getMessage)
    // the failed statements changed nothing
    same(id, db, "SELECT count(*) FROM idx;")
  }

  test("rtree_i32 truncates toward zero to int32") {
    val s = "CREATE VIRTUAL TABLE i32 USING rtree_i32(id, a, b);"
    val id = seg(s); val db = cliDb(s)
    runBoth(id, db,
      "INSERT INTO i32 VALUES (7, 2.9, 3.2), (8, -2.9, -1.1);")
    same(id, db, "SELECT id, a, b FROM i32 ORDER BY id;")
    same(id, db, "SELECT id FROM i32 WHERE a <= 2 AND b >= 2 ORDER BY id;")
  }

  test("module arity errors and sqlite_master DDL") {
    for ((bad, msg) <- Seq(
      ("CREATE VIRTUAL TABLE b1 USING rtree(id, minX);",
        "Too few columns"),
      ("CREATE VIRTUAL TABLE b2 USING rtree(id, a, b, c);",
        "Wrong number of columns"),
      ("CREATE VIRTUAL TABLE b3 USING rtree(id, a, b, c, d, e, f, g, " +
        "h, i, j, k);", "Too many columns"))) {
      val e = intercept[Exception](seg(bad))
      assert(e.getMessage.contains(msg), s"$bad: ${e.getMessage}")
    }
    val id = seg(schema2d); val db = cliDb(schema2d)
    same(id, db, "SELECT sql FROM sqlite_master WHERE name = 'idx';")
  }

  test("export: real sqlite3 queries and integrity-checks a DEEP exported rtree") {
    // 8k rows force depth 2 (≥ 157 leaves at 51 cells/node), so the
    // export exercises inner-node cells, %_parent and the root header.
    // The segment arrives via ingest (export reads only the backing
    // parquet — the write path feeds it identically) plus one engine
    // DML to prove a mutated segment exports too.
    val src = Files.createTempFile("rtree-exp-src", ".db")
    Files.delete(src)
    assert(SqliteCli.run(src.toString,
      "CREATE VIRTUAL TABLE idx USING rtree(id, minX, maxX, minY, maxY);\n" +
        "WITH RECURSIVE c(i) AS (SELECT 1 UNION ALL SELECT i+1 FROM c " +
        "WHERE i < 8000)\n" +
        "INSERT INTO idx SELECT i, (i % 89) + 0.25, (i % 89) + 0.75, " +
        "((i / 89) % 97) + 0.5, ((i / 89) % 97) + 2.5 FROM c;") == 0)
    val id = "rt-export-deep"
    store.ingestSqliteSegment(src.toString, id)
    engine.provisionWritable(id)
    engine.write(id, "DELETE FROM idx WHERE id % 13 = 0;")
    val out = Files.createTempDirectory("rt-exp").resolve("x.sqlite")
    store.exportSqliteSegment(id, out.toString)
    // the module's own structural check plus the file-level one
    assert(SqliteCli.query(out.toString, "SELECT rtreecheck('idx');") == "ok")
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    def sameExported(select: String): Unit = {
      val engineSide = engine.read(id, select).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
      }.mkString("\n")
      val cliSide = SqliteCli.query(out.toString, select)
      assert(engineSide == cliSide, s"\n-- engine --\n$engineSide\n" +
        s"-- sqlite3 --\n$cliSide\n-- for --\n$select")
    }
    sameExported("SELECT count(*), min(id), max(id), sum(id) FROM idx;")
    sameExported("SELECT id FROM idx WHERE minX <= 5.3 AND maxX >= 5.3 " +
      "AND minY <= 50 AND maxY >= 50 ORDER BY id;")
    sameExported("SELECT id, printf('%.12e|%.12e', minX, maxY) FROM idx " +
      "WHERE id % 971 = 1 ORDER BY id;")
    // full round trip: the exported file re-ingests to identical rows
    val seg2 = "rt-roundtrip-1"
    store.ingestSqliteSegment(out.toString, seg2)
    val back = engine.read(seg2,
      "SELECT count(*), sum(id), sum(minX), sum(maxY) FROM idx;")
      .collect()(0).toString
    val orig = engine.read(id,
      "SELECT count(*), sum(id), sum(minX), sum(maxY) FROM idx;")
      .collect()(0).toString
    assert(back == orig, s"round trip: $back != $orig")
    // rtree_i32 exports too
    val s32 = "CREATE VIRTUAL TABLE z32 USING rtree_i32(id, a, b);"
    val id32 = seg(s32)
    engine.write(id32, "INSERT INTO z32 VALUES (1, -5, 5), (2, 3, 9);")
    val out32 = Files.createTempDirectory("rt-exp32").resolve("y.sqlite")
    store.exportSqliteSegment(id32, out32.toString)
    assert(SqliteCli.query(out32.toString, "SELECT rtreecheck('z32');") == "ok")
    assert(SqliteCli.query(out32.toString,
      "SELECT id, a, b FROM z32 WHERE a <= 4 AND b >= 4 ORDER BY id;") ==
      "1|-5|5\n2|3|9")
  }

  test("ingest: a real sqlite3-written rtree rebuilds from %_node leaves") {
    val db = Files.createTempFile("rtree-ing", ".db")
    Files.delete(db)
    val rng = new scala.util.Random(7L)
    val rows = (1 to 300).map { i =>
      val a = rng.nextDouble() * 200 - 100; val b = a + rng.nextDouble() * 10
      val c = rng.nextDouble() * 1e6; val d = c + rng.nextDouble()
      s"($i, $a, $b, $c, $d)"
    }
    assert(SqliteCli.run(db.toString,
      "CREATE VIRTUAL TABLE idx USING rtree(id, minX, maxX, minY, maxY);\n" +
        s"INSERT INTO idx VALUES ${rows.mkString(", ")};\n" +
        "DELETE FROM idx WHERE id % 7 = 0;") == 0)
    val segId = "rt-ingest-1"
    store.ingestSqliteSegment(db.toString, segId)
    def sameIngested(select: String): Unit = {
      val engineSide = engine.read(segId, select).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
      }.mkString("\n")
      val cliSide = SqliteCli.query(db.toString, select)
      assert(engineSide == cliSide, s"\n-- engine --\n$engineSide\n" +
        s"-- sqlite3 --\n$cliSide\n-- for --\n$select")
    }
    sameIngested("SELECT count(*) FROM idx;")
    sameIngested("SELECT id, printf('%.12e|%.12e|%.12e|%.12e', " +
      "minX, maxX, minY, maxY) FROM idx ORDER BY id;")
    sameIngested("SELECT id FROM idx WHERE minX <= 0 AND maxX >= 0 " +
      "ORDER BY id;")
    // the rebuilt table keeps the module's DML semantics (provision
    // acquires the write lock on the already-ingested segment)
    engine.provisionWritable(segId)
    engine.write(segId, "INSERT INTO idx VALUES (9999, 1.1, 2.2, 0, 0);")
    val got = engine.read(segId,
      "SELECT printf('%.12e', minX) FROM idx WHERE id = 9999;")
      .collect()(0).getString(0)
    assert(got == "1.099999904633e+00", got)
  }

  test("NULL coordinates coerce to 0; NULL ids auto-assign max+1") {
    val id = seg(schema2d); val db = cliDb(schema2d)
    // NULL min stores 0.0 (probed); NULL ids take max+1, max+2, …
    runBoth(id, db,
      "INSERT INTO idx VALUES (41, NULL, 5, 1, 2);\n" +
        "INSERT INTO idx VALUES (NULL, 1, 2, 3, 4);\n" +
        "INSERT INTO idx VALUES (NULL, -1, 0, NULL, NULL);")
    same(id, db, "SELECT id, printf('%.12e|%.12e|%.12e|%.12e', " +
      "minX, maxX, minY, maxY) FROM idx ORDER BY id;")
    // NULL max coerces to 0 FIRST, then fails min≤max against a
    // positive min — the module's named constraint
    val e = intercept[Exception](engine.write(id,
      "INSERT INTO idx VALUES (50, 5, NULL, 1, 2);"))
    assert(e.getMessage.contains("rtree constraint failed: idx.(minX<=maxX)"),
      e.getMessage)
    // UPDATE id = NULL re-assigns like delete+insert (probed: max of
    // the REMAINING rows + 1)
    runBoth(id, db, "UPDATE idx SET id = NULL WHERE id = 41;")
    same(id, db, "SELECT id, printf('%.12e', minX) FROM idx ORDER BY id;")
    // rtree_i32: NULL → 0 too
    val s32 = "CREATE VIRTUAL TABLE z USING rtree_i32(id, a, b);"
    val id32 = seg(s32); val db32 = cliDb(s32)
    runBoth(id32, db32, "INSERT INTO z VALUES (1, NULL, 5), (NULL, 2, 3);")
    same(id32, db32, "SELECT id, a, b FROM z ORDER BY id;")
  }

  test("ingest: a DEEP rtree (inner nodes) keeps only true leaf cells") {
    // 30k rows force depth ≥ 2: non-root INNER nodes carry zero
    // headers exactly like leaves (only the root stores the depth), so
    // leaf detection must come from %_parent, not the header — the
    // old header heuristic decoded child node numbers as rowids here
    val db = Files.createTempFile("rtree-deep", ".db")
    Files.delete(db)
    assert(SqliteCli.run(db.toString,
      "CREATE VIRTUAL TABLE idx USING rtree(id, minX, maxX, minY, maxY);\n" +
        "WITH RECURSIVE c(i) AS (SELECT 1 UNION ALL SELECT i+1 FROM c " +
        "WHERE i < 30000)\n" +
        "INSERT INTO idx SELECT i, i % 997, i % 997 + 1.5, " +
        "(i / 50) % 613, (i / 50) % 613 + 2.5 FROM c;") == 0)
    // sanity: the tree really is deep (non-root inner nodes exist)
    assert(SqliteCli.query(db.toString,
      "SELECT count(DISTINCT parentnode) FROM idx_parent;").trim.toInt > 1)
    val segId = "rt-ingest-deep"
    store.ingestSqliteSegment(db.toString, segId)
    def sameIngested(select: String): Unit = {
      val engineSide = engine.read(segId, select).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
      }.mkString("\n")
      val cliSide = SqliteCli.query(db.toString, select)
      assert(engineSide == cliSide, s"\n-- engine --\n$engineSide\n" +
        s"-- sqlite3 --\n$cliSide\n-- for --\n$select")
    }
    sameIngested("SELECT count(*), min(id), max(id), sum(id) FROM idx;")
    sameIngested("SELECT id, printf('%.12e|%.12e', minX, maxY) FROM idx " +
      "WHERE id % 977 = 3 ORDER BY id;")
    sameIngested("SELECT count(*) FROM idx WHERE minX <= 500 AND " +
      "maxX >= 500;")
  }

  test("fuzz: 120 random boxes + 40 range queries agree with real rtree") {
    val id = seg(schema2d); val db = cliDb(schema2d)
    val rng = new scala.util.Random(20260815L)
    def coord(): Double = rng.nextInt(5) match {
      case 0 => rng.nextInt(200) - 100
      case 1 => (rng.nextInt(2000) - 1000) / 10.0
      case 2 => rng.nextDouble() * 2e9 - 1e9
      case 3 => rng.nextDouble() * 1e-3
      case _ => rng.nextDouble() * 20 - 10
    }
    val rows = (1 to 120).map { i =>
      val (x1, x2) = { val a = coord(); val b = coord()
        (math.min(a, b), math.max(a, b)) }
      val (y1, y2) = { val a = coord(); val b = coord()
        (math.min(a, b), math.max(a, b)) }
      s"($i, $x1, $x2, $y1, $y2)"
    }
    runBoth(id, db, s"INSERT INTO idx VALUES ${rows.mkString(", ")};")
    same(id, db, "SELECT id, printf('%.12e|%.12e|%.12e|%.12e', " +
      "minX, maxX, minY, maxY) FROM idx ORDER BY id;")
    (1 to 40).foreach { _ =>
      val q1 = coord(); val q2 = coord()
      val (lo, hi) = (math.min(q1, q2), math.max(q1, q2))
      same(id, db, s"SELECT id FROM idx WHERE minX <= $hi AND maxX >= $lo " +
        "ORDER BY id;")
    }
  }

  private val schemaAux = "CREATE VIRTUAL TABLE demo USING rtree(" +
    "id, minX, maxX, minY, maxY, +label TEXT, +weight);"

  test("auxiliary +col columns: DML and queries match real rtree (r17)") {
    val id = seg(schemaAux); val db = cliDb(schemaAux)
    runBoth(id, db,
      "INSERT INTO demo VALUES (1, 1.1, 2.2, 0, 1, 'hello', 42);\n" +
        "INSERT INTO demo VALUES (2, 3, 4, 1, 2, NULL, 2.5);\n" +
        "INSERT INTO demo(id, minX, maxX, minY, maxY) VALUES (3, 0, 1, 0, 1);")
    // values render identically (typeof is the documented concrete-
    // typing deviation: real aux columns keep per-row storage classes)
    same(id, db, "SELECT id, label, weight FROM demo ORDER BY id;")
    same(id, db, "SELECT id, printf('%.12e', minX), label FROM demo " +
      "ORDER BY id;")
    // aux columns update and filter like ordinary columns; the coords
    // keep their module coercions beside them
    runBoth(id, db,
      "UPDATE demo SET label = 'moved', weight = '43' WHERE id = 1;")
    same(id, db, "SELECT id FROM demo WHERE label = 'moved';")
    same(id, db, "SELECT id, label, weight FROM demo ORDER BY id;")
    same(id, db, "SELECT sql FROM sqlite_master WHERE name = 'demo';")
    // aux-after-coord ordering is the module's own error (probed text)
    val e1 = intercept[Exception](
      seg("CREATE VIRTUAL TABLE b USING rtree(id, minX, maxX, +a, minY);"))
    assert(e1.getMessage.contains("Auxiliary rtree columns must be last"),
      e1.getMessage)
    // arity counts the non-aux columns (probed)
    val e2 = intercept[Exception](
      seg("CREATE VIRTUAL TABLE b2 USING rtree(id, minX, +a);"))
    assert(e2.getMessage.contains("Too few columns"), e2.getMessage)
  }

  test("auxiliary +col columns: export + ingest round trip (r17)") {
    val id = seg(schemaAux); val db = cliDb(schemaAux)
    val rows = (1 to 500).map(i =>
      s"($i, ${i % 89}.25, ${i % 89}.75, ${(i / 89) % 97}, " +
        s"${(i / 89) % 97 + 2}, 'L$i', ${i * 3})")
    runBoth(id, db, s"INSERT INTO demo VALUES ${rows.mkString(", ")};\n" +
      "DELETE FROM demo WHERE id % 11 = 0;")
    val out = Files.createTempDirectory("rt-aux").resolve("a.sqlite")
    store.exportSqliteSegment(id, out.toString)
    assert(SqliteCli.query(out.toString, "SELECT rtreecheck('demo');") == "ok")
    assert(SqliteCli.query(out.toString, "PRAGMA integrity_check;") == "ok")
    // aux values land in %_rowid as a0, a1 (probed shadow DDL) and real
    // sqlite3 serves them through the virtual table
    assert(SqliteCli.query(out.toString,
      "SELECT sql FROM sqlite_master WHERE name = 'demo_rowid';")
      .contains("nodeno,a0,a1"))
    def sameExported(select: String): Unit = {
      val engineSide = engine.read(id, select).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("|")
      }.mkString("\n")
      val cliSide = SqliteCli.query(out.toString, select)
      assert(engineSide == cliSide, s"\n-- engine --\n$engineSide\n" +
        s"-- sqlite3 --\n$cliSide\n-- for --\n$select")
    }
    sameExported("SELECT count(*), min(id), max(id) FROM demo;")
    sameExported("SELECT id, label, weight FROM demo WHERE id % 71 = 1 " +
      "ORDER BY id;")
    sameExported("SELECT id, label FROM demo WHERE minX <= 5.5 " +
      "AND maxX >= 5.3 ORDER BY id;")
    // the exported file stays WRITABLE by real sqlite3, aux included
    assert(SqliteCli.run(out.toString,
      "INSERT INTO demo VALUES (9001, 0, 1, 0, 1, 'w', 7);\n" +
        "UPDATE demo SET label = 'y' WHERE id = 9001;") == 0)
    assert(SqliteCli.query(out.toString,
      "SELECT label, weight FROM demo WHERE id = 9001;") == "y|7")
    // a real sqlite3-written rtree WITH aux re-ingests, aux intact
    val seg2 = "rt-aux-ingest"
    store.ingestSqliteSegment(db.toString, seg2)
    def sameIngested(select: String): Unit = {
      val engineSide = engine.read(seg2, select).collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString).mkString("\n")
      }.mkString("\n")
      val cliSide = SqliteCli.query(db.toString, select)
      assert(engineSide == cliSide, s"\n-- engine --\n$engineSide\n" +
        s"-- sqlite3 --\n$cliSide\n-- for --\n$select")
    }
    sameIngested("SELECT count(*) FROM demo;")
    sameIngested("SELECT label FROM demo WHERE id % 71 = 1 ORDER BY id;")
    sameIngested("SELECT weight FROM demo WHERE id % 97 = 5 ORDER BY id;")
  }
}
