package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSpecBase

/** ATTACH/DETACH through the write path (r17), DIFFERENTIAL against the
  * sandbox `sqlite3` CLI. Modern sqlite3 permits ATTACH inside the
  * transaction the reference wraps every script in (write.py:39 —
  * probed on python's sqlite3, the exact stack the reference runs), so
  * a write script may address several databases; this engine maps an
  * attached file to the SEGMENT named by its basename and `:memory:`/''
  * to an ephemeral script-lifetime db. The same script text runs on
  * both engines: the CLI attaches the real file, the engine the
  * same-named segment. Covers cross-db DML/SELECT/UPDATE…FROM, sqlite's
  * main-first unqualified resolution, create-on-attach segments,
  * per-db triggers/views/indexes, savepoint rollback across dbs,
  * multi-db commit atomicity, and the probed error surface (locked
  * DETACH, duplicate names, unknown dbs, cross-db trigger/view
  * refusals, the 10-db limit). */
class AttachSpec extends SparkSpecBase {

  private lazy val root = Files.createTempDirectory("graft-attach").toString
  private lazy val store = new SegmentStore(spark, root)
  private lazy val engine = new TroughEngine(spark, store, new SchemaRegistry)
  private lazy val cliDir = Files.createTempDirectory("graft-attach-cli")

  private var n = 0
  /** A fresh (engine segment, CLI db) pair sharing `schema`. */
  private def pair(schema: String): (String, Path) = {
    n += 1
    val id = s"att-main-$n"
    engine.schemas.put(s"att-schema-$n", schema)
    engine.provisionWritable(id, s"att-schema-$n")
    val db = cliDir.resolve(s"$id.db")
    if (schema.nonEmpty) assert(SqliteCli.run(db.toString, schema) == 0)
    (id, db)
  }

  /** An aux db both sides can attach BY THE SAME PATH: the engine maps
    * the basename to the segment id, the CLI opens the file. Returns
    * the shared path text. */
  private def aux(schema: String, suffix: String = ""): String = {
    val id = s"att-aux-$n$suffix"
    val p = cliDir.resolve(s"$id.sqlite")
    if (schema.nonEmpty) {
      engine.schemas.put(s"att-aux-schema-$n$suffix", schema)
      engine.provisionWritable(id, s"att-aux-schema-$n$suffix")
      assert(SqliteCli.run(p.toString, schema) == 0)
    }
    p.toString
  }

  private def segOf(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    if (base.endsWith(".sqlite")) base.dropRight(7) else base
  }

  private def runBoth(id: String, db: Path, script: String): Unit = {
    engine.write(id, script)
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") == 0, s"sqlite3 failed: $script")
  }

  /** Both sides must REFUSE the script; returns the engine's message. */
  private def failBoth(id: String, db: Path, script: String): String = {
    val e = intercept[Exception](engine.write(id, script))
    assert(SqliteCli.run(db.toString,
      s".bail on\nBEGIN;\n$script\nCOMMIT;\n") != 0,
      s"sqlite3 unexpectedly accepted: $script")
    e.getMessage
  }

  private def render(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map { i =>
      if (r.isNullAt(i)) "" else r.get(i).toString
    }.mkString("|")

  /** Engine segment vs CLI file must render identically for `select`. */
  private def same(seg: String, db: String, select: String): Unit = {
    val engineSide = engine.read(seg, select).collect().map(render).mkString("\n")
    val cliSide = SqliteCli.query(db, select)
    assert(engineSide == cliSide,
      s"\n-- engine($seg) --\n$engineSide\n-- sqlite3($db) --\n$cliSide\n-- for --\n$select")
  }

  private val mainSchema =
    "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);"

  test("cross-db DML: create, fill and read an attached segment") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE src (k INTEGER, w TEXT);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO a.src VALUES (1, 'x'), (2, 'y');" +
        "CREATE TABLE a.extra (z TEXT);" +
        "INSERT INTO a.extra SELECT w || k FROM a.src;" +
        "INSERT INTO t SELECT k, w FROM a.src;")
    same(id, db.toString, "SELECT id, v FROM t ORDER BY id;")
    same(segOf(a), a, "SELECT k, w FROM src ORDER BY k;")
    same(segOf(a), a, "SELECT z FROM extra ORDER BY z;")
  }

  test("ephemeral :memory: staging db dies with the script") {
    val (id, db) = pair(mainSchema)
    runBoth(id, db,
      "ATTACH ':memory:' AS tmp;" +
        "CREATE TABLE tmp.s (v INTEGER);" +
        "INSERT INTO tmp.s VALUES (1), (2), (3);" +
        "INSERT INTO t SELECT v, 'n' || v FROM tmp.s WHERE v > 1;")
    same(id, db.toString, "SELECT id, v FROM t ORDER BY id;")
    // a second script sees no trace of tmp
    val e = intercept[Exception](engine.write(id,
      "INSERT INTO t SELECT v + 10, 'x' FROM tmp.s;"))
    assert(e.getMessage.toLowerCase.contains("tmp"))
  }

  test("attach of a nonexistent file creates the segment at commit (create-on-attach)") {
    val (id, db) = pair(mainSchema)
    n += 1
    val fresh = cliDir.resolve(s"att-new-$n.sqlite").toString
    assert(!store.segmentExists(segOf(fresh)))
    runBoth(id, db,
      s"ATTACH '$fresh' AS nw;" +
        "CREATE TABLE nw.made (v TEXT);" +
        "INSERT INTO nw.made VALUES ('hello');")
    assert(store.segmentExists(segOf(fresh)))
    same(segOf(fresh), fresh, "SELECT v FROM made;")
  }

  test("unqualified names resolve main-first, then attach order (probed order)") {
    val (id, db) = pair(mainSchema + "CREATE TABLE both (v TEXT);")
    val a = aux("CREATE TABLE both (v TEXT); CREATE TABLE only_a (v TEXT);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO both VALUES ('main wins');" + // main shadows a.both
        "INSERT INTO only_a VALUES ('routed to a');" + // only in a
        "INSERT INTO t SELECT 1, v FROM only_a;")
    same(id, db.toString, "SELECT v FROM both;")
    same(id, db.toString, "SELECT id, v FROM t;")
    same(segOf(a), a, "SELECT v FROM both;")
    same(segOf(a), a, "SELECT v FROM only_a;")
  }

  test("UPDATE … FROM and 3-part column references across dbs") {
    val (id, db) = pair(
      "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT);")
    val a = aux("CREATE TABLE s (id INTEGER, v TEXT);")
    runBoth(id, db,
      "INSERT INTO t VALUES (1, 'old1'), (2, 'old2'), (3, 'keep');" +
        s"ATTACH '$a' AS a;" +
        "INSERT INTO a.s VALUES (1, 'new1'), (2, 'new2');" +
        "UPDATE t SET v = a.s.v FROM a.s WHERE t.id = a.s.id;" +
        "DELETE FROM a.s WHERE a.s.id = 2;")
    same(id, db.toString, "SELECT id, v FROM t ORDER BY id;")
    same(segOf(a), a, "SELECT id, v FROM s ORDER BY id;")
  }

  test("triggers live per-db: qualified creation, firing under the attached scope") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE evt (v INTEGER); CREATE TABLE log (msg TEXT);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "CREATE TRIGGER a.tr AFTER INSERT ON evt BEGIN " +
        "INSERT INTO log VALUES ('saw ' || NEW.v); END;" +
        "INSERT INTO a.evt VALUES (7), (8);")
    same(segOf(a), a, "SELECT msg FROM log ORDER BY msg;")
  }

  test("views live per-db and read across the boundary") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE base (v INTEGER);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO a.base VALUES (5), (6);" +
        "CREATE VIEW a.doubled AS SELECT v * 2 AS d FROM base;" +
        "INSERT INTO t SELECT d, 'from view' FROM a.doubled;")
    same(id, db.toString, "SELECT id, v FROM t ORDER BY id;")
    same(segOf(a), a, "SELECT d FROM doubled ORDER BY d;")
  }

  test("unique index in an attached db enforces under its scope") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE u (v INTEGER);")
    val msg = failBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "CREATE UNIQUE INDEX a.ix ON u (v);" +
        "INSERT INTO a.u VALUES (1);" +
        "INSERT INTO a.u VALUES (1);")
    assert(msg.contains("UNIQUE constraint failed: u.v"))
  }

  test("savepoint rollback spans attached dbs; the attach itself survives (probed)") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (v INTEGER);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO a.s VALUES (1);" +
        "SAVEPOINT sp;" +
        "INSERT INTO a.s VALUES (2);" +
        "INSERT INTO t VALUES (9, 'gone');" +
        "ROLLBACK TO sp;" +
        "INSERT INTO a.s VALUES (3);" + // attach survives; staged (1) survives
        "INSERT INTO t VALUES (1, 'kept');")
    same(id, db.toString, "SELECT id, v FROM t ORDER BY id;")
    same(segOf(a), a, "SELECT v FROM s ORDER BY v;")
  }

  test("multi-db commit is atomic: a late constraint failure leaves every db untouched") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (v INTEGER);")
    failBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO a.s VALUES (42);" +
        "INSERT INTO t VALUES (1, 'x');" +
        "INSERT INTO t VALUES (1, 'dup pk');")
    same(id, db.toString, "SELECT count(*) FROM t;")
    same(segOf(a), a, "SELECT count(*) FROM s;")
  }

  test("error surface matches sqlite3's probed texts") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (v INTEGER);")

    // DETACH of a db the transaction referenced: locked
    assert(failBoth(id, db,
      s"ATTACH '$a' AS a; INSERT INTO a.s VALUES (1); DETACH a;")
      .contains("database a is locked"))
    // duplicate attach name
    assert(failBoth(id, db,
      s"ATTACH '$a' AS a; ATTACH ':memory:' AS a;")
      .contains("database a is already in use"))
    assert(failBoth(id, db, s"ATTACH '$a' AS main;")
      .contains("database main is already in use"))
    // detach main / unknown
    assert(failBoth(id, db, "DETACH main;")
      .contains("cannot detach database main"))
    assert(failBoth(id, db, "DETACH nope;")
      .contains("no such database: nope"))
    // unknown db qualifier
    assert(failBoth(id, db, "CREATE TABLE nope.t2 (v);")
      .contains("unknown database nope"))
    assert(failBoth(id, db, s"ATTACH '$a' AS a; INSERT INTO a.missing VALUES (1);")
      .contains("no such table: a.missing"))
    // too many attached databases
    val many = (0 until 11).map(i => s"ATTACH ':memory:' AS m$i;").mkString
    assert(failBoth(id, db, many)
      .contains("too many attached databases - max 10"))
    // clean detach of an unreferenced db succeeds on both
    runBoth(id, db, s"ATTACH '$a' AS fresh; DETACH fresh;")
  }

  test("cross-db trigger and view bodies refuse with sqlite's own errors") {
    val (id, db) = pair(mainSchema + "CREATE TABLE lg (v TEXT);")
    val a = aux("CREATE TABLE far (v INTEGER);")
    // qualified DML target inside a trigger body: categorical refusal
    assert(failBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN " +
        "INSERT INTO a.far VALUES (1); END;")
      .contains("qualified table names are not allowed on INSERT, " +
        "UPDATE, and DELETE statements within triggers"))
    // non-DML cross-db reference inside a trigger body
    assert(failBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "CREATE TRIGGER tr2 AFTER INSERT ON t BEGIN " +
        "INSERT INTO lg SELECT v FROM a.far; END;")
      .contains("cannot reference objects in database a"))
    // cross-db view
    assert(failBoth(id, db,
      s"ATTACH '$a' AS a; CREATE VIEW vv AS SELECT v FROM a.far;")
      .contains("view vv cannot reference objects in database a"))
    // own-db qualifiers are legal and strip (probed): main view over main.
    runBoth(id, db,
      "CREATE VIEW okv AS SELECT v FROM main.t;" +
        "INSERT INTO main.t VALUES (1, 'q');" +
        "INSERT INTO lg SELECT v FROM okv;")
    same(id, db.toString, "SELECT v FROM lg;")
  }

  // GRAFT_ATTACH_FUZZ_COUNT/SEED → -D props (round-harness sweeps)
  private val FUZZ_COUNT =
    sys.props.get("graft.attachfuzz.count").map(_.toInt).getOrElse(25)
  private val FUZZ_SEED =
    sys.props.get("graft.attachfuzz.seed").map(_.toLong).getOrElse(20260816L)

  test(s"$FUZZ_COUNT random multi-db scripts agree with sqlite3 (seed $FUZZ_SEED)") {
    val rng = new scala.util.Random(FUZZ_SEED)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var comparedNonEmpty = 0
    for (i <- 1 to FUZZ_COUNT) {
      val mainDdl =
        "CREATE TABLE m (id INTEGER PRIMARY KEY, v TEXT);" +
          "CREATE TABLE shared (k INTEGER, w TEXT);"
      val auxDdl =
        "CREATE TABLE s (k INTEGER, w TEXT);" +
          "CREATE TABLE shared (k INTEGER, w TEXT);"
      val (id, db) = pair(mainDdl) // bumps n — aux names stay per-iteration
      // aux flavors: pre-existing segment+file, create-on-attach path,
      // ephemeral :memory: (main-side compare only)
      val flavor = rng.nextInt(3)
      val auxPath = flavor match {
        case 0 => aux(auxDdl, suffix = "f")
        case 1 => cliDir.resolve(s"att-fuzz-new-$n.sqlite").toString
        case _ => ":memory:"
      }
      var nextId = 100
      var spOpen = false
      var vwOpen = false
      var trigOpen = false
      var attached = true
      val stmts = scala.collection.mutable.ArrayBuffer[String]()
      stmts += s"ATTACH '$auxPath' AS a;"
      if (flavor != 0) stmts += auxDdl.split(";").filter(_.nonEmpty)
        .map(d => d.replaceFirst("CREATE TABLE ", "CREATE TABLE a.") + ";").mkString
      def tl: String = s"'x${rng.nextInt(6)}'"
      (1 to (4 + rng.nextInt(7))).foreach { _ =>
        val op = rng.nextInt(16)
        // r19 (VERDICT r18 #8): mid-script DETACH / re-ATTACH
        // interleaves with everything else — incl. open savepoints
        // (DETACH is not transactional; ROLLBACK TO must not restore
        // it) and the per-db views/triggers, which persist in the file
        // across the detach. :memory: stays attached for its whole
        // script (an ephemeral db's re-attach identity is unprobed).
        if (op == 15 && flavor != 2) {
          if (attached && !vwOpen && !trigOpen) {
            attached = false; stmts += "DETACH a;"
          } else if (!attached) {
            attached = true; stmts += s"ATTACH '$auxPath' AS a;"
          }
        } else if (!attached) {
          // while detached only main-side ops make progress; a.* would
          // kill the rest of the script on both engines alike
          nextId += 1
          stmts += s"INSERT INTO m VALUES ($nextId, $tl);"
        } else (op min 14) match {
          case 12 =>
            // views created INSIDE the attached db's script (r18):
            // create, read through, and drop under the a. scope
            if (!vwOpen) {
              vwOpen = true
              stmts += s"CREATE VIEW a.vw AS SELECT k, w FROM s " +
                s"WHERE k % ${2 + rng.nextInt(3)} = ${rng.nextInt(2)};"
            } else if (rng.nextBoolean()) {
              stmts += s"INSERT INTO m SELECT k + ${rng.nextInt(40) + 700}, w FROM a.vw;"
            } else { vwOpen = false; stmts += "DROP VIEW a.vw;" }
          case 13 =>
            // triggers created inside the attached db's script (r18):
            // a per-db audit program firing under the a. scope
            if (!trigOpen) {
              trigOpen = true
              stmts += "CREATE TRIGGER a.tg AFTER INSERT ON s BEGIN " +
                "INSERT INTO shared VALUES (NEW.k, 'tg'); END;"
            } else { trigOpen = false; stmts += "DROP TRIGGER a.tg;" }
          case 14 =>
            nextId += 1
            // cross-db copy INTO the attached shared (fires a.tg? no —
            // the trigger is on s; exercises shadowing + trigger state)
            stmts += s"INSERT INTO a.shared SELECT id, v FROM m WHERE id = $nextId;"
          case 0 | 1 =>
            nextId += 1
            stmts += s"INSERT INTO a.s VALUES ($nextId, $tl);"
          case 2 =>
            nextId += 1
            // unqualified: s lives only in a → sqlite's search order
            stmts += s"INSERT INTO s VALUES ($nextId, $tl);"
          case 3 =>
            nextId += 1
            // shared exists in BOTH dbs: main must shadow
            stmts += s"INSERT INTO shared VALUES ($nextId, $tl);"
          case 4 =>
            nextId += 1
            stmts += s"INSERT INTO a.shared VALUES ($nextId, $tl);"
          case 5 =>
            nextId += 1
            stmts += s"INSERT INTO m VALUES ($nextId, $tl);"
          case 6 =>
            stmts += s"INSERT INTO m SELECT k + ${rng.nextInt(50) + 500}, w " +
              s"FROM a.s WHERE k % ${2 + rng.nextInt(3)} = ${rng.nextInt(2)};"
          case 7 =>
            stmts += s"INSERT INTO a.s SELECT id + ${rng.nextInt(50) + 900}, v " +
              s"FROM m WHERE id % ${2 + rng.nextInt(3)} = ${rng.nextInt(2)};"
          case 8 =>
            stmts += s"UPDATE a.s SET w = w || '!' WHERE k % ${2 + rng.nextInt(3)} " +
              s"= ${rng.nextInt(2)};"
          case 9 =>
            stmts += s"UPDATE m SET v = $tl WHERE id IN " +
              s"(SELECT k - ${rng.nextInt(3)} FROM a.s);"
          case 10 =>
            stmts += s"DELETE FROM a.s WHERE k % ${3 + rng.nextInt(3)} = ${rng.nextInt(3)};"
          case _ =>
            if (!spOpen) { spOpen = true; stmts += "SAVEPOINT sp;" }
            else if (rng.nextBoolean()) stmts += "ROLLBACK TO sp;"
            else { spOpen = false; stmts += "RELEASE sp;" }
        }
      }
      val script = stmts.mkString("\n")
      val engineErr = scala.util.Try(engine.write(id, script)).failed.toOption
      val rc = SqliteCli.run(db.toString,
        s".bail on\nBEGIN;\n$script\nCOMMIT;\n")
      if (engineErr.isDefined != (rc != 0))
        failures += s"[$i] outcome diverged (engine=${engineErr.map(_.getMessage)} " +
          s"sqlite3 rc=$rc)\n$script"
      else if (engineErr.isEmpty) {
        def cmp(seg: String, file: String, table: String, sel: String): Unit = {
          val ours = scala.util.Try(engine.read(seg, sel).collect()
            .map(render).toSeq.sorted).toOption
          val theirs = scala.util.Try(SqliteCli.query(file, sel)
            .split("\n").filter(_.nonEmpty).toSeq.sorted).toOption
          if (ours != theirs)
            failures += s"[$i] $table diverged\n$script\nengine: $ours\nsqlite3: $theirs"
          else if (ours.exists(_.nonEmpty)) comparedNonEmpty += 1
        }
        cmp(id, db.toString, "m", "SELECT id, v FROM m;")
        cmp(id, db.toString, "shared", "SELECT k, w FROM shared;")
        if (auxPath != ":memory:") {
          cmp(segOf(auxPath), auxPath, "a.s", "SELECT k, w FROM s;")
          cmp(segOf(auxPath), auxPath, "a.shared", "SELECT k, w FROM shared;")
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/$FUZZ_COUNT diverged:\n${failures.take(4).mkString("\n---\n")}")
    assert(comparedNonEmpty > FUZZ_COUNT,
      s"only $comparedNonEmpty non-empty comparisons — degenerate sweep")
  }

  test(s"cold-tier attach sweep: random scripts vs a readonly sqlite3 mirror (seed ${FUZZ_SEED + 1})") {
    // r19 (VERDICT r18 #8): the r18 directed cases (:572) hold under a
    // random interleaving of main writes, cold reads, cold WRITE
    // attempts (must refuse on both engines), savepoint rollbacks and
    // mid-script DETACH/re-ATTACH. The sqlite3 mirror of "cold" is a
    // chmod-readonly file: attach + reads fine, any write errors —
    // the same observable outcome contract as the cold tier.
    val rng = new scala.util.Random(FUZZ_SEED + 1)
    val hotRoot = Files.createTempDirectory("graft-attcold-hot").toString
    val coldRoot = Files.createTempDirectory("graft-attcold-cold").toString
    val seeder = new TroughEngine(spark,
      new SegmentStore(spark, coldRoot), new SchemaRegistry)
    val eng = new TroughEngine(spark,
      new SegmentStore(spark, hotRoot, Some(coldRoot), _.startsWith("coldfz")),
      new SchemaRegistry)
    eng.schemas.put("attcold-main",
      "CREATE TABLE m (id INTEGER PRIMARY KEY, v TEXT);")
    seeder.schemas.put("attcold-aux", "CREATE TABLE s (k INTEGER, w TEXT);")
    val count = math.max(10, FUZZ_COUNT / 2)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for (i <- 1 to count) {
      val coldId = s"coldfz-$i"
      seeder.provisionWritable(coldId, "attcold-aux")
      (1 to 3).foreach(k =>
        seeder.write(coldId, s"INSERT INTO s VALUES ($k, 'c$k');"))
      val mainId = s"attcold-main-$i"
      eng.provisionWritable(mainId, "attcold-main")
      // CLI mirror: same data, then chmod readonly
      val db = cliDir.resolve(s"$mainId.db")
      assert(SqliteCli.run(db.toString,
        "CREATE TABLE m (id INTEGER PRIMARY KEY, v TEXT);") == 0)
      val mirror = cliDir.resolve(s"$coldId.sqlite")
      assert(SqliteCli.run(mirror.toString,
        "CREATE TABLE s (k INTEGER, w TEXT);" +
          "INSERT INTO s VALUES (1,'c1'),(2,'c2'),(3,'c3');") == 0)
      // readonly via sqlite's own mode=ro URI: the test runs as root,
      // where a chmod'd file is still writable
      val mirrorRo = s"file:$mirror?mode=ro"
      try {
        var nextId = 10
        var spOpen = false
        var attached = true
        val stmts = scala.collection.mutable.ArrayBuffer[String]()
        stmts += s"ATTACH '$coldId' AS a;"
        val cliStmts = scala.collection.mutable.ArrayBuffer[String]()
        cliStmts += s"ATTACH '$mirrorRo' AS a;"
        def push(s: String): Unit = { stmts += s; cliStmts += s }
        (1 to (3 + rng.nextInt(6))).foreach { _ =>
          rng.nextInt(8) match {
            case 0 | 1 =>
              nextId += 1; push(s"INSERT INTO m VALUES ($nextId, 'h');")
            case 2 if attached =>
              push(s"INSERT INTO m SELECT k + ${rng.nextInt(50) + 100}, w FROM a.s;")
            case 3 if attached && rng.nextInt(3) == 0 =>
              // a write INTO the cold db: both sides must refuse
              push(s"INSERT INTO a.s VALUES (99, 'nope');")
            case 4 =>
              if (!spOpen) { spOpen = true; push("SAVEPOINT sp;") }
              else if (rng.nextBoolean()) push("ROLLBACK TO sp;")
              else { spOpen = false; push("RELEASE sp;") }
            case 5 =>
              if (attached) { attached = false; push("DETACH a;") }
              else {
                attached = true
                stmts += s"ATTACH '$coldId' AS a;"
                cliStmts += s"ATTACH '$mirrorRo' AS a;"
              }
            case _ =>
              nextId += 1; push(s"INSERT INTO m VALUES ($nextId, 'x');")
          }
        }
        val engineErr =
          scala.util.Try(eng.write(mainId, stmts.mkString("\n"))).failed.toOption
        val rc = SqliteCli.run(db.toString,
          s".bail on\nBEGIN;\n${cliStmts.mkString("\n")}\nCOMMIT;\n")
        if (engineErr.isDefined != (rc != 0))
          failures += s"[$i] outcome diverged (engine=${engineErr.map(_.getMessage)} " +
            s"sqlite3 rc=$rc)\n${stmts.mkString("\n")}"
        else if (engineErr.isEmpty) {
          val ours = eng.read(mainId, "SELECT id, v FROM m;").collect()
            .map(render).toSeq.sorted
          val theirs = SqliteCli.query(db.toString, "SELECT id, v FROM m;")
            .split("\n").filter(_.nonEmpty).toSeq.sorted
          if (ours != theirs)
            failures += s"[$i] m diverged\n${stmts.mkString("\n")}\n" +
              s"engine: $ours\nsqlite3: $theirs"
        }
        // the cold segment is byte-stable either way
        val coldRows = eng.read(coldId, "SELECT k, w FROM s;").collect().length
        if (coldRows != 3)
          failures += s"[$i] cold segment mutated: $coldRows rows"
      } finally ()
    }
    assert(failures.isEmpty,
      s"${failures.size}/$count diverged:\n${failures.take(4).mkString("\n---\n")}")
  }

  test("sqlite_master reads inside a write script see the STAGED catalog, per db") {
    val (id, db) = pair(mainSchema + "CREATE TABLE mlog (name TEXT);")
    val a = aux("CREATE TABLE s (k INTEGER);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "CREATE TABLE a.x2 (v TEXT);" + // staged, not yet committed
        "CREATE TABLE mt2 (v TEXT);" +
        "INSERT INTO mlog SELECT 'a:' || name FROM a.sqlite_master " +
        "WHERE type = 'table';" +
        "INSERT INTO mlog SELECT 'm:' || name FROM sqlite_master " +
        "WHERE type = 'table' AND name NOT LIKE 'mlog';")
    same(id, db.toString, "SELECT name FROM mlog ORDER BY name;")
  }

  test("qualified ALTER, db-qualified PRAGMA, and detach/re-attach under a new name") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (k INTEGER);")
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "ALTER TABLE a.s ADD COLUMN w TEXT DEFAULT 'd';" +
        "INSERT INTO a.s VALUES (1, 'x');" +
        "PRAGMA a.cache_size = 1000;") // physical-layer no-op, db-qualified
        // (synchronous/journal_mode refuse inside a txn in real sqlite;
        // cache_size is txn-legal there and a no-op here)
    same(segOf(a), a, "SELECT k, w FROM s ORDER BY k;")
    // a fresh script re-attaches the same file under another name and
    // keeps working against the committed state
    runBoth(id, db,
      s"ATTACH '$a' AS other; DETACH other; ATTACH '$a' AS b;" +
        "UPDATE b.s SET w = w || '!' WHERE b.s.k = 1;")
    same(segOf(a), a, "SELECT k, w FROM s ORDER BY k;")
  }

  test("attach filename may be an expression; segment id comes from the basename") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (v INTEGER);")
    val stem = a.dropRight(7) // strip .sqlite
    runBoth(id, db,
      s"ATTACH '$stem' || '.sqlite' AS a;" +
        "INSERT INTO a.s VALUES (11);" +
        "INSERT INTO t SELECT v, 'e' FROM a.s;")
    same(id, db.toString, "SELECT id, v FROM t;")
    same(segOf(a), a, "SELECT v FROM s;")
  }

  // ------------------------------------------------------- r18 locking

  test("one file attached twice: disjoint use is fine, a second scope locks (probed 3.51)") {
    // sqlite 3.51 permits attaching the same file under two names
    // (older releases refused); the conflict surfaces as 'database is
    // locked' the moment a SECOND scope over the same file is touched
    // inside one transaction. Differential: the same script runs on the
    // real CLI over the real file.
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (k INTEGER);")
    // single-scope use through one of the two aliases: both engines OK
    runBoth(id, db,
      s"ATTACH '$a' AS a; ATTACH '$a' AS b;" +
        "INSERT INTO a.s VALUES (7);")
    same(segOf(a), a, "SELECT k FROM s;")
    // touching the same file through BOTH aliases: both engines refuse
    val msg = failBoth(id, db,
      s"ATTACH '$a' AS a; ATTACH '$a' AS b;" +
        "INSERT INTO a.s VALUES (8); INSERT INTO b.s VALUES (9);")
    assert(msg.contains("database is locked"), msg)
    // ... and nothing committed (atomicity held through the refusal)
    same(segOf(a), a, "SELECT k FROM s;")
  }

  test("alias over MAIN's own segment locks when both scopes are used (engine contract)") {
    // engine-only shape (the CLI pair uses a .db filename whose
    // basename would not map to the main segment id): attach main's
    // segment by bare name, write through the alias only → fine;
    // write main then touch the alias → sqlite's probed busy refusal.
    val (id, _) = pair(mainSchema)
    def vs(): Seq[String] = engine.read(id, "SELECT v FROM t ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    engine.write(id, s"ATTACH '$id' AS me; INSERT INTO me.t VALUES (1, 'x');")
    assert(vs() == Seq("x"))
    val e = intercept[Exception](engine.write(id,
      s"ATTACH '$id' AS me;" +
        "INSERT INTO t VALUES (2, 'y'); INSERT INTO me.t VALUES (3, 'z');"))
    assert(e.getMessage.contains("database is locked"), e.getMessage)
    assert(vs() == Seq("x")) // atomic: the refused script left nothing
  }

  test("DETACH lock survives ROLLBACK TO; only a full ROLLBACK releases it (probed)") {
    // probed on sqlite 3.51: rolling back PAST the first reference does
    // NOT make the db detachable again — 'database a is locked' — while
    // a full ROLLBACK does. Both engines must agree on both halves.
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (k INTEGER);")
    val msg = failBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "SAVEPOINT sp;" +
        "INSERT INTO a.s VALUES (1);" + // first reference: DETACH-locks a
        "ROLLBACK TO sp;" +
        "DETACH a;")                    // still locked (probed)
    assert(msg.contains("is locked"), msg)
    // full ROLLBACK ends the transaction that was using a → detachable
    engine.write(id,
      s"ATTACH '$a' AS a;" +
        "INSERT INTO a.s VALUES (1);" +
        "ROLLBACK;" +
        "DETACH a;" +
        "INSERT INTO t VALUES (1, 'ok');")
    val vs = engine.read(id, "SELECT v FROM t").collect().map(_.getString(0)).toSeq
    assert(vs == Seq("ok"), vs.toString)
  }

  test("busy attached segment refuses with sqlite's busy error, then succeeds once freed") {
    val (id, _) = pair(mainSchema)
    val a = aux("CREATE TABLE s (k INTEGER);")
    val lock = engine.segmentScriptLock(segOf(a))
    val prev = WriteTxn.attachLockTimeoutMs
    WriteTxn.attachLockTimeoutMs = 100L
    try {
      // a concurrent holder of the attached segment's script lock
      // (ReentrantLock releases only from its owner thread, so one
      // latch-gated thread plays the other script): the ATTACH must
      // give up after the busy timeout, not deadlock
      val release = new java.util.concurrent.CountDownLatch(1)
      val held = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => {
        lock.lock()
        try { held.countDown(); release.await() } finally lock.unlock()
      })
      holder.start()
      held.await()
      val e = intercept[Exception](engine.write(id,
        s"ATTACH '$a' AS a; INSERT INTO a.s VALUES (1);"))
      assert(e.getMessage.contains("database is locked"), e.getMessage)
      release.countDown()
      holder.join()
      engine.write(id, s"ATTACH '$a' AS a; INSERT INTO a.s VALUES (2);")
      val ks = engine.read(segOf(a), "SELECT k FROM s ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(ks == Seq(2L), ks.toString) // the refused script left nothing
    } finally WriteTxn.attachLockTimeoutMs = prev
  }

  test("DETACH with a pending savepoint: unused db detaches; detach+re-attach inside one savepoint (probed)") {
    val (id, db) = pair(mainSchema)
    val a = aux("CREATE TABLE s (k INTEGER);")
    // probed: an open savepoint does not block DETACH of an UNUSED db
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "SAVEPOINT sp;" +
        "INSERT INTO t VALUES (1, 'x');" +
        "DETACH a;" +
        "RELEASE sp;")
    same(id, db.toString, "SELECT id, v FROM t;")
    // probed: detach + re-attach inside one savepoint, then use
    runBoth(id, db,
      s"ATTACH '$a' AS a;" +
        "SAVEPOINT sp;" +
        "DETACH a;" +
        s"ATTACH '$a' AS a;" +
        "INSERT INTO a.s VALUES (3);" +
        "RELEASE sp;")
    same(segOf(a), a, "SELECT k FROM s;")
  }

  test("ATTACH of a cold-tier segment: reads work, writes refuse read-only (r18)") {
    val hotRoot = Files.createTempDirectory("graft-att-hot").toString
    val coldRoot = Files.createTempDirectory("graft-att-cold").toString
    // seed the cold tier through a staging store that treats it as hot
    // (the promotion-to-cold pipeline's effect, without the pipeline)
    val seeder = new TroughEngine(spark,
      new SegmentStore(spark, coldRoot), new SchemaRegistry)
    seeder.schemas.put("att-cold", "CREATE TABLE s (k INTEGER);")
    seeder.provisionWritable("cold-att", "att-cold")
    seeder.write("cold-att", "INSERT INTO s VALUES (1);")
    val eng = new TroughEngine(spark,
      new SegmentStore(spark, hotRoot, Some(coldRoot), _.startsWith("cold")),
      new SchemaRegistry)
    eng.schemas.put("att-main", mainSchema)
    eng.provisionWritable("att-cold-main", "att-main")
    // reading the cold attached segment is fine
    eng.write("att-cold-main",
      "ATTACH 'cold-att' AS a; INSERT INTO t SELECT k, 'c' FROM a.s;")
    val vs = eng.read("att-cold-main", "SELECT v FROM t")
      .collect().map(_.getString(0)).toSeq
    assert(vs == Seq("c"), vs.toString)
    // writing INTO it refuses with the engine's cold-storage contract
    val e = intercept[Exception](eng.write("att-cold-main",
      "ATTACH 'cold-att' AS a; INSERT INTO a.s VALUES (2);"))
    assert(e.getMessage.contains("cold storage (read-only)"), e.getMessage)
    // ...and the refused script left neither side changed (atomic)
    assert(eng.read("cold-att", "SELECT k FROM s").collect().length == 1)
  }

  test("a trigger body reading sqlite_master resolves during a plain DML (r18)") {
    val (id, db) = pair(mainSchema + "CREATE TABLE mlog (name TEXT);")
    // persist the catalog-reading trigger first, in its own script
    runBoth(id, db,
      "CREATE TRIGGER t_cat AFTER INSERT ON t BEGIN " +
        "INSERT INTO mlog SELECT name FROM sqlite_master " +
        "WHERE type = 'table' AND name <> 'mlog'; END;")
    // the outer INSERT never mentions the catalog; only the trigger does
    runBoth(id, db, "INSERT INTO t VALUES (1, 'x');")
    same(id, db.toString, "SELECT name FROM mlog ORDER BY name;")
    same(id, db.toString, "SELECT id, v FROM t;")
  }
}
