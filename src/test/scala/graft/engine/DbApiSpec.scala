package graft.engine

import java.nio.file.Files

import graft.SparkSpecBase

/** Behavioral port of the reference's PEP-249-ish `trough.db_api`
  * (db_api.py:17-141): routing, parameter splicing, fetch shapes. */
class DbApiSpec extends SparkSpecBase {

  private lazy val engine = {
    val root = Files.createTempDirectory("graft-dbapi").toString
    new TroughEngine(spark, new SegmentStore(spark, root), new SchemaRegistry)
  }

  private def freshConn(seg: String): DbApi.Connection = {
    engine.provisionWritable(seg)
    DbApi.connect(engine, seg)
  }

  test("execute routes SELECT to read, everything else to write (db_api.py:95-99)") {
    val conn = freshConn("dbapi-route")
    conn.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);")
    conn.execute("INSERT INTO kv (k, v) VALUES (1, 'one'), (2, 'two');")
    val cur = conn.execute("SELECT * FROM kv ORDER BY k;")
    assert(cur.fetchall() == Seq(
      scala.collection.immutable.ListMap("k" -> 1L, "v" -> "one"),
      scala.collection.immutable.ListMap("k" -> 2L, "v" -> "two")))
    // fetchone: first row's VALUES in select-list order (reference shape)
    assert(cur.fetchone() == Seq(1L, "one"))
    assert(cur.fetchmany(1) == cur.fetchall().take(1))
  }

  test("positional %s parameters splice through sql_value (client.py:110-131)") {
    val conn = freshConn("dbapi-params")
    conn.execute("CREATE TABLE t (a INTEGER, b TEXT);")
    val cur = conn.cursor()
    cur.execute("INSERT INTO t (a, b) VALUES (%s, %s);", Seq(7, "it's"))
    cur.execute("SELECT b FROM t WHERE a = %s;", Seq(7))
    assert(cur.fetchone() == Seq("it's")) // quote-doubling round-trips
  }

  test("force='read' overrides routing; write path demands the lock") {
    val conn = freshConn("dbapi-force")
    conn.execute("CREATE TABLE n (x INTEGER);")
    conn.execute("INSERT INTO n (x) VALUES (5);")
    val cur = conn.cursor()
    // a WITH-prefixed query is still a read when forced
    cur.execute("WITH m AS (SELECT max(x) AS mx FROM n) SELECT mx FROM m;",
      force = "read")
    assert(cur.fetchone() == Seq(5L))
    // writes go through the engine's lock check (write.py:55-57 shape)
    engine.releaseWriteLock("dbapi-force")
    val e = intercept[IllegalStateException](
      conn.execute("INSERT INTO n (x) VALUES (6);"))
    assert(e.getMessage.contains("cannot write"))
  }

  test("executemany: single-kind enforcement and one-transaction writes (db_api.py:100-107)") {
    val conn = freshConn("dbapi-many")
    conn.executescript(
      "CREATE TABLE s (i INTEGER PRIMARY KEY, t TEXT); " +
        "INSERT INTO s (i, t) VALUES (1, 'a'); INSERT INTO s (i, t) VALUES (2, 'b');")
    val cur = conn.executemany("SELECT count(*) AS n FROM s; SELECT max(i) AS m FROM s;")
    assert(cur.fetchall() == Seq(scala.collection.immutable.ListMap("m" -> 2L)))
    val e = intercept[IllegalArgumentException](
      conn.executemany("SELECT 1; INSERT INTO s (i, t) VALUES (3, 'c');"))
    assert(e.getMessage.contains("exclusively SELECT or non-SELECT"))
    // the mixed script must not have written anything (checked before run)
    assert(conn.execute("SELECT count(*) AS n FROM s;").fetchone() == Seq(2L))
  }

  test("cursor pulls lazily; fetchall past the cap refuses by name (VERDICT r10)") {
    val conn = freshConn("dbapi-cap")
    conn.execute("CREATE TABLE big (i INTEGER PRIMARY KEY);")
    conn.execute("INSERT INTO big (i) VALUES " +
      (1 to 50).map(i => s"($i)").mkString(", ") + ";")
    val cur = conn.cursor(10)
    cur.execute("SELECT i FROM big ORDER BY i;")
    // prefix fetches work under the cap (and only materialize the
    // prefix — the reference streams from the SQLite cursor the same
    // way, read.py:33-52)
    assert(cur.fetchone() == Seq(1L))
    assert(cur.fetchmany(3).map(_("i")) == Seq(1L, 2L, 3L))
    // a full drain past the cap refuses crisply instead of buffering
    // without bound on the driver
    val e = intercept[IllegalStateException](cur.fetchall())
    assert(e.getMessage.contains("exceeds 10 rows"), e.getMessage)
    // an under-cap result still drains fully
    val cur2 = conn.cursor(10)
    cur2.execute("SELECT i FROM big WHERE i <= 10 ORDER BY i;")
    assert(cur2.fetchall().map(_("i")) == (1L to 10L).toSeq)
  }

  test("commit/close are no-ops; every write request is already atomic") {
    val conn = freshConn("dbapi-noop")
    conn.execute("CREATE TABLE z (x INTEGER);")
    conn.commit()
    conn.close()
    assert(conn.execute("SELECT count(*) AS n FROM z;").fetchone() == Seq(0L))
  }
}
