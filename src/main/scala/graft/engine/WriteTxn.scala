package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import graft.engine.SegmentStore.TableMeta

/** One write script = one transaction (reference trough/write.py:33-40
  * wraps the whole script in BEGIN TRANSACTION…COMMIT).
  *
  * Statements mutate a *staged* working set of DataFrames; nothing
  * touches storage until [[commit]], which rewrites each dirty table via
  * the store's atomic directory swap. A failed statement aborts the whole
  * script with no storage change — the same all-or-nothing contract as
  * the reference, without SQLite's journal.
  *
  * Statement coverage = what the reference ecosystem actually executes
  * (SURVEY §7.4 risk 2): CREATE TABLE / CREATE INDEX / DROP / ALTER,
  * INSERT [OR REPLACE|IGNORE] (VALUES and SELECT forms), UPDATE (incl.
  * BUILDREDIRECTARRAY upserts), DELETE, BEGIN/COMMIT no-ops. TRIGGERs are
  * rejected (unused in the reference's schemas/tests; SURVEY §2.B).
  *
  * Known dialect deviation: expressions here parse on the base session,
  * where double quotes are string literals (matching the reference
  * test's `VALUES ("test")`); a double-quoted *identifier* in a write
  * WHERE clause (`WHERE "a" = 'x'` — valid SQLite when column a exists)
  * therefore compares two literals. SQLite's identifier-if-resolvable
  * fallback is lookup-dependent and can't be emulated at parse time;
  * use unquoted or backtick identifiers in write predicates.
  */
private[engine] class WriteTxn(engine: TroughEngine, segmentId: String) {
  // the engine-owned write session: SQLite function names registered,
  // double-quoted identifiers off (VALUES byte-shape), and none of it
  // leaking onto the shared parent session
  private val spark: SparkSession = engine.writeSession
  private val store = engine.store

  /** Parse a scalar expression with the SQLite operator dialect applied
    * (ASCII-nocase LIKE, integer `/`, infix GLOB) — write predicates and
    * SET clauses go through the same SQLite contract as reads. */
  private def dexpr(s: String): Column = SqliteDialect.expr(spark, s)
  /** WHERE/CHECK positions: boolean-typed, SQLite truthiness for
    * value-shaped conditions (`WHERE 1`). */
  private def dpred(s: String): Column = SqliteDialect.predicate(spark, s)

  private val working = mutable.LinkedHashMap[String, (TableMeta, DataFrame)]()
  private val dirty = mutable.LinkedHashSet[String]()
  private val created = mutable.LinkedHashSet[String]()
  private val dropped = mutable.LinkedHashSet[String]()

  // staged view registry: loaded lazily, mutated by CREATE/DROP VIEW,
  // persisted at commit — same all-or-nothing contract as table state
  private val stagedViews = mutable.LinkedHashMap[String, SqliteDdl.ViewDef]()
  private var viewsLoaded = false
  private var viewsDirty = false
  private def ensureViews(): Unit = if (!viewsLoaded) {
    store.views(segmentId).foreach(v => stagedViews(v.name.toLowerCase) = v)
    viewsLoaded = true
  }
  private def isView(name: String): Boolean = {
    ensureViews(); stagedViews.contains(name.toLowerCase)
  }

  /** Nested-transaction points (SQLite SAVEPOINT, lang_savepoint.html):
    * every element of staged state is an immutable value or a
    * DataFrame (itself immutable), so a savepoint is a cheap shallow
    * copy of the collections and rollback is a swap-back. The stack
    * allows repeated names; RELEASE and ROLLBACK TO address the most
    * recent match, exactly as SQLite does. */
  private final case class TxnSnapshot(
      working: Seq[(String, (TableMeta, DataFrame))],
      dirty: Seq[String], created: Seq[String], dropped: Seq[String],
      viewsLoaded: Boolean, stagedViews: Seq[(String, SqliteDdl.ViewDef)],
      viewsDirty: Boolean)
  private var savepoints = List.empty[(String, TxnSnapshot)]
  private def snapshot(): TxnSnapshot = TxnSnapshot(
    working.toSeq, dirty.toSeq, created.toSeq, dropped.toSeq,
    viewsLoaded, stagedViews.toSeq, viewsDirty)
  private def restore(t: TxnSnapshot): Unit = {
    working.clear(); working ++= t.working
    dirty.clear(); dirty ++= t.dirty
    created.clear(); created ++= t.created
    dropped.clear(); dropped ++= t.dropped
    viewsLoaded = t.viewsLoaded; viewsDirty = t.viewsDirty
    stagedViews.clear(); stagedViews ++= t.stagedViews
  }

  private def tableNames: Seq[String] =
    (store.tables(segmentId).filterNot(dropped.contains) ++ created).distinct

  private def load(table: String): (TableMeta, DataFrame) =
    working.getOrElseUpdate(table, {
      if (dropped.contains(table) || !store.tableExists(segmentId, table)) {
        if (isView(table))
          throw new IllegalArgumentException(
            s"cannot modify $table because it is a view")
        throw new IllegalArgumentException(s"no such table: $table")
      }
      val meta = store.tableMeta(segmentId, table)
      // bound into the write session: expressions referencing SQLite
      // function names must resolve where SqliteCompat is registered
      (meta, store.loadTable(segmentId, table, spark))
    })

  private def stage(table: String, meta: TableMeta, df: DataFrame): Unit = {
    // reject reserved columns at stage time — every CREATE/ALTER path
    // funnels through here, and commit-phase failures are the wrong
    // place to discover a schema problem
    SegmentStore.requireNoReservedColumns(meta)
    working(table) = (meta, df)
    dirty += table
  }

  // ------------------------------------------------------------- dispatch

  private val savepointRe = "(?is)^\\s*SAVEPOINT\\s+(.+?)\\s*;?\\s*$".r
  private val releaseRe = "(?is)^\\s*RELEASE\\s+(?:SAVEPOINT\\s+)?(.+?)\\s*;?\\s*$".r
  private val rollbackToRe =
    "(?is)^\\s*ROLLBACK\\s+(?:TRANSACTION\\s+)?TO\\s+(?:SAVEPOINT\\s+)?(.+?)\\s*;?\\s*$".r

  def execute(stmt: String): Unit = SqlScript.firstWord(stmt) match {
    case "BEGIN" | "COMMIT" | "END" => ()
    case "SAVEPOINT" =>
      val name = SqlScript.unquoteIdent(
        savepointRe.findFirstMatchIn(stmt).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt")).group(1))
      savepoints ::= (name.toLowerCase, snapshot())
    case "RELEASE" =>
      val name = SqlScript.unquoteIdent(
        releaseRe.findFirstMatchIn(stmt).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt")).group(1))
      val at = savepoints.indexWhere(_._1 == name.toLowerCase)
      if (at < 0) // SQLite's exact refusal
        throw new IllegalArgumentException(s"no such savepoint: $name")
      savepoints = savepoints.drop(at + 1) // changes since it are KEPT
    case "ROLLBACK" =>
      rollbackToRe.findFirstMatchIn(stmt) match {
        case Some(m) =>
          val name = SqlScript.unquoteIdent(m.group(1))
          val at = savepoints.indexWhere(_._1 == name.toLowerCase)
          if (at < 0)
            throw new IllegalArgumentException(s"no such savepoint: $name")
          restore(savepoints(at)._2)
          savepoints = savepoints.drop(at) // the savepoint itself survives
        case None =>
          // plain ROLLBACK: discard everything staged so far; later
          // statements run against storage state as a fresh transaction
          restore(TxnSnapshot(Nil, Nil, Nil, Nil,
            viewsLoaded = false, Nil, viewsDirty = false))
          savepoints = Nil
      }
    // the reference write path runs whatever SQLite accepts (write.py:40)
    // and real-world scripts commonly carry PRAGMA lines. Only pragmas
    // that tune SQLite's PHYSICAL layer (no analog over immutable
    // parquet) are no-ops, same treatment as CREATE INDEX; pragmas that
    // change QUERY SEMANTICS (case_sensitive_like would flip LIKE
    // matching under this engine's SQLite-default emulation) must error
    // loudly rather than silently diverge, as must unknown ones.
    case "PRAGMA" =>
      val name = stmt.trim.stripPrefix("PRAGMA").stripPrefix("pragma")
        .trim.takeWhile(c => c != '=' && c != '(' && c != ';' && !c.isWhitespace)
        .toLowerCase
      if (!WriteTxn.physicalPragmas.contains(name))
        throw new UnsupportedOperationException(
          s"PRAGMA $name is not supported: only physical-layer pragmas " +
            "(journal_mode, synchronous, ...) are accepted as no-ops; " +
            "semantics-changing pragmas would silently diverge from SQLite")
    case "CREATE" =>
      val upper = stmt.toUpperCase
      if (upper.matches("(?s)\\s*CREATE\\s+(UNIQUE\\s+)?INDEX.*")) createIndex(stmt)
      else if (upper.matches("(?s)\\s*CREATE\\s+(TEMP\\w*\\s+)?TRIGGER.*"))
        throw new UnsupportedOperationException("TRIGGERs are not supported")
      else if (upper.matches("(?s)\\s*CREATE\\s+(TEMP\\w*\\s+)?VIEW.*"))
        createView(stmt)
      else createTable(stmt)
    case "DROP" =>
      if (stmt.toUpperCase.matches("(?s)\\s*DROP\\s+VIEW.*")) dropView(stmt)
      else dropTable(stmt)
    case "INSERT" | "REPLACE" => insert(stmt)
    case "UPDATE" => update(stmt)
    case "DELETE" => delete(stmt)
    case "ALTER" => alter(stmt)
    case other =>
      throw new UnsupportedOperationException(s"unsupported write statement: $other")
  }

  def commit(): Unit = {
    // force evaluation of every staged plan *before* mutating storage so
    // a bad expression can't leave a half-applied script
    val materialized = dirty.toSeq.map { t =>
      val (meta, df) = working(t)
      (t, meta, df.localCheckpoint(eager = true))
    }
    // constraint gate BEFORE any storage effect: SQLite raises the
    // moment a duplicate key lands and the whole wrapped script rolls
    // back (write.py:36-40); checking each dirty table's final state
    // once here gives the same observable outcome — the script 500s,
    // nothing commits — at one job per table instead of one per
    // statement. (Deviation: a script that creates and then deletes a
    // duplicate passes here where SQLite errored mid-script.)
    materialized.foreach { case (t, meta, df) => enforceUnique(t, meta, df) }
    // Two-phase across ALL storage effects: phase 1 writes EVERY dirty
    // table's parquet to its data_tmp dir (any failure — disk full,
    // codec error — aborts with no visible change, including scripts
    // that DROP and recreate tables); phase 2 is only cheap renames and
    // meta writes. A DROPped-and-reCREATEd table needs no explicit drop:
    // the swap below replaces both its data dir and its meta. New
    // tables need no explicit create: prepare makes the dir, and the
    // swap degenerates to a single data_tmp→data rename + meta write.
    materialized.foreach { case (t, _, df) => store.prepareTableData(segmentId, t, df) }
    materialized.foreach { case (t, meta, _) =>
      store.swapPreparedData(segmentId, t, Some(meta))
    }
    // Explicit drops go LAST: every other phase-2 effect (the swaps) is
    // self-healing after a crash (data_old restore, re-runnable renames),
    // but a dropped table is gone irrecoverably — sequencing the
    // non-healable effect after all healable ones means a crash anywhere
    // in phase 2 leaves either a fully-consistent pre-drop state or only
    // the drops themselves unfinished (re-running just the drops heals).
    dropped.filterNot(created.contains).foreach { t =>
      if (store.tableExists(segmentId, t)) store.dropTable(segmentId, t)
    }
    // view registry last among the healable effects' tail: one cheap
    // file write holding the txn's whole staged set
    if (viewsDirty) store.putViews(segmentId, stagedViews.values.toSeq)
  }

  /** The PRIMARY KEY and every recorded UNIQUE index must hold over the
    * table's post-script state, with SQLite's exact failure text
    * (`UNIQUE constraint failed: t.a, t.b`). Rows with a NULL in any
    * key column never conflict — SQLite's historical PRIMARY-KEY-
    * allows-NULL rule treats each NULL as distinct. Indexes whose
    * columns no longer all exist (dropped/renamed mid-script) are
    * skipped: they can't be evaluated, and export already prunes
    * them. */
  private def enforceUnique(table: String, meta: TableMeta, df: DataFrame): Unit = {
    val fields = meta.schema.fieldNames
    def resolve(cols: Seq[String]): Option[Seq[String]] = {
      val rs = cols.map(c => fields.find(_.equalsIgnoreCase(c)))
      if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
    }
    // NOT NULL first (SQLite reports it before uniqueness for a row
    // violating both), all declared columns in one aggregate job
    val nn = meta.notNull.flatMap(c => fields.find(_.equalsIgnoreCase(c)))
    if (nn.nonEmpty) {
      val counts = df.select(nn.map(c =>
        count(when(col(c).isNull, 1)).as(c)): _*).head()
      nn.zipWithIndex.foreach { case (c, i) =>
        if (counts.getLong(i) > 0) throw new IllegalArgumentException(
          s"NOT NULL constraint failed: $table.$c")
      }
    }
    // CHECK constraints: a row violates only when the expression
    // evaluates to FALSE — NULL passes (SQLite's rule); all checks in
    // one aggregate job, failure labeled as sqlite3 labels it
    if (meta.checks.nonEmpty) {
      val counts = df.select(meta.checks.zipWithIndex.map { case (c, i) =>
        count(when(!coalesce(dpred(c.expr), lit(true)), 1)).as(s"c$i")
      }: _*).head()
      meta.checks.zipWithIndex.foreach { case (c, i) =>
        if (counts.getLong(i) > 0) throw new IllegalArgumentException(
          s"CHECK constraint failed: ${c.label}")
      }
    }
    val keySets =
      (if (meta.primaryKey.nonEmpty) Seq(meta.primaryKey.toSeq) else Nil) ++
        meta.uniques ++
        meta.indexes.filter(_.unique).map(_.columns)
    keySets.distinct.foreach { keys0 =>
      resolve(keys0).foreach { keys =>
        val nonNull = keys.foldLeft(df)((d, k) => d.where(col(k).isNotNull))
        val dup = nonNull.groupBy(keys.map(col): _*).count()
          .where(col("count") > 1).limit(1).count()
        if (dup > 0) throw new IllegalArgumentException(
          s"UNIQUE constraint failed: ${keys.map(k => s"$table.$k").mkString(", ")}")
      }
    }
  }

  // ----------------------------------------------------------------- DDL

  private def createTable(stmt: String): Unit = {
    val td = SqliteDdl.parseCreateTable(stmt)
    if (tableNames.contains(td.name)) {
      if (td.ifNotExists) return
      throw new IllegalStateException(s"table ${td.name} already exists")
    }
    if (isView(td.name)) {
      // IF NOT EXISTS suppresses the error for ANY same-named object
      // (SQLite semantics) but never silently shadows the view
      if (td.ifNotExists) return
      throw new IllegalStateException(s"view ${td.name} already exists")
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], td.schema)
    created += td.name
    stage(td.name, TableMeta(td.schema, td.primaryKey, td.autoIncrement,
      notNull = td.notNull, defaults = td.defaults, uniques = td.uniques,
      checks = td.checks), empty)
  }

  /** Plain CREATE INDEX is recorded in the table's meta inside the
    * transaction (committed with it); non-plain shapes stay no-op
    * hints, same as provision ([[SegmentStore.recordIndex]] semantics
    * against the txn's working set instead of storage). */
  private def createIndex(stmt: String): Unit =
    SqliteDdl.parseCreateIndex(stmt).foreach { ix =>
      // SQLite: "object name reserved for internal use" — an exported
      // sqlite_autoindex_* collision would corrupt the catalog
      if (ix.name.toLowerCase.startsWith("sqlite_"))
        throw new IllegalArgumentException(
          s"object name reserved for internal use: ${ix.name}")
      if (isView(ix.table)) // SQLite's exact refusal
        throw new IllegalArgumentException("views may not be indexed")
      val (meta, df) = load(ix.table) // throws "no such table" like SQLite
      if (meta.indexes.exists(_.name.equalsIgnoreCase(ix.name))) {
        if (!ix.ifNotExists)
          throw new IllegalStateException(s"index ${ix.name} already exists")
      } else if (ix.columns.forall(c => meta.schema.fieldNames.exists(_.equalsIgnoreCase(c))))
        stage(ix.table, meta.copy(indexes = meta.indexes :+ ix), df)
      else throw new IllegalArgumentException(
        s"index ${ix.name} references columns not in table ${ix.table}")
    }

  /** CREATE VIEW stores the statement TEXT (SQLite's own contract:
    * views resolve at query time, so a view over a not-yet-created or
    * since-dropped table is legal to create and errors only when
    * used). Staged like every other DDL effect — a failed script
    * leaves no view behind. */
  private def createView(stmt: String): Unit = {
    val v = SqliteDdl.parseCreateView(stmt)
    if (v.name.toLowerCase.startsWith("sqlite_"))
      throw new IllegalArgumentException(
        s"object name reserved for internal use: ${v.name}")
    if (tableNames.exists(_.equalsIgnoreCase(v.name)))
      throw new IllegalStateException(s"table ${v.name} already exists")
    ensureViews()
    if (stagedViews.contains(v.name.toLowerCase)) {
      if (!v.ifNotExists)
        throw new IllegalStateException(s"view ${v.name} already exists")
    } else {
      stagedViews(v.name.toLowerCase) = v
      viewsDirty = true
    }
  }

  private val dropViewRe = "(?is)^\\s*DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?(.+?)\\s*$".r
  private def dropView(stmt: String): Unit = {
    val m = dropViewRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse: $stmt"))
    val name = SqlScript.unquoteIdent(m.group(2))
    ensureViews()
    if (stagedViews.remove(name.toLowerCase).isDefined) viewsDirty = true
    else if (tableNames.exists(_.equalsIgnoreCase(name)))
      throw new IllegalArgumentException(s"use DROP TABLE to delete table $name")
    else if (m.group(1) == null)
      throw new IllegalArgumentException(s"no such view: $name")
  }

  private val dropRe = "(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?(.+?)\\s*$".r
  private def dropTable(stmt: String): Unit = {
    val m = dropRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse: $stmt"))
    val name = SqlScript.unquoteIdent(m.group(2))
    if (!tableNames.contains(name)) {
      if (isView(name))
        throw new IllegalArgumentException(s"use DROP VIEW to delete view $name")
      if (m.group(1) != null) return
      throw new IllegalArgumentException(s"no such table: $name")
    }
    working.remove(name); dirty -= name; created -= name
    dropped += name
  }

  private val alterAddRe =
    "(?is)^\\s*ALTER\\s+TABLE\\s+(\\S+)\\s+ADD(\\s+COLUMN)?\\s+(.+)$".r
  private val alterRenameRe =
    "(?is)^\\s*ALTER\\s+TABLE\\s+(\\S+)\\s+RENAME\\s+TO\\s+(\\S+)\\s*$".r
  private def alter(stmt: String): Unit = stmt match {
    case alterRenameRe(from, to) =>
      val (meta, df) = load(SqlScript.unquoteIdent(from))
      val target = SqlScript.unquoteIdent(to)
      working.remove(SqlScript.unquoteIdent(from))
      dirty -= SqlScript.unquoteIdent(from)
      dropped += SqlScript.unquoteIdent(from)
      created += target
      // recorded indexes follow the table — SQLite itself rewrites
      // their sqlite_master sql on RENAME; stale `ON oldname` text
      // would make an exported schema malformed to real SQLite
      stage(target, meta.copy(
        indexes = meta.indexes.map(SqliteDdl.retargetIndex(_, target))), df)
    case alterAddRe(table, _, colDef) =>
      val name = SqlScript.unquoteIdent(table)
      val (meta, df) = load(name)
      val parts = colDef.trim.split("\\s+", 2)
      val colName = SqlScript.unquoteIdent(parts(0))
      val tail = if (parts.length > 1) parts(1) else ""
      val colType = SqliteDdl.affinity(tail)
      // SQLite backfills existing rows with the declared DEFAULT (or
      // NULL when absent) — dropping it would silently NULL-fill rows
      // that queries then expect to hold the default
      val upperTail = SqliteDdl.blankLiterals(tail).toUpperCase
      // SQLite's own prepare-time refusals for un-backfillable shapes
      if (upperTail.matches("(?s).*\\bUNIQUE\\b.*"))
        throw new IllegalArgumentException("Cannot add a UNIQUE column")
      if (upperTail.matches("(?s).*\\bPRIMARY\\s+KEY\\b.*"))
        throw new IllegalArgumentException("Cannot add a PRIMARY KEY column")
      val dflt = SqliteDdl.defaultClause(colDef)
      val nn = SqliteDdl.hasNotNull(tail)
      // SQLite's refusal, which since 3.35 applies only when rows exist
      // to backfill (an empty table takes the constraint fine)
      if (nn && dflt.forall(_.equalsIgnoreCase("NULL")) && df.limit(1).count() > 0)
        throw new IllegalArgumentException(
          "Cannot add a NOT NULL column with default value NULL")
      val backfill = dflt match {
        case Some(literal) => dexpr(literal).cast(colType)
        case None => lit(null).cast(colType)
      }
      val newSchema = meta.schema.add(StructField(colName, colType, nullable = true))
      // copy, not re-construct: a fresh TableMeta would silently drop
      // the recorded indexes (and now the constraint/default records)
      stage(name, meta.copy(schema = newSchema,
        notNull = if (nn) meta.notNull :+ colName else meta.notNull,
        defaults = meta.defaults ++ dflt.map(colName -> _)),
        df.withColumn(colName, backfill))
    case _ => throw new IllegalArgumentException(s"cannot parse ALTER statement: $stmt")
  }

  // ----------------------------------------------------------------- DML

  private val insertRe =
    ("(?is)^\\s*(?:INSERT(?:\\s+OR\\s+(REPLACE|IGNORE))?|(REPLACE))\\s+INTO\\s+" +
      "([^\\s(]+)\\s*(?:\\(([^)]*)\\))?\\s*(VALUES\\s*(.*)|SELECT\\b.*|DEFAULT\\s+VALUES\\s*;?\\s*)$").r

  /** A column's DEFAULT as an evaluable dialect expression; the
    * `CURRENT_*` keywords map to their SQLite datetime renderings
    * (lang_createtable.html §3.2 — text in UTC, second precision). */
  private def defaultExpr(meta: TableMeta, field: String): Option[String] =
    meta.defaults.collectFirst { case (c, d) if c.equalsIgnoreCase(field) =>
      d.toUpperCase match {
        case "CURRENT_TIMESTAMP" => "datetime('now')"
        case "CURRENT_DATE" => "date('now')"
        case "CURRENT_TIME" => "time('now')"
        case _ => d
      }
    }

  private def insert(stmt0: String): Unit = {
    val (stmt, upsertClause) = splitOnConflict(stmt0)
    val m = insertRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse INSERT statement: $stmt0"))
    val conflict = Option(m.group(1)).map(_.toUpperCase)
      .orElse(Option(m.group(2)).map(_ => "REPLACE"))
    val table = SqlScript.unquoteIdent(m.group(3))
    var colList = Option(m.group(4)).map(
      s => SqlScript.splitTopLevel(s).map(SqlScript.unquoteIdent))
    val (meta, existing) = load(table)

    val body = m.group(5)
    val incoming: DataFrame =
      if (body.toUpperCase.matches("(?s)DEFAULT\\s+VALUES\\s*;?\\s*")) {
        // INSERT INTO t DEFAULT VALUES: one row, every column its
        // default (the rowid alias auto-assigns through the
        // omitted-column completion below)
        require(colList.isEmpty,
          s"cannot combine a column list with DEFAULT VALUES: $stmt0")
        val cols = meta.schema.fieldNames.toSeq
          .filterNot(f => meta.autoIncrement.exists(_.equalsIgnoreCase(f)))
        colList = Some(cols)
        if (cols.isEmpty) // rowid-alias-only table: a bare one-row frame
          runSelect("SELECT NULL AS __dv").drop("__dv")
        else runSelect("SELECT " + cols.map(c =>
          s"${defaultExpr(meta, c).getOrElse("NULL")} AS `$c`").mkString(", "))
      } else if (body.toUpperCase.startsWith("VALUES")) {
        // Evaluate each tuple as a SELECT so arbitrary expressions work
        // (incl. the client's datetime('<iso>') literals, which are UDF
        // calls and therefore not allowed in Spark inline VALUES tables).
        val tuples = SqlScript.splitTopLevel(m.group(6))
        val targetCols = colList.getOrElse(meta.schema.fieldNames.toSeq)
        val selects = tuples.map { t =>
          val inner = t.trim.stripPrefix("(").stripSuffix(")")
          val exprs = SqlScript.splitTopLevel(inner)
          require(exprs.length == targetCols.length,
            s"INSERT arity mismatch: ${exprs.length} values for ${targetCols.length} columns")
          "SELECT " + exprs.zip(targetCols)
            .map { case (e, c) => s"$e AS `$c`" }.mkString(", ")
        }
        runSelect(selects.mkString(" UNION ALL "))
      } else {
        val df = runSelect(body)
        val targetCols = colList.getOrElse(meta.schema.fieldNames.toSeq)
        require(df.columns.length == targetCols.length,
          s"INSERT arity mismatch: ${df.columns.length} vs ${targetCols.length}")
        df.toDF(targetCols: _*)
      }

    // complete missing columns (declared DEFAULT, else NULL — SQLite's
    // omitted-column rule), then auto-assign the rowid-style column if
    // it was omitted (safe: single writer per segment)
    var full = incoming
    meta.schema.fieldNames
      .filterNot(f => full.columns.exists(_.equalsIgnoreCase(f)))
      .foreach { missing0 =>
        full = full.withColumn(missing0,
          defaultExpr(meta, missing0).map(dexpr).getOrElse(lit(null)))
      }
    meta.autoIncrement.foreach { ai =>
      val aiMissing = colList.exists(cl => !cl.exists(_.equalsIgnoreCase(ai)))
      if (aiMissing) {
        val maxRow = existing.agg(max(col(ai))).head()
        val base = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        full = full.withColumn(ai,
          lit(base) + row_number().over(Window.orderBy(monotonically_increasing_id())))
      }
    }
    val aligned0 = full.select(meta.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val merged = (conflict, upsertClause) match {
      case (Some(_), Some(_)) =>
        // SQLite's grammar rejects the combination too
        throw new IllegalArgumentException(
          s"cannot combine INSERT OR ... with an ON CONFLICT clause: $stmt0")
      case (_, Some(clause)) => applyUpsert(meta, existing, aligned0, clause)
      case (Some("REPLACE"), None) if meta.primaryKey.nonEmpty =>
        val aligned = dedupByArrival(aligned0, meta.primaryKey, keepLast = true)
        existing.join(aligned.select(meta.primaryKey.map(col): _*),
          meta.primaryKey.toSeq, "left_anti").unionByName(aligned)
      case (Some("IGNORE"), None) if meta.primaryKey.nonEmpty =>
        val aligned = dedupByArrival(aligned0, meta.primaryKey, keepLast = false)
        existing.unionByName(
          aligned.join(existing.select(meta.primaryKey.map(col): _*),
            meta.primaryKey.toSeq, "left_anti"))
      case _ => existing.unionByName(aligned0)
    }
    stage(table, meta, merged)
  }

  /** Intra-statement duplicate keys: SQLite's OR REPLACE keeps the LAST
    * occurrence, OR IGNORE (and DO NOTHING) the FIRST — arrival order
    * tracked with a monotonic id (union order for VALUES tuples). */
  private def dedupByArrival(df: DataFrame, keys: Seq[String], keepLast: Boolean): DataFrame = {
    val ord = if (keepLast) col("__seq").desc else col("__seq").asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord)
    df.withColumn("__seq", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__seq", "__rn")
  }

  /** Find the last top-level `ON CONFLICT` (outside quotes/parens) and
    * split the statement there. Returns (insert-part, Some(clause)). */
  private def splitOnConflict(s: String): (String, Option[String]) = {
    var depth = 0; var quote: Char = 0; var i = 0; var at = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'o' | 'O' if depth == 0 &&
            (i == 0 || { val p = s.charAt(i - 1); !p.isLetterOrDigit && p != '_' }) &&
            s.regionMatches(true, i, "ON", 0, 2) =>
          var j = i + 2
          if (j < s.length && s.charAt(j).isWhitespace) {
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            if (s.regionMatches(true, j, "CONFLICT", 0, 8) &&
                (j + 8 == s.length ||
                  { val n = s.charAt(j + 8); !n.isLetterOrDigit && n != '_' }))
              at = i
          }
        case _ => ()
      }
      i += 1
    }
    if (at < 0) (s, None) else (s.substring(0, at), Some(s.substring(at)))
  }

  private val onConflictRe =
    """(?is)^ON\s+CONFLICT\s*(?:\(([^)]*)\))?\s*DO\s+(NOTHING|UPDATE\s+SET\s+(.+))\s*$""".r

  /** The SQLite 3.24 upsert (lang_upsert.html): `ON CONFLICT [(cols)]
    * DO NOTHING | DO UPDATE SET ... [WHERE ...]`. The conflict target
    * must name the PRIMARY KEY or a recorded UNIQUE index (SQLite's own
    * rule, with SQLite's own error text); DO UPDATE's SET/WHERE see the
    * EXISTING row as bare columns and the incoming row as `excluded.*`,
    * evaluated against pre-statement state like UPDATE. Deviation: a
    * statement whose rows conflict with EACH OTHER under DO UPDATE is
    * refused (SQLite folds them one at a time — a batch engine would
    * silently compute something else for accumulator patterns like
    * `SET n = n + excluded.n`). */
  private def applyUpsert(meta: TableMeta, existing: DataFrame,
      aligned0: DataFrame, clause: String): DataFrame = {
    val m = onConflictRe.findFirstMatchIn(clause.trim).getOrElse(
      throw new IllegalArgumentException(s"cannot parse ON CONFLICT clause: $clause"))
    val target = Option(m.group(1)).map(SqlScript.splitTopLevel(_).map(c =>
      // strip per-column COLLATE/direction, as in index/pk parsing
      SqlScript.unquoteIdent(c.trim.split("\\s+").head)))
    val keyCols: Seq[String] = target match {
      case None => meta.primaryKey
      case Some(cols) =>
        val lc = cols.map(_.toLowerCase).toSet
        if (meta.primaryKey.nonEmpty && meta.primaryKey.map(_.toLowerCase).toSet == lc)
          meta.primaryKey
        else meta.indexes.find(ix => ix.unique &&
            ix.columns.map(_.toLowerCase).toSet == lc).map(_.columns)
          .getOrElse(throw new IllegalArgumentException(
            "ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE constraint"))
    }
    val doNothing = m.group(2).equalsIgnoreCase("NOTHING")
    if (doNothing) {
      if (keyCols.isEmpty) existing.unionByName(aligned0) // nothing can conflict
      else {
        val aligned = dedupByArrival(aligned0, keyCols, keepLast = false)
        existing.unionByName(
          aligned.join(existing.select(keyCols.map(col): _*), keyCols.toSeq, "left_anti"))
      }
    } else {
      if (keyCols.isEmpty)
        throw new IllegalArgumentException(
          "ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE constraint")
      val dups = aligned0.groupBy(keyCols.map(col): _*).count()
        .where(col("count") > 1).limit(1).count()
      if (dups > 0)
        throw new UnsupportedOperationException(
          "ON CONFLICT DO UPDATE with rows that conflict with each other in " +
            "one statement is not supported (SQLite folds them one at a time); " +
            "pre-aggregate the inserted rows instead")
      val setBody = m.group(3)
      val whereAt = topLevelWhere(setBody)
      val (setPart, predPart) =
        if (whereAt < 0) (setBody, None)
        else (setBody.substring(0, whereAt), Some(setBody.substring(whereAt + 5)))
      val assignments: Map[String, Column] =
        SqlScript.splitTopLevel(setPart).map { assignment =>
          val eq = topLevelEq(assignment)
          val colName = SqlScript.unquoteIdent(assignment.substring(0, eq).trim)
          val rhs = dexpr(rewriteExcluded(assignment.substring(eq + 1).trim))
          val field = meta.schema.fields.find(_.name.equalsIgnoreCase(colName)).getOrElse(
            throw new IllegalArgumentException(s"no such column: $colName"))
          field.name -> rhs.cast(field.dataType)
        }.toMap
      val pred = predPart.map(p => dpred(rewriteExcluded(p))).getOrElse(lit(true))
      // incoming side renamed __exc_* so bare names stay the EXISTING row
      val exc = aligned0.select(
        (aligned0.columns.map(c => col(c).as(s"__exc_$c")) :+
          lit(true).as("__exc_match")).toSeq: _*)
      val joinCond = keyCols.map(k => col(k) === col(s"__exc_$k")).reduce(_ && _)
      val joined = existing.join(exc, joinCond, "left")
      val hit = col("__exc_match").isNotNull && coalesce(pred, lit(false))
      val updatedExisting = joined.select(meta.schema.fields.map { f =>
        assignments.get(f.name)
          .map(v => when(hit, v).otherwise(col(f.name)).as(f.name))
          .getOrElse(col(f.name))
      }.toSeq: _*)
      val inserts = aligned0.join(
        existing.select(keyCols.map(col): _*), keyCols.toSeq, "left_anti")
      updatedExisting.unionByName(inserts)
    }
  }

  /** Rewrite `excluded.<ident>` references (any SQLite ident quoting) to
    * the join's `__exc_<ident>` columns — quote-aware so text literals
    * mentioning "excluded." survive untouched. */
  private def rewriteExcluded(s: String): String = {
    val out = new StringBuilder
    var i = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { out.append(c); if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; out.append(c); i += 1 }
      else if ((c == 'e' || c == 'E') && s.regionMatches(true, i, "excluded", 0, 8) &&
          (i == 0 || { val p = s.charAt(i - 1); !p.isLetterOrDigit && p != '_' && p != '.' })) {
        var j = i + 8
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '.') {
          j += 1
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          val (name, end) =
            if (j >= s.length) (null, j)
            else s.charAt(j) match {
              case '`' => val e = s.indexOf('`', j + 1); (s.substring(j + 1, e), e + 1)
              case '[' => val e = s.indexOf(']', j + 1); (s.substring(j + 1, e), e + 1)
              case ch if ch.isLetter || ch == '_' =>
                var e = j
                while (e < s.length && (s.charAt(e).isLetterOrDigit || s.charAt(e) == '_')) e += 1
                (s.substring(j, e), e)
              case _ => (null, j)
            }
          if (name == null) { out.append(c); i += 1 }
          else { out.append('`').append("__exc_").append(name).append('`'); i = end }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Index of the last top-level occurrence of ` WHERE ` (case-
    * insensitive, outside quotes and parens), or -1. Last occurrence
    * because SET/DELETE bodies may contain subqueries with their own
    * WHERE; a regex split would also match WHERE inside string
    * literals (`SET note = 'see WHERE docs'`). */
  private def topLevelWhere(s: String): Int = {
    var depth = 0; var quote: Char = 0; var i = 0; var found = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'w' | 'W' if depth == 0 && i + 6 <= s.length &&
            s.substring(i, i + 5).equalsIgnoreCase("where") &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + 5 == s.length || s.charAt(i + 5).isWhitespace) =>
          found = i
        case _ => ()
      }
      i += 1
    }
    found
  }

  private val updateHeadRe = "(?is)^\\s*UPDATE\\s+(\\S+)\\s+SET\\s+(.*)$".r
  private def update(stmt: String): Unit = {
    val m = updateHeadRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse UPDATE statement: $stmt"))
    val table = SqlScript.unquoteIdent(m.group(1))
    val (meta, df) = load(table)
    val body = m.group(2)
    val whereAt = topLevelWhere(body)
    val (setPart, predPart) =
      if (whereAt < 0) (body, None)
      else (body.substring(0, whereAt), Some(body.substring(whereAt + 5)))
    val pred = predPart.map(dpred).getOrElse(lit(true))
    val assignments: Map[String, Column] =
      SqlScript.splitTopLevel(setPart).map { assignment =>
        val eq = topLevelEq(assignment)
        val colName = SqlScript.unquoteIdent(assignment.substring(0, eq).trim)
        val valueExpr = dexpr(assignment.substring(eq + 1).trim)
        val field = meta.schema.fields.find(_.name.equalsIgnoreCase(colName)).getOrElse(
          throw new IllegalArgumentException(s"no such column: $colName"))
        field.name -> valueExpr.cast(field.dataType)
      }.toMap
    // single projection: WHERE and every RHS evaluate against the
    // pre-statement row state (SQLite semantics) — sequential
    // withColumn would let later assignments see earlier ones and
    // re-evaluate the predicate against already-updated columns
    val out = df.select(meta.schema.fields.map { f =>
      assignments.get(f.name)
        .map(v => when(pred, v).otherwise(col(f.name)).as(f.name))
        .getOrElse(col(f.name))
    }.toSeq: _*)
    stage(table, meta, out)
  }

  /** index of the first top-level '=' (not inside quotes/parens, not part
    * of '==', '<=', '>=', '!='). */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' if depth == 0 =>
          val prev = if (i > 0) s.charAt(i - 1) else ' '
          val next = if (i + 1 < s.length) s.charAt(i + 1) else ' '
          if (prev != '<' && prev != '>' && prev != '!' && prev != '=' && next != '=') return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"cannot parse assignment: $s")
  }

  private val deleteHeadRe = "(?is)^\\s*DELETE\\s+FROM\\s+(\\S+)\\s*(.*)$".r
  private def delete(stmt: String): Unit = {
    val m = deleteHeadRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse DELETE statement: $stmt"))
    val table = SqlScript.unquoteIdent(m.group(1))
    val (meta, df) = load(table)
    val rest = m.group(2).trim
    val out =
      if (rest.isEmpty) df.limit(0)
      else {
        require(rest.length > 5 && rest.substring(0, 5).equalsIgnoreCase("where") &&
          rest.charAt(5).isWhitespace, s"cannot parse DELETE statement: $stmt")
        df.where(!coalesce(dpred(rest.substring(6)), lit(false)))
      }
    stage(table, meta, out)
  }

  /** Run a SELECT with the txn's current table state visible as views.
    * View registration happens on the engine session (the staged
    * DataFrames belong to it), guarded by a global mutex; `spark.sql`
    * analyzes (and therefore resolves the views) eagerly, so the views
    * can be dropped again before the mutex is released. */
  private def runSelect(select: String): DataFrame = WriteTxn.selectMutex.synchronized {
    val names = tableNames
    ensureViews()
    val registeredViews = mutable.ArrayBuffer[String]()
    try {
      names.foreach { t =>
        val df = working.get(t).map(_._2).getOrElse(store.loadTable(segmentId, t, spark))
        df.createOrReplaceTempView(t)
      }
      // the txn's views resolve over that table state, in creation
      // order (view-on-view). A dangling view (since-dropped base
      // table) registers nothing and errors only if the SELECT then
      // references it — SQLite's use-time resolution contract.
      stagedViews.values.foreach { v =>
        try {
          SqliteDialect.sql(spark, v.sparkSelect).createOrReplaceTempView(v.name)
          registeredViews += v.name
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      SqliteDialect.sql(spark, select)
    } finally {
      registeredViews.foreach(spark.catalog.dropTempView(_))
      names.foreach(t => spark.catalog.dropTempView(t))
    }
  }
}

private[engine] object WriteTxn {
  val selectMutex = new Object

  /** Pragmas safe to no-op: they tune storage/journaling/caching, none
    * of which exists over parquet. `foreign_keys` is included because
    * this engine never enforces FK constraints anyway (SqliteDdl drops
    * them, documented) — the pragma is moot rather than divergent. */
  val physicalPragmas: Set[String] = Set(
    "journal_mode", "synchronous", "page_size", "cache_size", "temp_store",
    "mmap_size", "wal_autocheckpoint", "wal_checkpoint", "busy_timeout",
    "locking_mode", "secure_delete", "auto_vacuum", "incremental_vacuum",
    "optimize", "analysis_limit", "shrink_memory", "threads",
    "journal_size_limit", "checkpoint_fullfsync", "fullfsync",
    "user_version", "application_id", "foreign_keys")
}
