package graft.engine

import scala.collection.concurrent.TrieMap

/** Named-schema registry — reference `class Schema` + registry ops
  * (trough/sync.py:152-173, 370-388) and validation
  * (`validate_schema_sql`, sync.py:749-756: run candidate DDL against an
  * empty :memory: SQLite; any error ⇒ reject).
  *
  * Here validation = parse every statement through the SQLite-DDL
  * translator (CREATE TABLE) or accept CREATE INDEX; anything else is
  * rejected the way a bad script would be. The `'default'` schema is the
  * empty string (sync.py:159-164). Schema ids must match the reference's
  * id discipline (segment_manager rejects ids that aren't simple tokens).
  */
class SchemaRegistry {
  private val schemas = TrieMap[String, String]("default" -> "")

  private val idRe = "^[a-zA-Z0-9_-]+$".r

  final case class ValidationError(message: String) extends Exception(message)

  /** Validate candidate schema DDL; returns error message or None. */
  def validate(sql: String): Option[String] = {
    try {
      SqlScript.split(sql).foreach { stmt =>
        SqlScript.firstWord(stmt) match {
          case "CREATE" if stmt.toUpperCase.matches("(?s)\\s*CREATE\\s+(UNIQUE\\s+)?INDEX.*") => ()
          case "CREATE" if stmt.toUpperCase.matches("(?s)\\s*CREATE\\s+(TEMP\\w*\\s+)?VIEW.*") =>
            SqliteDdl.parseCreateView(stmt) // throws if unparseable
          case "CREATE" if stmt.toUpperCase.matches("(?s)\\s*CREATE\\s+VIRTUAL\\s+TABLE.*") =>
            // throws named refusals / parse errors; fts5 returns Some,
            // rtree/rtree_i32 return None and validate via Rtree (r15)
            if (Fts5.parseCreateVirtual(stmt).isEmpty)
              Rtree.parseCreateVirtual(stmt).getOrElse(
                throw ValidationError(
                  s"cannot parse CREATE VIRTUAL TABLE statement: $stmt"))
          case "CREATE" => SqliteDdl.parseCreateTable(stmt) // throws if unparseable
          case other =>
            throw ValidationError(s"schema sql must contain only DDL statements, got: $other")
        }
      }
      None
    } catch { case e: Exception => Some(e.getMessage) }
  }

  /** Register (create or overwrite) a schema. Invalid id or sql throws
    * ValidationError — the engine's analog of the reference API's 400s
    * (wsgi/segment_manager.py:76-114). */
  def put(id: String, sql: String): Unit = {
    if (idRe.findFirstIn(id).isEmpty)
      throw ValidationError(s"schema id must match ${idRe.regex}: $id")
    validate(sql).foreach(msg => throw ValidationError(msg))
    schemas(id) = sql
  }

  def get(id: String): Option[String] = schemas.get(id)

  def list(): Seq[String] = schemas.keys.toSeq.sorted

  def delete(id: String): Unit = {
    require(id != "default", "cannot delete the default schema")
    schemas.remove(id)
  }
}
