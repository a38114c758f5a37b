package graft.engine

import scala.collection.mutable.ArrayBuffer

/** SQL script utilities: statement splitting that respects string
  * literals, quoted identifiers, and comments.
  *
  * The reference write path accepts whole scripts and hands them to
  * `executescript` (trough/write.py:33-40); the read path requires
  * exactly one statement (trough/read.py:58). Splitting is the one piece
  * of SQL-text handling both sides need before Spark's parser takes over.
  */
object SqlScript {

  /** Split a script into trimmed, non-empty statements on top-level `;`.
    * Handles 'single-quoted' (with '' escape), "double-quoted",
    * `backtick`, [bracket] identifiers, -- line comments, and C-style
    * block comments. */
  def split(script: String): Seq[String] = {
    val stmts = ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    val n = if (script == null) 0 else script.length
    var state: Char = 0 // 0 = normal, '\'','"','`',']' = in quote, '-' = line comment, '*' = block comment
    while (i < n) {
      val c = script.charAt(i)
      state match {
        case 0 =>
          c match {
            case ';' => stmts += cur.toString; cur.clear(); i += 1
            case '\'' | '"' | '`' => state = c; cur.append(c); i += 1
            case '[' => state = ']'; cur.append(c); i += 1
            case '-' if i + 1 < n && script.charAt(i + 1) == '-' => state = '-'; i += 2
            case '/' if i + 1 < n && script.charAt(i + 1) == '*' => state = '*'; i += 2
            case _ => cur.append(c); i += 1
          }
        case '\'' | '"' | '`' =>
          if (c == state) {
            // doubled quote inside literal = escape
            if (i + 1 < n && script.charAt(i + 1) == state) { cur.append(c).append(c); i += 2 }
            else { state = 0; cur.append(c); i += 1 }
          } else { cur.append(c); i += 1 }
        case ']' =>
          if (c == ']') state = 0
          cur.append(c); i += 1
        case '-' =>
          if (c == '\n') { state = 0; cur.append(c) }
          i += 1
        case '*' =>
          if (c == '*' && i + 1 < n && script.charAt(i + 1) == '/') { state = 0; i += 2 }
          else i += 1
      }
    }
    stmts += cur.toString
    stmts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** First keyword of a statement, uppercased (dispatch key). */
  def firstWord(stmt: String): String = {
    val m = "^\\s*([A-Za-z]+)".r.findFirstMatchIn(stmt)
    m.map(_.group(1).toUpperCase).getOrElse("")
  }

  /** Strip SQLite identifier quoting: `x`, "x", [x]. */
  def unquoteIdent(s: String): String = {
    val t = s.trim
    // single quotes included: SQLite's documented keyword quirk accepts
    // a 'string' in identifier position as an identifier, and its own
    // shadow-table DDL uses that form (CREATE TABLE 'ft_data'(...))
    if (t.length >= 2 && (
      (t.head == '"' && t.last == '"') || (t.head == '`' && t.last == '`') ||
      (t.head == '\'' && t.last == '\'') || (t.head == '[' && t.last == ']')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split on top-level commas (not inside parens or quotes). */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val parts = ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) { cur.append(quote); i += 1 }
          else quote = 0
        }
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    parts += cur.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
