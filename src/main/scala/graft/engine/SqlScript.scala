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
    * block comments. A `CREATE TRIGGER … BEGIN …; …; END` statement
    * stays ONE statement: its body semicolons don't split until the
    * trigger's own END (CASE…END pairs inside the body tracked, so a
    * CASE's END can't close the trigger early — SQLite's parser rule,
    * re-implemented as the same token scan sqlite3's `.read` does). */
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
            case ';' if triggerNeedsMore(cur) => cur.append(c); i += 1
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


  /** Is `cur` an unfinished CREATE TRIGGER statement — i.e. its
    * BEGIN…END body hasn't reached the trigger's own END yet? Called
    * at each candidate split point; scripts are small (HTTP writes),
    * so the re-scan stays cheap. Quote-aware word scan; CASE
    * increments and END decrements a depth counter so only the
    * depth-0 END terminates the trigger. */
  private def triggerNeedsMore(cur: StringBuilder): Boolean = {
    val s = cur.toString
    val words = new ArrayBuffer[String](8)
    var i = 0; val n = s.length
    var quote: Char = 0
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote || (quote == ']' && c == ']')) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '[' => quote = ']'; i += 1
        case ch if ch.isLetter || ch == '_' =>
          var e = i
          while (e < n && (s.charAt(e).isLetterOrDigit || s.charAt(e) == '_')) e += 1
          words += s.substring(i, e).toLowerCase
          i = e
        case _ => i += 1
      }
    }
    val isTrigger = words.length >= 2 && words(0) == "create" &&
      (words(1) == "trigger" ||
        ((words(1) == "temp" || words(1) == "temporary") &&
          words.length >= 3 && words(2) == "trigger"))
    if (!isTrigger) return false
    val beginAt = words.indexOf("begin")
    if (beginAt < 0) return false // malformed; let the parser refuse it
    var depth = 0
    var k = beginAt + 1
    while (k < words.length) {
      words(k) match {
        case "case" => depth += 1
        case "end" => if (depth > 0) depth -= 1 else return false // trigger closed
        case _ => ()
      }
      k += 1
    }
    true
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
