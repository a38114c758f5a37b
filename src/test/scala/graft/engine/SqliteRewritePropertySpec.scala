package graft.engine

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the textual dialect rewrites (rewriteGlob /
  * rewriteCollate): they run on EVERY read and write statement, so the
  * do-no-harm contract — SQL without the rewritten syntax passes
  * through byte-identical — matters as much as the rewrites themselves. */
object SqliteRewritePropertySpec extends Properties("SqliteDialect rewrites") {

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString + "q" // suffix keeps it off every SQL keyword

  private val strLit: Gen[String] =
    Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '%', '*', '\'')))
      .map(cs => "'" + cs.mkString.replace("'", "''") + "'")

  private val select: Gen[String] =
    for {
      cols <- Gen.nonEmptyListOf(ident).map(_.take(4))
      tbl <- ident
      cmp <- Gen.oneOf("=", "<", ">=", "<>")
      lit <- strLit
      w <- ident
    } yield s"SELECT ${cols.mkString(", ")} FROM $tbl WHERE $w $cmp $lit"

  property("statements without GLOB/COLLATE pass through byte-identical") =
    Prop.forAll(select) { sql =>
      // generated identifiers can collide with the keywords; skip those
      sql.toLowerCase.matches("(?s).*\\b(glob|collate)\\b.*") ||
        (SqliteDialect.rewriteGlob(sql) == sql &&
          SqliteDialect.rewriteCollate(sql) == sql)
    }

  property("GLOB/COLLATE inside string literals never trigger a rewrite") =
    Prop.forAll(ident, ident) { (t, c) =>
      val sql = s"SELECT $c FROM $t WHERE $c = 'a GLOB b COLLATE NOCASE'"
      SqliteDialect.rewriteGlob(sql) == sql && SqliteDialect.rewriteCollate(sql) == sql
    }

  property("rewriteGlob is idempotent and emits the function form") =
    Prop.forAll(ident, ident, strLit) { (t, c, p) =>
      val once = SqliteDialect.rewriteGlob(s"SELECT * FROM $t WHERE $c GLOB $p")
      SqliteDialect.rewriteGlob(once) == once && once.contains(s"glob($p, $c)")
    }

  property("rewriteCollate is idempotent and folds both comparison sides") =
    Prop.forAll(ident, ident, strLit) { (t, c, lit) =>
      val once = SqliteDialect.rewriteCollate(
        s"SELECT * FROM $t WHERE $c COLLATE NOCASE = $lit")
      SqliteDialect.rewriteCollate(once) == once &&
        once.contains(s"ascii_lower($c)") && once.contains(s"ascii_lower($lit)")
    }
}
