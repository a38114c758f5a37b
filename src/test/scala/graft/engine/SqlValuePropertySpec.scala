package graft.engine

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.TroughFunctions

/** ScalaCheck properties for the two byte-compatibility surfaces SURVEY
  * §5 calls out: `sql_value` literal rendering/templating (reference
  * trough/client.py:110-131, 237-240) and REGEXP's null/error semantics
  * (trough/sync.py:41-49). */
object SqlValuePropertySpec extends Properties("SqlValue/REGEXP") {

  // --------------------------------------------------------- sql_value

  property("string rendering quotes and doubles single quotes only") =
    Prop.forAll { (s: String) =>
      val r = SqlValue.render(s)
      r.head == '\'' && r.last == '\'' &&
        r.substring(1, r.length - 1) == s.replace("'", "''")
    }

  property("string rendering round-trips through SQL unquoting") =
    Prop.forAll { (s: String) =>
      val r = SqlValue.render(s)
      r.substring(1, r.length - 1).replace("''", "'") == s
    }

  property("integers and doubles render as themselves") =
    Prop.forAll { (i: Long, d: Double) =>
      SqlValue.render(i) == i.toString && SqlValue.render(d) == d.toString
    }

  property("booleans render as SQLite ints (client.py:117)") =
    Prop(SqlValue.render(true) == "1" && SqlValue.render(false) == "0")

  property("null renders as unquoted null") =
    Prop(SqlValue.render(null) == "null" && SqlValue.render(None) == "null")

  property("datetimes render as datetime('<iso>') calls (client.py:114-115)") =
    Prop.forAll(Gen.choose(0L, 4102444800L)) { epochSec =>
      // python isoformat() always includes seconds — '2024-01-01T12:00:00'
      // even for whole-minute values (Java toString would drop ':00')
      val dt = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
      val expected = dt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
      SqlValue.render(dt) == s"datetime('$expected')"
    }

  property("sub-second datetimes render microseconds, 6 digits (isoformat)") = Prop {
    val dt = java.time.LocalDateTime.of(2024, 1, 1, 12, 0, 0, 1230000)
    SqlValue.render(dt) == "datetime('2024-01-01T12:00:00.001230')"
  }

  property("template substitutes each %s positionally, %% escapes") =
    Prop.forAll(Gen.listOfN(3, Gen.alphaNumStr)) { params =>
      val out = SqlValue.template(
        "SELECT %s, %s WHERE x = %s AND pct = '100%%'", params)
      params.forall(p => out.contains(SqlValue.render(p))) &&
        out.contains("pct = '100%'")
    }

  property("template arity mismatches throw") = Prop.forAll(Gen.alphaNumStr) { s =>
    Prop.throws(classOf[IllegalArgumentException])(
      SqlValue.template("%s %s", Seq(s))) &&
      Prop.throws(classOf[IllegalArgumentException])(
        SqlValue.template("%s", Seq(s, s)))
  }

  // ------------------------------------------------------------ REGEXP

  property("REGEXP: null item is false for every pattern, even invalid ones") =
    Prop.forAll(Gen.oneOf("a", ".*", "[", "(unclosed", "\\")) { pat =>
      !TroughFunctions.regexp(pat, null)
    }

  property("REGEXP: literal alphanumeric pattern ≡ substring containment") =
    Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (pat, item) =>
      TroughFunctions.regexp(java.util.regex.Pattern.quote(pat), item) ==
        item.contains(pat)
    }

  property("REGEXP: unanchored search semantics (re.search, not re.match)") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      TroughFunctions.regexp(java.util.regex.Pattern.quote(s), s"prefix${s}suffix")
    }

  property("REGEXP: invalid pattern with non-null item throws") =
    Prop.forAll(Gen.alphaNumStr) { item =>
      Prop.throws(classOf[java.util.regex.PatternSyntaxException])(
        TroughFunctions.regexp("[", item))
    }
}
