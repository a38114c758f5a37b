package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 full-text search, Spark-first (round 11; closes the last
  * queryable-surface gap VERDICT r10 ranked #1).
  *
  * The reference delegates `CREATE VIRTUAL TABLE … USING fts5` and
  * infix `MATCH` wholesale to whatever libsqlite3 ships
  * (trough/read.py:63-67, write.py:40). This engine re-expresses the
  * searchable subset natively:
  *
  *  - the virtual table's storage IS a plain all-TEXT backing table
  *    (fts5 columns are typeless); DML rides the ordinary write path;
  *  - `MATCH` compiles — textually, before the read gate parses — to a
  *    boolean predicate over per-column token arrays produced by the
  *    codegen'd [[Fts5Tokens]] expression (unicode61 semantics: Unicode
  *    alphanumeric runs, case-folded, diacritics stripped);
  *  - phrase/prefix/AND/OR/NOT/column-filter query syntax is parsed by
  *    [[Fts5.parseQuery]] with sqlite's operator precedence
  *    (differentially probed);
  *  - sqlite_master serves the original CREATE VIRTUAL TABLE text with
  *    rootpage 0, exactly like real SQLite.
  *
  * Scale shape: matching is a stateless scan predicate inside
  * whole-stage codegen — no shuffle, no index build; at trough's
  * per-segment sizes (the reference serves per-segment reads) a scan
  * beats maintaining an inverted index per write. r11 extensions:
  * initial-token `^` anchors, NEAR() groups (probed instance-spread
  * model: max chosen start − min chosen end ≤ N + 1, order-free,
  * default N=10, single-phrase NEAR ≡ plain match), and the fts5 options whose
  * semantics a scan reproduces exactly — tokenize='unicode61
  * [remove_diacritics 1]' (the built-in default), prefix= (an
  * index-layout hint; results identical), detail=full, columnsize=
  * (feeds only bm25's defaults), and bm25()/rank relevance scoring —
  * the probed BM25 formula (k1=1.2 b=0.75, idf floored at 1e-6,
  * weights scaling tf only, NEAR-trimmed poslists, satisfied-branch
  * gating) literal-folds corpus statistics from one aggregate job into
  * a codegen'd [[Fts5Bm25]] expression. Tokenizers: unicode61 (the
  * default), porter over it (r12, [[Porter]]), and trigram with
  * case_sensitive/remove_diacritics (r13 — substring-match semantics,
  * every 3-codepoint window a token). Documented deviations:
  * content=/detail=none|column and the ascii tokenizer refuse by
  * name; shadow tables are not cataloged (the backing table replaces
  * them); bm25()/rank/highlight/snippet under multiple MATCHes work
  * when every clause is a top-level AND conjunct (≡ the AND-combined
  * single query, probed r16) and refuse otherwise (plan-dependent in
  * real fts5).
  */
object Fts5 {

  // ------------------------------------------------------- tokenizer

  /** Full tokenizer configuration (r14 — replaces the packed int of
    * r11-r13 so `tokenchars`/`separators`/`categories` arguments and
    * the `ascii` tokenizer fit). Threaded into the codegen'd
    * expressions ([[Fts5Tokens]], [[Fts5AuxText]]) as a reference
    * object; serialized into compiled SQL fragments via [[Tok.spec]]
    * (a compact hex-escaped literal, parsed back by [[Tok.parse]]).
    *
    *  - `base`: 0 = unicode61, 1 = ascii, 2 = trigram
    *  - `stem`: porter stemming over the base tokenizer's output
    *    (probed: `porter`, `porter ascii`, `porter trigram` all legal)
    *  - `rd`: remove_diacritics 0|1|2 (unicode61 default 1, trigram
    *    default 0; 1 and 2 probed identical on this engine's surface;
    *    meaningless for ascii — a constructor error there)
    *  - `cs`: trigram case_sensitive
    *  - `tokenchars`/`separators`: extra token/separator codepoints,
    *    checked on the RAW codepoint before folding (probed:
    *    `separators 'Q'` does not split `q`); separators win when a
    *    char is listed in both (probed)
    *  - `catMask`: unicode61 token-char Unicode categories as a bitmask
    *    over `Character.getType` values (default L* N* Co — probed:
    *    `²`(No) and `Ⅳ`(Nl) are token chars; Mn, Mc, S, P, Cf are
    *    separators) */
  final case class Tok(base: Int, stem: Boolean = false, rd: Int = 1,
      cs: Boolean = false, tokenchars: String = "", separators: String = "",
      catMask: Int = Tok.DefaultCats) {
    def isTrigram: Boolean = base == Tok.BaseTrigram
    /** Compact SQL-literal-safe encoding ([a-z0-9;=+*] only). */
    def spec: String = {
      val b = new StringBuilder(base match {
        case Tok.BaseU61 => "u61"
        case Tok.BaseAscii => "ascii"
        case _ => "tri"
      })
      if (stem) b.append("+stem")
      val rdDefault = if (isTrigram) 0 else 1
      if (rd != rdDefault) b.append(";rd=").append(rd)
      if (cs) b.append(";cs=1")
      if (tokenchars.nonEmpty) b.append(";tc=").append(Tok.hex(tokenchars))
      if (separators.nonEmpty) b.append(";sep=").append(Tok.hex(separators))
      if (catMask != Tok.DefaultCats) b.append(";cat=").append(catMask)
      b.toString
    }
  }

  object Tok {
    val BaseU61 = 0
    val BaseAscii = 1
    val BaseTrigram = 2
    /** L* N* Co as a Character.getType bitmask (fts5's unicode61
      * default token categories). */
    val DefaultCats: Int =
      (1 << Character.UPPERCASE_LETTER) | (1 << Character.LOWERCASE_LETTER) |
      (1 << Character.TITLECASE_LETTER) | (1 << Character.MODIFIER_LETTER) |
      (1 << Character.OTHER_LETTER) | (1 << Character.DECIMAL_DIGIT_NUMBER) |
      (1 << Character.LETTER_NUMBER) | (1 << Character.OTHER_NUMBER) |
      (1 << Character.PRIVATE_USE)
    /** The default tokenizer: unicode61 remove_diacritics 1. */
    val u61: Tok = Tok(BaseU61)
    /** Map one Unicode general-category name to its Character.getType
      * value; -1 when unknown. */
    def catOf(name: String): Int = name match {
      case "Lu" => Character.UPPERCASE_LETTER
      case "Ll" => Character.LOWERCASE_LETTER
      case "Lt" => Character.TITLECASE_LETTER
      case "Lm" => Character.MODIFIER_LETTER
      case "Lo" => Character.OTHER_LETTER
      case "Mn" => Character.NON_SPACING_MARK
      case "Mc" => Character.COMBINING_SPACING_MARK
      case "Me" => Character.ENCLOSING_MARK
      case "Nd" => Character.DECIMAL_DIGIT_NUMBER
      case "Nl" => Character.LETTER_NUMBER
      case "No" => Character.OTHER_NUMBER
      case "Pc" => Character.CONNECTOR_PUNCTUATION
      case "Pd" => Character.DASH_PUNCTUATION
      case "Ps" => Character.START_PUNCTUATION
      case "Pe" => Character.END_PUNCTUATION
      case "Pi" => Character.INITIAL_QUOTE_PUNCTUATION
      case "Pf" => Character.FINAL_QUOTE_PUNCTUATION
      case "Po" => Character.OTHER_PUNCTUATION
      case "Sm" => Character.MATH_SYMBOL
      case "Sc" => Character.CURRENCY_SYMBOL
      case "Sk" => Character.MODIFIER_SYMBOL
      case "So" => Character.OTHER_SYMBOL
      case "Zs" => Character.SPACE_SEPARATOR
      case "Zl" => Character.LINE_SEPARATOR
      case "Zp" => Character.PARAGRAPH_SEPARATOR
      case "Cc" => Character.CONTROL
      case "Cf" => Character.FORMAT
      case "Co" => Character.PRIVATE_USE
      case "Cs" => Character.SURROGATE
      case "Cn" => Character.UNASSIGNED
      case _ => -1
    }
    private val allCatNames = Seq("Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc",
      "Me", "Nd", "Nl", "No", "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po",
      "Sm", "Sc", "Sk", "So", "Zs", "Zl", "Zp", "Cc", "Cf", "Co", "Cs", "Cn")
    /** Parse a unicode61 `categories` value ("L* N* Co") to a mask;
      * real fts5's constructor error on anything unknown. */
    def catMaskOf(v: String): Int =
      v.trim.split("\\s+").filter(_.nonEmpty).foldLeft(0) { (m, item) =>
        val cats =
          if (item.length == 2 && item(1) == '*')
            allCatNames.filter(_.startsWith(item.take(1)))
          else if (catOf(item) >= 0) Seq(item)
          else Seq.empty
        if (cats.isEmpty) throw new IllegalArgumentException(
          "error in tokenizer constructor") // real fts5's message
        cats.foldLeft(m)((mm, c) => mm | (1 << catOf(c)))
      }
    private[engine] def hex(s: String): String =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    private def unhex(h: String): String =
      new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        "UTF-8")
    /** The r11-r13 packed-int modes, kept for the SQL surface's
      * backward compatibility (fts5_tokens(col, 0-4)). */
    def fromLegacy(i: Int): Tok = i match {
      case 0 => u61
      case 1 => Tok(BaseU61, stem = true)
      case 2 => Tok(BaseTrigram, rd = 0)
      case 3 => Tok(BaseTrigram, rd = 0, cs = true)
      case 4 => Tok(BaseTrigram, rd = 1)
      case _ => throw new IllegalArgumentException(
        s"fts5_tokens mode must be 0 (unicode61), 1 (porter), 2 (trigram), " +
          s"3 (trigram case_sensitive), 4 (trigram remove_diacritics) or a " +
          s"tokenizer spec string, got $i")
    }
    private val specCache =
      new java.util.concurrent.ConcurrentHashMap[String, Tok]()
    /** Memoized [[parse]] — the per-row codegen path
      * (`Fts5.tokenizeUtf8(s, spec)`). */
    def cached(spec: String): Tok =
      specCache.computeIfAbsent(spec, parse(_))
    /** Inverse of [[Tok.spec]]. */
    def parse(spec: String): Tok = {
      val parts = spec.split(";")
      val (baseStr, stem) = parts.head.split("\\+") match {
        case Array(b) => (b, false)
        case Array(b, "stem") => (b, true)
        case _ => throw new IllegalArgumentException(
          s"bad tokenizer spec: $spec")
      }
      val base = baseStr match {
        case "u61" => BaseU61
        case "ascii" => BaseAscii
        case "tri" => BaseTrigram
        case _ => throw new IllegalArgumentException(
          s"bad tokenizer spec: $spec")
      }
      var t = Tok(base, stem = stem, rd = if (base == BaseTrigram) 0 else 1)
      parts.tail.foreach { kv =>
        kv.split("=", 2) match {
          case Array("rd", v) => t = t.copy(rd = v.toInt)
          case Array("cs", v) => t = t.copy(cs = v == "1")
          case Array("tc", v) => t = t.copy(tokenchars = unhex(v))
          case Array("sep", v) => t = t.copy(separators = unhex(v))
          case Array("cat", v) => t = t.copy(catMask = v.toInt)
          case _ => throw new IllegalArgumentException(
            s"bad tokenizer spec: $spec")
        }
      }
      t
    }
  }

  /** Mode-dispatching tokenization: word tokens (unicode61/ascii,
    * optional porter) or trigram codepoint windows. */
  def tokenize(s: String, tok: Tok): Seq[String] =
    tokenizeWithOffsets(s, tok)._1.toSeq

  /** `prefix=` occurrences of a CREATE VIRTUAL TABLE text, in
    * declaration order (they define exported prefix-index ids 1…);
    * quoted lists hold several lengths, duplicates kept (probed).
    * Shared by the driver-streamed and distributed export paths. */
  private[engine] def prefixLensOf(ddl: String): Seq[Int] =
    "(?i)\\bprefix\\s*=\\s*(?:'([0-9 ]*)'|\"([0-9 ]*)\"|([0-9]+))".r
      .findAllMatchIn(ddl).flatMap { m =>
        Option(m.group(1)).orElse(Option(m.group(2)))
          .orElse(Option(m.group(3))).get.trim.split("\\s+")
          .filter(_.nonEmpty).map(_.toInt)
      }.toSeq

  /** Mode-dispatching [[tokenizeWithOffsets]]. */
  def tokenizeWithOffsets(s: String, tok: Tok)
      : (Array[String], Array[Int], Array[Int]) =
    if (tok.isTrigram) trigramWithOffsets(s, tok)
    else wordWithOffsets(s, tok)

  /** fts5's diacritic combining marks (fts5_unicode2.c
    * sqlite3Fts5UnicodeIsdiacritic, re-probed exhaustively over
    * U+0300–U+036F on the sandbox sqlite3 3.51: marks outside this set
    * — Hebrew points, Thai tone marks, Arabic hamza, even U+0305
    * COMBINING OVERLINE — are NOT removed by remove_diacritics). */
  private val DiaMask0 = 0x08029FDF // U+0300-U+031F
  private val DiaMask1 = 0x000361F8 // U+0320-U+033F
  @inline def isDiaMark(cp: Int): Boolean =
    if (cp < 0x300 || cp > 0x33F) false
    else if (cp < 0x320) (DiaMask0 & (1 << (cp - 0x300))) != 0
    else (DiaMask1 & (1 << (cp - 0x320))) != 0

  /** fts5's simple case fold, one codepoint in, one out
    * (sqlite3Fts5UnicodeFold): Java's codepoint lowercase with the
    * probed divergences pinned — ſ (long s) folds to s (Java keeps
    * it; probed for unicode61 'ſtraße'→'straße' AND trigram at
    * remove_diacritics 0) and final sigma ς folds to σ. The trigram
    * tokenizer additionally keeps U+0130 'İ' itself (probed: trigram
    * 'İxyz' does NOT match 'ixyz') while unicode61 folds it to i
    * (probed: 'İstanbul'→'istanbul'). */
  private def foldCp(cp: Int): Int =
    if (cp == 0x17F) 's'
    else if (cp == 0x3C2) 0x3C3
    else Character.toLowerCase(cp)

  private def triFoldCp(cp: Int): Int =
    if (cp == 0x130) cp else foldCp(cp)

  /** Fold one ALREADY-case-folded codepoint under remove_diacritics:
    * precomposed LATIN letters decompose to their ASCII base when every
    * combining mark of the decomposition is in fts5's diacritic set
    * (probed exhaustively over U+0080–U+2100 + U+212B: Greek ά/ἀ and
    * Cyrillic ё/й do NOT fold — fts5's table covers Latin only — and
    * ǡ (U+01E1, a + dot above + macron) is real fts5's one skipped
    * Latin form). BMP table built once per JVM; supplementary planes
    * have no foldings. */
  private lazy val rdTable: Array[Int] = {
    val t = new Array[Int](0x10000)
    var cp = 0
    while (cp < 0x10000) {
      t(cp) =
        if (cp < 0x80 || cp == 0x1E1 ||
          (cp >= 0xD800 && cp <= 0xDFFF)) cp
        else {
          val s = new String(Character.toChars(cp))
          val nfd = java.text.Normalizer.normalize(
            s, java.text.Normalizer.Form.NFD)
          if (nfd == s) cp
          else {
            val base = foldCp(nfd.codePointAt(0))
            var i = Character.charCount(nfd.codePointAt(0))
            var allDia = true
            while (allDia && i < nfd.length) {
              val m = nfd.codePointAt(i)
              allDia = isDiaMark(m)
              i += Character.charCount(m)
            }
            if (allDia && base >= 'a' && base <= 'z') base else cp
          }
        }
      cp += 1
    }
    t
  }
  @inline private def rmDiacriticCp(cp: Int): Int =
    if (cp < 0x10000) rdTable(cp) else cp

  /** trigram tokenization (fts5.html §4.3.4, probed): every contiguous
    * 3-CODEPOINT window of the text — spaces and punctuation included —
    * case-folded unless `case_sensitive 1`. Texts under 3 codepoints
    * yield no tokens (and query terms under 3 yield the never-matching
    * empty phrase). Offsets address the ORIGINAL string: a token spans
    * from its first codepoint's char index to the char index of the
    * codepoint after its third (so skipped combining marks ride inside
    * the preceding token's span — probed highlight `c[afé] x` over
    * decomposed text under remove_diacritics). */
  def trigramWithOffsets(s: String, tok: Tok)
      : (Array[String], Array[Int], Array[Int]) = {
    val cps = new mutable.ArrayBuffer[Int](s.length)
    val offs = new mutable.ArrayBuffer[Int](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val f =
        if (tok.cs) cp
        else if (tok.rd >= 1) {
          // remove_diacritics (probed identical for 1|2): marks in
          // fts5's diacritic set vanish from the stream; other
          // combining marks stay (Hebrew/Thai/Arabic — ADVICE r13)
          if (isDiaMark(cp)) -1 else rmDiacriticCp(triFoldCp(cp))
        } else triFoldCp(cp)
      if (f >= 0) { cps += f; offs += i }
      i += Character.charCount(cp)
    }
    val m = cps.length
    if (m < 3)
      return (Array.empty[String], Array.emptyIntArray, Array.emptyIntArray)
    val toks = new Array[String](m - 2)
    val starts = new Array[Int](m - 2)
    val ends = new Array[Int](m - 2)
    var k = 0
    while (k < m - 2) {
      val sb = new java.lang.StringBuilder(6)
      sb.appendCodePoint(cps(k)).appendCodePoint(cps(k + 1))
        .appendCodePoint(cps(k + 2))
      toks(k) = if (tok.stem) Porter.stem(sb.toString) else sb.toString
      starts(k) = offs(k)
      ends(k) = if (k + 3 < m) offs(k + 3) else s.length
      k += 1
    }
    (toks, starts, ends)
  }

  /** Word tokenization — unicode61 (fts5.html §4.3.1) and ascii
    * (§4.3.2), plus each token's char span in the ORIGINAL string
    * (highlight()/snippet() insert markers into the raw text, so the
    * offsets must address it, not the folded form). Shared by row
    * tokenization (the [[Fts5Tokens]] expression) and query-term
    * normalization, so both sides always agree.
    *
    * Probed semantics (sandbox sqlite3 3.51 via fts5vocab):
    *  - classification happens on the RAW codepoint: `separators`
    *    first, then `tokenchars`, then — unicode61 — the category
    *    mask (default L* N* Co), with fts5's diacritic combining
    *    marks special-cased: they CONTINUE a run (kept in the token
    *    at remove_diacritics 0, dropped at 1|2) but never start one,
    *    regardless of `categories`; non-diacritic marks (Hebrew
    *    points, Thai tone marks) are plain separators unless Mn/Mc is
    *    in `categories`. ascii: every cp > 127 is a token char, ASCII
    *    alphanumerics too, everything else a separator.
    *  - folding: unicode61 = simple case fold (+ ſ→s, ς→σ, İ→i) then
    *    remove_diacritics on precomposed Latin; ascii folds A-Z only
    *    and never removes diacritics ('Héllo'→'héllo' probed).
    *  - porter stems each finished token. */
  def wordWithOffsets(s: String, t: Tok)
      : (Array[String], Array[Int], Array[Int]) = {
    val toks = mutable.ArrayBuffer[String]()
    val starts = mutable.ArrayBuffer[Int]()
    val ends = mutable.ArrayBuffer[Int]()
    val sb = new java.lang.StringBuilder
    var runStart = -1
    val ascii = t.base == Tok.BaseAscii
    def close(endAt: Int): Unit = if (runStart >= 0) {
      val text = if (t.stem) Porter.stem(sb.toString) else sb.toString
      toks += text
      starts += runStart
      ends += endAt
      sb.setLength(0)
      runStart = -1
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val tokenChar =
        if (t.separators.nonEmpty && t.separators.indexOf(cp) >= 0) false
        else if (t.tokenchars.nonEmpty && t.tokenchars.indexOf(cp) >= 0) true
        else if (ascii) cp > 127 || (cp < 128 && (
          (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9')))
        else if (isDiaMark(cp)) {
          // diacritic marks continue a run but never start one
          if (runStart >= 0 && t.rd == 0) sb.appendCodePoint(cp)
          i += Character.charCount(cp)
          // `continue` via placeholder: skip the shared append/close
          // below by looping from the top
          cp == -1 // never true; value unused past this branch
        } else (t.catMask & (1 << Character.getType(cp))) != 0
      if (!ascii && isDiaMark(cp) &&
        !(t.separators.nonEmpty && t.separators.indexOf(cp) >= 0) &&
        !(t.tokenchars.nonEmpty && t.tokenchars.indexOf(cp) >= 0)) {
        // handled above (run continuation); nothing more to do
      } else if (tokenChar) {
        if (runStart < 0) runStart = i
        val folded =
          if (ascii) { if (cp >= 'A' && cp <= 'Z') cp + 32 else cp }
          else {
            val f = foldCp(cp)
            if (t.rd >= 1) rmDiacriticCp(f) else f
          }
        sb.appendCodePoint(folded)
        i += Character.charCount(cp)
      } else {
        close(i)
        i += Character.charCount(cp)
      }
    }
    close(s.length)
    (toks.toArray, starts.toArray, ends.toArray)
  }

  /** unicode61-default tokenization (the common case — SegmentStore
    * ingest, tests). */
  def tokenize(s: String): Seq[String] = tokenize(s, Tok.u61)

  /** Codegen targets for [[Fts5Tokens]]. */
  def tokenizeUtf8(s: UTF8String): ArrayData = tokenizeUtf8(s, Tok.u61)
  def tokenizeUtf8(s: UTF8String, tok: Tok): ArrayData =
    new GenericArrayData(
      tokenize(s.toString, tok).map(UTF8String.fromString).toArray[Any])
  /** Codegen entry taking the spec string literal ([[Fts5Tokens]]'s
    * doGenCode) — parse memoized, so the per-row cost stays one map
    * lookup. */
  def tokenizeUtf8(s: UTF8String, spec: String): ArrayData =
    tokenizeUtf8(s, Tok.cached(spec))

  /** Per-member PARTICIPATING instance starts of one NEAR group in one
    * column: an instance survives iff it is part of SOME full cluster
    * (max chosen start − min chosen end ≤ n+1) — fts5's poslist
    * trimming, which both bm25 tf and highlight/snippet see. Empty
    * arrays when any member is absent. */
  def nearParticipants(starts: Array[Array[Int]], lens: Array[Int],
      n: Long): Array[Array[Int]] = {
    if (starts.exists(_.isEmpty))
      return starts.map(_ => Array.emptyIntArray)
    val ends = starts.indices.flatMap(mi => starts(mi).map(_ + lens(mi) - 1))
    starts.indices.map { mi =>
      starts(mi).filter { s =>
        val e = s + lens(mi) - 1
        ends.exists { eC =>
          e >= eC && s <= eC + n + 1 && starts.indices.forall { mj =>
            mj == mi || starts(mj).exists(s2 =>
              s2 + lens(mj) - 1 >= eC && s2 <= eC + n + 1)
          }
        }
      }
    }.toArray
  }

  /** Does the phrase (consecutive tokens) match at position `at`, the
    * last token as a prefix when `prefix`? */
  private def phraseAt(toks: ArrayData, at: Int, phrase: ArrayData,
      prefix: Boolean): Boolean = {
    val k = phrase.numElements()
    var j = 0
    var ok = true
    while (ok && j < k) {
      val t = toks.getUTF8String(at + j)
      val p = phrase.getUTF8String(j)
      ok = if (prefix && j == k - 1) t.startsWith(p) else t.equals(p)
      j += 1
    }
    ok
  }

  /** Codegen target for [[Fts5PhraseMatch]]: does `toks` contain the
    * phrase (consecutive tokens)? `flags` bit 0 = trailing-`*` prefix
    * (last token matches as a prefix), bit 1 = `^` anchor (the phrase
    * must start at token 0). A 1-token phrase is a plain term test. */
  def phraseMatch(toks: ArrayData, phrase: ArrayData, flags: Long): Boolean = {
    val prefix = (flags & 1L) != 0L
    val anchored = (flags & 2L) != 0L
    val n = toks.numElements()
    val k = phrase.numElements()
    if (k == 0 || n < k) return false
    if (anchored) return phraseAt(toks, 0, phrase, prefix)
    var i = 0
    while (i <= n - k) {
      if (phraseAt(toks, i, phrase, prefix)) return true
      i += 1
    }
    false
  }

  /** Codegen target for [[Fts5NearMatch]] — fts5 NEAR(p1 p2 …, N)
    * (fts5.html §3.1; rule probed on the sandbox sqlite3 over 2-, 3-
    * and overlapping-phrase corpora): true iff there is a choice of
    * one instance per phrase with
    * `max(instance starts) − min(instance ends) ≤ N + 1` — i.e. the
    * tokens strictly between the earliest chosen END and the latest
    * chosen START number ≤ N. Order-free; contained/overlapping
    * instances give a negative spread and always fit; phrases may
    * carry trailing-`*` prefix flags; `^` refuses at parse (sqlite's
    * own syntax error). Checked by anchoring the candidate min-end at
    * each instance end E and asking every phrase for an instance with
    * `end ≥ E && start ≤ E + N + 1` (the optimum's own min-end is
    * among the candidates, and any accepted E certifies the bound).
    * Per-row work is O(tokens × phrases + inst² × phrases) on tiny
    * per-row instance lists — stateless, inside whole-stage codegen. */
  def nearMatch(toks: ArrayData, phrases: ArrayData, flags: ArrayData,
      n: Long): Boolean = {
    val nt = toks.numElements()
    val k = phrases.numElements()
    if (k == 0) return false
    val starts = new Array[Array[Int]](k)
    val lens = new Array[Int](k)
    var pi = 0
    while (pi < k) {
      val ph = phrases.getArray(pi)
      val prefix = (flags.getInt(pi) & 1) != 0
      val len = ph.numElements()
      if (len == 0 || nt < len) return false
      lens(pi) = len
      val buf = mutable.ArrayBuffer[Int]()
      var i = 0
      while (i <= nt - len) {
        if (phraseAt(toks, i, ph, prefix)) buf += i
        i += 1
      }
      if (buf.isEmpty) return false
      starts(pi) = buf.toArray
      pi += 1
    }
    var ci = 0
    while (ci < k) {
      val cs = starts(ci)
      var ii = 0
      while (ii < cs.length) {
        val e = cs(ii) + lens(ci) - 1 // candidate min-end
        var p = 0
        var ok = true
        while (ok && p < k) {
          val ss = starts(p)
          val len = lens(p)
          var found = false
          var j = 0
          while (!found && j < ss.length) {
            val s = ss(j)
            found = s + len - 1 >= e && s <= e + n + 1
            j += 1
          }
          ok = found
          p += 1
        }
        if (ok) return true
        ii += 1
      }
      ci += 1
    }
    false
  }

  // ------------------------------------------- CREATE VIRTUAL TABLE

  final case class FtsTableDef(name: String, columns: Seq[String],
      ifNotExists: Boolean, sql: String,
      unindexed: Set[String] = Set.empty,
      tok: Tok = Tok.u61,
      detail: String = "full",
      content: Option[String] = None,
      contentRowid: String = "rowid",
      columnsize: Boolean = true,
      /** `contentless_delete=1` (r16): rowid-addressed DELETE/UPDATE
        * allowed on a contentless table; the 'delete' command refuses
        * (probed texts). */
      contentlessDelete: Boolean = false) {
    def porter: Boolean = tok.stem
    /** content='': index only, column reads answer NULL (r15). */
    def contentless: Boolean = content.contains("")
    /** content='other': values live in the named table, looked up by
      * [[contentRowid]]; the fts table stores only the index (r15). */
    def externalContent: Boolean = content.exists(_.nonEmpty)
    /** The fts table stores rowids explicitly (the `__rowid` backing
      * column) — any content= table. */
    def hasRowids: Boolean = content.isDefined
    /** Bitmask of searchable columns (UNINDEXED ones excluded —
      * probed: they store and render but never match, count in no
      * doc length, and column filters over them silently match
      * nothing). */
    def indexedMask: Long = Fts5.indexedMaskOf(columns, unindexed)
  }

  /** The hidden rowid column of content= fts backing tables (r15):
    * real fts5's sync commands and external-content lookups address
    * rows by rowid, so the index state must carry one. */
  val RowidCol = "__rowid"

  /** Hidden read-view columns of content= fts tables (r15). The `#`
    * keeps them out of any identifier a SQLite statement can spell, so
    * only the MATCH/bm25 compilers reach them; the read path drops any
    * that leak through `SELECT *`. */
  def idxCol(c: String): String = s"$c#idx"
  /** Hidden backing view of a content= fts table — a plain identifier
    * (Spark refuses `#` in VIEW names, unlike column names). */
  def idxView(table: String): String =
    s"__fts_idx_${table.toLowerCase(java.util.Locale.ROOT)}"
  def ridCol(tableLower: String): String = s"__rid#$tableLower"
  def isHiddenCol(c: String): Boolean =
    c.endsWith("#idx") || c.startsWith("__rid#")

  /** Bitmask of indexed columns given the declared order. */
  def indexedMaskOf(columns: Seq[String], unindexed: Set[String]): Long =
    columns.zipWithIndex.foldLeft(0L) { case (m, (c, i)) =>
      if (unindexed.contains(c.toLowerCase(java.util.Locale.ROOT))) m
      else m | (1L << i)
    }

  private val createVirtualRe =
    ("(?is)^\\s*CREATE\\s+VIRTUAL\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "(\\S+)\\s+USING\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*;?\\s*$").r

  /** Parse `CREATE VIRTUAL TABLE [IF NOT EXISTS] t USING fts5(a, b)`.
    * None when the statement is not CREATE VIRTUAL TABLE at all;
    * throws the named refusal for non-fts5 modules and for fts5
    * options this subset does not cover. */
  def parseCreateVirtual(stmt: String): Option[FtsTableDef] = {
    val m = createVirtualRe.findFirstMatchIn(stmt).getOrElse(return None)
    val module = m.group(3).toLowerCase(java.util.Locale.ROOT)
    // rtree/rtree_i32 have their own engine analog ([[Rtree]], r15) —
    // hand them back for the caller's dispatch
    if (module == "rtree" || module == "rtree_i32") return None
    if (module != "fts5")
      throw new UnsupportedOperationException(
        s"CREATE VIRTUAL TABLE USING $module is not supported: only the " +
          "fts5 and rtree modules have an engine analog (geopoly and " +
          "other modules are libsqlite3 extensions with no equivalent " +
          "here)")
    val name = SqlScript.unquoteIdent(m.group(2))
    val unindexed = Set.newBuilder[String]
    var tok = Tok.u61
    var detail = "full"
    var content: Option[String] = None
    var contentRowid = "rowid"
    var columnsize = true
    var contentlessDelete = false
    val cols = SqlScript.splitTopLevel(m.group(4)).map(_.trim).flatMap { arg =>
      if (arg.contains("=")) {
        checkOption(arg) match {
          case TokOpt(t) => tok = t
          case DetailOpt(d) => detail = d
          case ContentOpt(c) => content = Some(c)
          case ContentRowidOpt(c) => contentRowid = c
          case ColumnsizeOpt(e) => columnsize = e
          case ContentlessDeleteOpt(e) => contentlessDelete = e
          case NeutralOpt => ()
        }
        None
      }
      else {
        // `col UNINDEXED` (r11): stored and rendered but never
        // searched — probed: MATCH and `col :` filters over it match
        // nothing (no error), its tokens count in no document length
        val bare = "(?i)\\sUNINDEXED\\s*$".r
          .replaceFirstIn(arg, "") match { case b => b.trim }
        val c = SqlScript.unquoteIdent(bare)
        require(c.nonEmpty && !c.exists(ch => ch.isWhitespace),
          s"cannot parse fts5 column: '$arg'")
        if (bare != arg.trim)
          unindexed += c.toLowerCase(java.util.Locale.ROOT)
        Some(c)
      }
    }
    require(cols.nonEmpty, "fts5 table needs at least one column")
    // probed: the option demands content='' (real fts5's own text)
    if (contentlessDelete && !content.contains(""))
      throw new IllegalArgumentException(
        "contentless_delete=1 requires a contentless table")
    Some(FtsTableDef(name, cols, m.group(1) != null,
      stmt.trim.stripSuffix(";").trim, unindexed.result(), tok, detail,
      content, contentRowid, columnsize, contentlessDelete))
  }

  /** Accept exactly the fts5 options a stateless scan reproduces
    * (r11): `tokenize` naming the built-in default (`unicode61`, with
    * or without `remove_diacritics 1`), `prefix=` (a prefix-INDEX
    * layout hint — results are identical with or without it),
    * `detail=full` (the default; none/column restrict phrase queries),
    * and `columnsize=` (feeds only bm25, whose defaults this engine
    * computes from the corpus itself).
    * Everything else keeps the named refusal. */
  private sealed trait FtsOpt
  private final case class TokOpt(tok: Tok) extends FtsOpt
  private final case class ContentlessDeleteOpt(enabled: Boolean) extends FtsOpt
  private final case class DetailOpt(detail: String) extends FtsOpt
  private final case class ContentOpt(table: String) extends FtsOpt
  private final case class ContentRowidOpt(col: String) extends FtsOpt
  private final case class ColumnsizeOpt(enabled: Boolean) extends FtsOpt
  private case object NeutralOpt extends FtsOpt

  /** Validate one `key=value` option; returns the table property it
    * selects (tokenizer mode, detail mode, or nothing observable). */
  private def checkOption(arg: String): FtsOpt = {
    val eq = arg.indexOf('=')
    val key = arg.substring(0, eq).trim.toLowerCase(java.util.Locale.ROOT)
    val v0 = arg.substring(eq + 1).trim
    val v = // strip one level of '…' / "…" quoting (with its escapes)
      if (v0.length >= 2 && v0.head == '\'' && v0.last == '\'')
        v0.substring(1, v0.length - 1).replace("''", "'")
      else if (v0.length >= 2 && v0.head == '"' && v0.last == '"')
        v0.substring(1, v0.length - 1).replace("\"\"", "\"")
      else v0
    def refuse(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"fts5 option '$arg' is not supported: $why")
    key match {
      case "tokenize" =>
        return TokOpt(parseTokenize(v))
      case "prefix" =>
        if (!v.trim.matches("[0-9 ]+"))
          refuse("prefix= takes a list of integer prefix lengths")
        if (v.trim.split("\\s+").exists(p => p.toInt < 1 || p.toInt > 999))
          throw new IllegalArgumentException( // real fts5's message
            "prefix length out of range (max 999)")
      // else: accepted — a prefix index only changes the lookup
      // structure; this engine's scan answers identically without it
      // (and exports build the declared prefix segments)
      case "detail" =>
        // full (default), column, none all accepted (r13): the scan
        // recomputes positions from content, so only the QUERY-SHAPE
        // restrictions are observable — phrase/NEAR/column queries
        // raise real fts5's named errors ([[checkDetail]]); bm25 and
        // highlight/snippet re-derive instances and score identically
        // to detail=full (probed)
        val d = v.trim.toLowerCase(java.util.Locale.ROOT)
        if (d != "full" && d != "column" && d != "none")
          refuse("detail= takes full, column, or none")
        return DetailOpt(d)
      case "columnsize" =>
        if (v.trim != "0" && v.trim != "1")
          refuse("columnsize= takes 0 or 1")
        // accepted — the column-size table only accelerates bm25's
        // document-length lookups; this engine recomputes them. The
        // flag still shapes EXPORT: columnsize=0 files carry no
        // %_docsize shadow (probed — r15)
        return ColumnsizeOpt(v.trim == "1")
      case "content" =>
        // content='' (contentless) and content='other' (external
        // content) — r15. The content table is resolved at READ time
        // like real fts5 (it may be created after the fts table).
        return ContentOpt(v.trim)
      case "content_rowid" =>
        val c = SqlScript.unquoteIdent(v.trim)
        if (c.isEmpty) refuse("content_rowid= needs a column name")
        return ContentRowidOpt(c)
      case "contentless_delete" =>
        if (v.trim != "0" && v.trim != "1")
          refuse("contentless_delete= takes 0 or 1")
        return ContentlessDeleteOpt(v.trim == "1")
      case _ =>
        refuse("this engine covers plain column lists plus the " +
          "semantics-preserving options (tokenize='unicode61'/'ascii'/" +
          "'porter'/'trigram', prefix=, detail=, columnsize=, " +
          "contentless_delete=) and content=/content_rowid= (r15/r16); " +
          "other options have no analog")
    }
    NeutralOpt
  }

  /** Parse a `tokenize=` option value into a [[Tok]]. Components are
    * whitespace-separated, each optionally SQL-quoted (`''` escapes) —
    * real fts5's config splitting. Covers unicode61
    * (remove_diacritics / categories / tokenchars / separators), ascii
    * (tokenchars / separators), trigram (case_sensitive /
    * remove_diacritics) and porter over any of them; anything else
    * raises real fts5's constructor error. */
  def parseTokenize(v: String): Tok = {
    def ctorError(): Nothing =
      throw new IllegalArgumentException("error in tokenizer constructor")
    val parts = mutable.ArrayBuffer[String]()
    var i = 0
    val n = v.length
    while (i < n) {
      val c = v.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new java.lang.StringBuilder
        i += 1
        var closed = false
        while (!closed) {
          if (i >= n) ctorError()
          val ch = v.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && v.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { i += 1; closed = true }
          } else { sb.append(ch); i += 1 }
        }
        parts += sb.toString
      } else {
        var e = i
        while (e < n && !v.charAt(e).isWhitespace) e += 1
        parts += v.substring(i, e)
        i = e
      }
    }
    if (parts.isEmpty) return Tok.u61
    def build(name: String, args: Seq[String], stem: Boolean): Tok = name match {
      case "porter" =>
        // porter wraps a parent tokenizer (default unicode61); the
        // remaining components name the parent and ITS arguments.
        // `porter porter` is legal in real fts5 (probed); a repeated
        // stem collapses to one — porter is a fixpoint on all but
        // pathological tokens.
        if (args.isEmpty) Tok(Tok.BaseU61, stem = true)
        else build(args.head, args.tail, stem = true)
      case "unicode61" | "ascii" | "trigram" =>
        if (args.length % 2 != 0) ctorError()
        var t = name match {
          case "unicode61" => Tok(Tok.BaseU61, stem = stem)
          case "ascii" => Tok(Tok.BaseAscii, stem = stem)
          case _ => Tok(Tok.BaseTrigram, stem = stem, rd = 0)
        }
        args.grouped(2).foreach { case Seq(k, x) =>
          (name, k) match {
            case ("unicode61" | "trigram", "remove_diacritics")
                if x == "0" || x == "1" || x == "2" =>
              t = t.copy(rd = x.toInt)
            case ("trigram", "case_sensitive") if x == "0" || x == "1" =>
              t = t.copy(cs = x == "1")
            // tokenchars/separators accumulate across repeats (fts5
            // honors every occurrence); checked on the RAW codepoint
            case ("unicode61" | "ascii", "tokenchars") =>
              t = t.copy(tokenchars = t.tokenchars + x)
            case ("unicode61" | "ascii", "separators") =>
              t = t.copy(separators = t.separators + x)
            // categories REPLACES the default L* N* Co mask
            case ("unicode61", "categories") =>
              t = t.copy(catMask = Tok.catMaskOf(x))
            case _ => ctorError()
          }
        }
        // probed: trigram case_sensitive 1 with remove_diacritics ≥ 1
        // is real fts5's constructor error
        if (t.isTrigram && t.cs && t.rd >= 1) ctorError()
        t
      case other =>
        throw new IllegalArgumentException(s"no such tokenizer: $other")
    }
    build(parts.head, parts.tail.toSeq, stem = false)
  }

  /** Raise real fts5's query-shape errors for detail=none|column
    * tables (probed, raised at query time by real fts5; at compile
    * here): multi-token and `^`-anchored phrases and NEAR need
    * positions; column filters (`col :` or a column-LHS MATCH) need
    * per-column postings that detail=none drops. */
  def checkDetail(node: Node, detail: String): Unit = {
    if (detail == "full") return
    def err(msg: String): Nothing =
      throw new UnsupportedOperationException(s"fts5: $msg")
    def go(n: Node): Unit = n match {
      case Phrase(ts, _, anchored) =>
        if (ts.length > 1 || anchored)
          err("phrase queries are not supported (detail!=full)")
      case _: NearGroup =>
        err("NEAR queries are not supported (detail!=full)")
      case ColFilter(_, c) =>
        if (detail == "none")
          err("column queries are not supported (detail=none)")
        go(c)
      case AndN(l, r) => go(l); go(r)
      case OrN(l, r) => go(l); go(r)
      case NotN(l, r) => go(l); go(r)
    }
    go(node)
  }

  // ------------------------------------------------- query language

  sealed trait Node
  final case class Phrase(tokens: Seq[String], prefix: Boolean,
      anchored: Boolean = false) extends Node
  /** `NEAR(p1 p2 …, n)` — every phrase inside one `n + Σ len` window. */
  final case class NearGroup(phrases: Seq[Phrase], n: Int) extends Node
  final case class ColFilter(col: String, child: Node) extends Node
  final case class AndN(l: Node, r: Node) extends Node
  final case class OrN(l: Node, r: Node) extends Node
  /** `a NOT b` — documents matching a but not b (fts5 NOT is binary). */
  final case class NotN(l: Node, r: Node) extends Node

  private def syntaxError(detail: String): Nothing =
    throw new IllegalArgumentException(s"fts5: syntax error: $detail")

  /** fts5's bareword characters (fts5_expr.c sqlite3Fts5IsBareword):
    * ASCII alphanumerics, `_`, the U+001A substitute char, and EVERY
    * codepoint ≥ 0x80 — the TOKENIZER then decides what the bareword's
    * text means (a multi-token bareword is a phrase). */
  private def isBarewordCp(cp: Int): Boolean =
    cp == '_' || cp == 0x1a || cp >= 0x80 ||
      (cp >= '0' && cp <= '9') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 'A' && cp <= 'Z')

  /** Parse an fts5 query string (fts5.html §3). Covers: terms, "quoted
    * phrases", trailing-`*` prefixes, `^` initial-token anchors (r11),
    * `NEAR(p1 p2 …, n)` groups (r11; default n=10, single-phrase NEAR
    * ≡ plain match, `^` inside NEAR is sqlite's own syntax error —
    * all probed), explicit AND/OR/NOT (uppercase, as fts5 requires —
    * lowercase spellings are terms; bare `NEAR` without `(` is a term
    * too, probed), implicit AND between adjacent phrases, parentheses,
    * and single-column filters `col : expr`. */
  def parseQuery(q: String, tok: Tok = Tok.u61): Node = {
    // ---- lexer
    sealed trait QTok
    case class Word(w: String) extends QTok
    case class Quoted(s: String) extends QTok
    case object LP extends QTok; case object RP extends QTok
    case object Colon extends QTok; case object Star extends QTok
    case object Caret extends QTok; case object Comma extends QTok
    val toks = mutable.ArrayBuffer[QTok]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { toks += LP; i += 1 }
      else if (c == ')') { toks += RP; i += 1 }
      else if (c == ':') { toks += Colon; i += 1 }
      else if (c == '*') { toks += Star; i += 1 }
      else if (c == '^') { toks += Caret; i += 1 }
      else if (c == ',') { toks += Comma; i += 1 }
      else if (c == '"') {
        val e = q.indexOf('"', i + 1)
        if (e < 0) syntaxError("unterminated string")
        toks += Quoted(q.substring(i + 1, e))
        i = e + 1
      } else if (isBarewordCp(q.codePointAt(i))) {
        var e = i
        while (e < n && isBarewordCp(q.codePointAt(e)))
          e += Character.charCount(q.codePointAt(e))
        toks += Word(q.substring(i, e))
        i = e
      } else syntaxError(s"unexpected character '$c'")
    }
    // ---- parser (precedence probed on sqlite 3.51: OR lowest;
    // AND/NOT one tier, left-associative; implicit AND binds like AND)
    var p = 0
    def peek: Option[QTok] = if (p < toks.length) Some(toks(p)) else None
    def next(): QTok = { val t = toks(p); p += 1; t }
    def phraseOf(text: String, prefix: Boolean,
        anchored: Boolean = false): Phrase = {
      val ts = tokenize(text, tok)
      // trigram: a term under 3 codepoints has no tokens and matches
      // NOTHING (probed: no error — `ab` answers zero rows, `ab OR x`
      // answers x's rows); unicode61/porter keep the syntax error
      if (ts.isEmpty && !tok.isTrigram) syntaxError("empty phrase")
      Phrase(ts, prefix, anchored)
    }
    // one bare phrase operand — a word or quoted string with its
    // optional trailing `*`; `anchored` when a `^` preceded it
    def bare(anchored: Boolean): Phrase = peek match {
      case Some(Word(w)) =>
        next()
        if (peek == Some(Star)) { next(); phraseOf(w, prefix = true, anchored) }
        else phraseOf(w, prefix = false, anchored)
      case Some(Quoted(s)) =>
        next()
        if (peek == Some(Star)) { next(); phraseOf(s, prefix = true, anchored) }
        else phraseOf(s, prefix = false, anchored)
      case other => syntaxError(s"unexpected ${other.getOrElse("end of query")}")
    }
    def nearGroup(): Node = {
      next(); next() // NEAR (
      val phrases = mutable.ArrayBuffer[Phrase]()
      var done = false
      while (!done) peek match {
        case Some(Word(_)) | Some(Quoted(_)) => phrases += bare(anchored = false)
        case Some(Caret) => syntaxError("\"^\"") // sqlite refuses ^ in NEAR
        case _ => done = true
      }
      if (phrases.isEmpty) syntaxError("NEAR() needs at least one phrase")
      val dist = peek match {
        case Some(Comma) =>
          next()
          peek match {
            case Some(Word(d)) if d.nonEmpty && d.forall(_.isDigit) =>
              next(); d.toInt
            case _ => syntaxError("expected an integer after ',' in NEAR()")
          }
        case _ => 10 // fts5's default proximity
      }
      if (peek != Some(RP)) syntaxError("expected ')' in NEAR()")
      next()
      // trigram: empty-token members are IGNORED by the group (probed:
      // `NEAR(ab abc, 3)` answers like plain abc); all-empty = the
      // never-matching empty phrase
      val kept = phrases.filter(_.tokens.nonEmpty).toSeq
      if (kept.isEmpty) Phrase(Nil, prefix = false)
      // probed: single-phrase NEAR answers exactly like the phrase
      else if (kept.length == 1) kept.head
      else NearGroup(kept, dist)
    }
    def unit(): Node = peek match {
      case Some(LP) =>
        next()
        val e = orExpr()
        if (peek != Some(RP)) syntaxError("expected ')'")
        next(); e
      case Some(Word("NEAR")) if toks.lift(p + 1).contains(LP) => nearGroup()
      case Some(Word(op @ ("AND" | "OR" | "NOT"))) =>
        syntaxError(s"$op is an operator, not a term (fts5 reserves the " +
          "uppercase spellings)")
      case Some(Caret) => next(); bare(anchored = true)
      case Some(Word(w)) if toks.lift(p + 1).contains(Colon) =>
        next(); next()
        ColFilter(w, unit())
      case Some(Word(_)) | Some(Quoted(_)) => bare(anchored = false)
      case other => syntaxError(s"unexpected ${other.getOrElse("end of query")}")
    }
    // an implicit-AND CHAIN of adjacent phrases is one operand, bound
    // tighter than explicit AND/NOT (probed: `a NOT b c` answers
    // a NOT (b AND c)); a parenthesized group stands alone — adjacency
    // with anything is a syntax error on both sides (probed)
    //
    // trigram: a chain IGNORES empty-phrase members — `xyz ab` answers
    // like plain xyz while `xyz AND ab` answers nothing (probed; the
    // rule covers `^ab` and `col : ab` members too); an all-empty
    // chain is the never-matching empty phrase
    def isVacuous(nd: Node): Boolean = nd match {
      case Phrase(ts, _, _) => ts.isEmpty
      case ColFilter(_, c) => isVacuous(c)
      case _ => false
    }
    def chain(): Node = {
      val startsParen = peek == Some(LP)
      val units = mutable.ArrayBuffer[Node](unit())
      var done = false
      while (!done) peek match {
        case Some(Word(w)) if w != "AND" && w != "OR" && w != "NOT" =>
          if (startsParen)
            syntaxError("a parenthesized group needs an explicit operator")
          units += unit()
        case Some(Quoted(_)) | Some(Caret) =>
          if (startsParen)
            syntaxError("a parenthesized group needs an explicit operator")
          units += unit()
        case Some(LP) =>
          syntaxError("a parenthesized group needs an explicit operator")
        case _ => done = true
      }
      val kept =
        if (units.length > 1) units.filterNot(isVacuous) else units
      if (kept.isEmpty) Phrase(Nil, prefix = false)
      else kept.reduceLeft(AndN(_, _))
    }
    // AND and NOT share one left-associative tier (probed:
    // `a AND b NOT c` = (a AND b) NOT c, `a NOT b AND c` = (a NOT b) AND c)
    def andExpr(): Node = {
      var l = chain()
      var done = false
      while (!done) peek match {
        case Some(Word("AND")) => next(); l = AndN(l, chain())
        case Some(Word("NOT")) => next(); l = NotN(l, chain())
        case _ => done = true
      }
      l
    }
    def orExpr(): Node = {
      var l = andExpr()
      while (peek == Some(Word("OR"))) { next(); l = OrN(l, andExpr()) }
      l
    }
    val root = orExpr()
    if (p != toks.length) syntaxError("trailing tokens")
    root
  }

  // ------------------------------------------------------- compiler

  /** Compile a parsed query to a Spark-SQL boolean over the fts
    * table's columns. `qualify` renders a column reference in the
    * host statement's namespace (e.g. `` f.`body` `` under alias f).
    * Token literals are pure alphanumerics post-tokenization, so
    * inlining them in single quotes is injection-safe by
    * construction. */
  def compileMatch(node: Node, columns: Seq[String],
      qualify: String => String,
      unindexed: Set[String] = Set.empty,
      tok: Tok = Tok.u61): String = {
    // Tok.spec is [a-z0-9;=+*] only, so the single-quoted literal is
    // injection-safe by construction
    def toksOf(col: String): String =
      if (tok != Tok.u61) s"fts5_tokens(${qualify(col)}, '${tok.spec}')"
      else s"fts5_tokens(${qualify(col)})"
    // fts5_match_phrase is a single codegen'd expression (no lambda
    // HOFs — the dialect's textual JSON-arrow rewrite would mangle
    // `x -> …` before the parser saw it); token literals inline
    // safely; the prefix flag rides as 1/0 (the dialect erases
    // boolean literals to integers, SQLite having no boolean type)
    def flagsOf(prefix: Boolean, anchored: Boolean): Int =
      (if (prefix) 1 else 0) | (if (anchored) 2 else 0)
    def phrasePred(col: String, ph: Phrase): String = {
      val arr = ph.tokens.map(t => s"'$t'").mkString("array(", ", ", ")")
      s"fts5_match_phrase(${toksOf(col)}, $arr, " +
        s"${flagsOf(ph.prefix, ph.anchored)})"
    }
    def nearPred(col: String, g: NearGroup): String = {
      val phrases = g.phrases.map(_.tokens.map(t => s"'$t'")
        .mkString("array(", ", ", ")")).mkString("array(", ", ", ")")
      val flags = g.phrases.map(p => flagsOf(p.prefix, anchored = false))
        .mkString("array(", ", ", ")")
      s"fts5_near(${toksOf(col)}, $phrases, $flags, ${g.n})"
    }
    def go(nd: Node, active: Seq[String]): String = nd match {
      case _: Phrase | _: NearGroup if active.isEmpty =>
        "(1 = 0)" // filter narrowed to an UNINDEXED column (probed)
      case Phrase(ts, _, _) if ts.isEmpty =>
        "(1 = 0)" // trigram term under 3 codepoints (probed: no rows)
      case ph: Phrase =>
        active.map(c => phrasePred(c, ph)).mkString("(", " OR ", ")")
      case g: NearGroup =>
        active.map(c => nearPred(c, g)).mkString("(", " OR ", ")")
      case ColFilter(c, child) =>
        val resolved = columns.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(s"fts5: no such column: $c"))
        go(child, Seq(resolved).filterNot(r =>
          unindexed.contains(r.toLowerCase(java.util.Locale.ROOT))))
      case AndN(l, r) => s"(${go(l, active)} AND ${go(r, active)})"
      case OrN(l, r) => s"(${go(l, active)} OR ${go(r, active)})"
      case NotN(l, r) => s"(${go(l, active)} AND NOT ${go(r, active)})"
    }
    go(node, columns.filterNot(c =>
      unindexed.contains(c.toLowerCase(java.util.Locale.ROOT))))
  }

  /** The MATCH predicate as a COLUMN tree (no function registration
    * needed) — the pipeline-facing entry: full-text filtering over any
    * DataFrame's string columns with fts5 query syntax
    * (SparkEntry q64). `cols` maps lowercased searchable-column names
    * to their Columns; all of them are searched unless the query
    * column-filters. */
  def matchPredicate(query: String,
      cols: Map[String, org.apache.spark.sql.Column],
      unindexed: Set[String] = Set.empty,
      tok: Tok = Tok.u61): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, CreateArray, Literal, Not => CNot, Or => COr}
    val names = cols.keys.toSeq.sorted
    def strArr(ts: Seq[String]): Expression =
      CreateArray(ts.map(t => Literal(UTF8String.fromString(t),
        StringType): Expression))
    def flagsOf(prefix: Boolean, anchored: Boolean): Int =
      (if (prefix) 1 else 0) | (if (anchored) 2 else 0)
    def tokensOf(col: String): Expression =
      Fts5Tokens(org.apache.spark.sql.graft.SqlInternals.expression(cols(col)),
        tok)
    def phrasePred(col: String, ph: Phrase): Expression =
      Fts5PhraseMatch(tokensOf(col), strArr(ph.tokens),
        Literal(flagsOf(ph.prefix, ph.anchored)))
    def nearPred(col: String, g: NearGroup): Expression =
      Fts5NearMatch(tokensOf(col),
        CreateArray(g.phrases.map(p => strArr(p.tokens))),
        CreateArray(g.phrases.map(p =>
          Literal(flagsOf(p.prefix, anchored = false)): Expression)),
        Literal(g.n))
    def go(nd: Node, active: Seq[String]): Expression = nd match {
      case _: Phrase | _: NearGroup if active.isEmpty =>
        Literal(false) // filter narrowed to an UNINDEXED column
      case Phrase(ts, _, _) if ts.isEmpty =>
        Literal(false) // trigram term under 3 codepoints
      case ph: Phrase =>
        active.map(c => phrasePred(c, ph): Expression).reduce(COr(_, _))
      case g: NearGroup =>
        active.map(c => nearPred(c, g): Expression).reduce(COr(_, _))
      case ColFilter(c, child) =>
        val resolved = names.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(s"fts5: no such column: $c"))
        go(child, Seq(resolved).filterNot(r =>
          unindexed.contains(r.toLowerCase(java.util.Locale.ROOT))))
      case AndN(l, r) => CAnd(go(l, active), go(r, active))
      case OrN(l, r) => COr(go(l, active), go(r, active))
      case NotN(l, r) => CAnd(go(l, active), CNot(go(r, active)))
    }
    val node = parseQuery(query, tok)
    org.apache.spark.sql.graft.SqlInternals.column(go(node,
      names.filterNot(c =>
        unindexed.contains(c.toLowerCase(java.util.Locale.ROOT)))))
  }

  // -------------------------------------------- statement rewriting

  /** Rewrite every infix `<lhs> MATCH '<query>'` over a known fts
    * table into its compiled predicate, quote-aware. `ftsTables` maps
    * lowercased table name → declared columns. The LHS spellings are
    * exactly real fts5's (probed): the bare TABLE name, the qualified
    * hidden table-column `alias.table`, a bare COLUMN of a mentioned
    * fts table (column-scoped match), or a qualified column
    * `alias.column`. A bare alias is a syntax error in sqlite too
    * ("no such column"), so it falls through unresolved and the read
    * gate's named refusal explains the contract. */
  def rewriteMatch(stmt: String, ftsTables: Map[String, FtsTableDef],
      statsOf: (String, Seq[PhraseSpec]) => AuxStats = null): String = {
    if (ftsTables.isEmpty) return stmt
    val id = "[A-Za-z_][A-Za-z0-9_]*|\"[^\"]+\"|`[^`]+`|\\[[^\\]]+\\]"
    val matchRe =
      s"(?is)($id)(?:\\s*\\.\\s*($id))?\\s+MATCH\\s+('(?:[^']|'')*')".r
    // which fts tables the STATEMENT mentions (for bare-column LHS)
    val blanked = SqliteDdl.blankLiterals(stmt).toLowerCase(java.util.Locale.ROOT)
    val mentioned = ftsTables.keys.filter { t =>
      ("(^|[^a-z0-9_])" + java.util.regex.Pattern.quote(t) + "([^a-z0-9_]|$)").r
        .findFirstIn(blanked).isDefined
    }.toSeq
    // per fts table: its MATCH clauses in this statement — the parsed
    // node (column-LHS wrapped in its ColFilter) and the qualifier the
    // table's columns ride under — collected for bm25()/rank scoring
    val matchInfo =
      mutable.Map[String, List[(Node, Option[String])]]().withDefaultValue(Nil)
    // spans of each table's MATCH clauses in the ORIGINAL text, for
    // the conjunct/or-chain analyses multi-MATCH scoring needs
    val matchPos = mutable.Map[String, List[(Int, Int)]]().withDefaultValue(Nil)
    val replaced = matchRe.replaceAllIn(stmt, m => {
      val (qualOpt, name) = Option(m.group(2)) match {
        case Some(n2) =>
          (Some(SqlScript.unquoteIdent(m.group(1))), SqlScript.unquoteIdent(n2))
        case None => (None, SqlScript.unquoteIdent(m.group(1)))
      }
      val lit = m.group(3)
      val query = lit.substring(1, lit.length - 1).replace("''", "'")
      val nameLower = name.toLowerCase(java.util.Locale.ROOT)
      // (columns to search, qualifier for their references, owning
      //  table, node wrapper for scoring)
      val resolved: Option[(Seq[String], Option[String], String, Node => Node)] =
        if (ftsTables.contains(nameLower))
          // `t MATCH` / `alias.t MATCH`: all columns, qualified by the
          // alias when given, else by the table name itself
          Some((ftsTables(nameLower).columns, qualOpt.orElse(Some(name)),
            nameLower, identity[Node] _))
        else mentioned.flatMap(t =>
          ftsTables(t).columns.find(_.equalsIgnoreCase(name)).map(c => (t, c)))
          .headOption.map { case (t, c) =>
            // column-scoped match ≡ `t MATCH 'c : …'` (probed): score
            // restricted to that column too
            (Seq(c), qualOpt, t, (n: Node) => ColFilter(c, n))
          }
      resolved match {
        case Some((cols, qual, owner, wrap)) =>
          val fd = ftsTables(owner)
          // the table's tokenizer normalizes the query side too
          // (porter stems, trigram windows)
          val node = parseQuery(query, fd.tok)
          // detail=none|column restrict the query shapes (the wrap
          // covers column-LHS MATCH, a column query on detail=none)
          checkDetail(wrap(node), fd.detail)
          matchInfo(owner) = matchInfo(owner) :+ ((wrap(node), qual))
          matchPos(owner) = matchPos(owner) :+ ((m.start, m.end))
          // contentless tables match over the hidden index-text
          // columns (declared columns read NULL — r15)
          val qn = (c: String) => {
            val cc = if (fd.contentless) idxCol(c) else c
            qual.map(q => s"`$q`.`$cc`").getOrElse(s"`$cc`")
          }
          // external content: MATCH answers from the INDEX — token
          // predicates evaluate over the hidden backing view's text
          // (probed: updating the fts table re-matches without
          // touching the content table) and the row gates on rowid
          // membership. Catalyst plans the IN as a semi-join over the
          // pre-filtered index — scale shape: index rows ≪ corpus.
          val sql =
            if (fd.externalContent) {
              val inner = compileMatch(node, cols, c => s"`$c`",
                fd.unindexed, fd.tok)
              s"(${qn(ridCol(owner))} IN (SELECT `$RowidCol` FROM " +
                s"`${idxView(owner)}` WHERE $inner))"
            } else
              s"(${compileMatch(node, cols, qn, fd.unindexed, fd.tok)})"
          java.util.regex.Matcher.quoteReplacement(sql)
        case None => java.util.regex.Matcher.quoteReplacement(m.group(0))
      }
    })
    if (statsOf == null) replaced
    else rewriteAux(replaced, ftsTables, mentioned, matchInfo.toMap,
      conjunctiveOwners(stmt, matchPos.view.mapValues(_.map(_._1)).toMap),
      orChainOwners(stmt, matchPos.toMap), statsOf)
  }

  /** Owners whose MULTIPLE `MATCH` clauses form exactly one OR chain —
    * `M1 OR M2 [OR …]` as the whole WHERE or one parenthesized group
    * (not NOT-negated) — the shape real fts5 serves with its OR
    * optimization: branches scan in TEXT ORDER and a row keeps the
    * FIRST matching branch's cursor, so bm25/rank/highlight/snippet
    * read that branch alone (probed across orders, 3 branches, and
    * extra AND conjuncts outside the group). Emulated as a CASE over
    * the branch predicates. */
  private def orChainOwners(stmt: String,
      matchSpans: Map[String, List[(Int, Int)]]): Set[String] = {
    val multi = matchSpans.filter(_._2.length > 1)
    if (multi.isEmpty) return Set.empty
    val blanked = SqliteDdl.blankLiterals(stmt)
    val n = blanked.length
    // paren intervals + depth per position
    val stack = mutable.ArrayBuffer[Int]()
    val intervals = mutable.ArrayBuffer[(Int, Int)]()
    val depthAt = new Array[Int](n)
    var d = 0
    var i = 0
    while (i < n) {
      val c = blanked.charAt(i)
      if (c == ')') d = math.max(0, d - 1)
      depthAt(i) = d
      c match {
        case '(' =>
          stack += i; d += 1
        case ')' if stack.nonEmpty =>
          intervals += ((stack.remove(stack.length - 1), i + 1))
        case _ => ()
      }
      i += 1
    }
    // the main WHERE region at depth 0
    val tokRe = ("(?i)(?<![a-z0-9_$])(where|group|order|limit|having|" +
      "window|union|intersect|except|or|not)(?![a-z0-9_$])").r
    val toks = tokRe.findAllMatchIn(blanked)
      .filter(m => depthAt(m.start) == 0).toSeq
    val whereStart = toks.find(_.matched.equalsIgnoreCase("where"))
      .map(_.start).getOrElse(return Set.empty)
    val whereEnd = toks.collectFirst {
      case m if m.start > whereStart && Set("group", "order", "limit",
        "having", "window", "union", "intersect", "except")
        .contains(m.matched.toLowerCase(java.util.Locale.ROOT)) => m.start
    }.getOrElse(n)
    multi.collect { case (owner, spans0) if {
      val spans = spans0.sortBy(_._1)
      val lo = spans.head._1
      val hi = spans.last._2
      val inWhere = lo > whereStart && hi <= whereEnd
      // innermost paren region containing every span; else the WHOLE
      // WHERE must be the chain (leftovers catch anything else)
      val region = intervals.filter(iv => iv._1 < lo && hi <= iv._2)
        .sortBy(iv => iv._2 - iv._1).headOption
      val (cs, ce) = region.getOrElse((whereStart + 5, whereEnd))
      // a NOT directly before the group flips the row set; depth-0
      // OR/NOT elsewhere in the WHERE makes branch attribution
      // plan-shaped in ways this emulation does not model
      val before = blanked.substring(0, math.max(0, cs)).trim
        .toLowerCase(java.util.Locale.ROOT)
      val notted = region.isDefined && before.endsWith("not")
      val strayOrNot = toks.exists(m =>
        m.start > whereStart && m.start < whereEnd &&
          (m.start < cs || m.start >= ce) &&
          Set("or", "not").contains(
            m.matched.toLowerCase(java.util.Locale.ROOT)))
      // blank the spans; the chain region's leftover must be exactly
      // the k−1 OR keywords (plus parens/whitespace)
      val sb = new java.lang.StringBuilder(blanked)
      spans.foreach { case (a, b) =>
        (a until b).foreach(j => sb.setCharAt(j, ' ')) }
      val leftover = sb.substring(math.max(0, cs), ce)
        .replaceAll("[()\\s]+", " ").trim.toLowerCase(java.util.Locale.ROOT)
      val expected = Seq.fill(spans.length - 1)("or").mkString(" ")
      inWhere && !notted && !strayOrNot && leftover == expected
    } => owner }.toSet
  }

  /** Owners whose MULTIPLE `MATCH` clauses are provably top-level AND
    * conjuncts of the statement's main WHERE — the shape real fts5
    * scores exactly like the single conjunction query `(a) AND (b)`
    * (probed: bm25 sums the branches' per-phrase contributions,
    * highlight marks both branches' phrases). A clause under a
    * top-level OR/NOT/CASE, inside a subquery, or outside the WHERE
    * region disqualifies its table (those shapes are query-plan
    * dependent in real fts5 and stay refused). */
  private def conjunctiveOwners(stmt: String,
      matchPos: Map[String, List[Int]]): Set[String] = {
    val multi = matchPos.filter(_._2.length > 1)
    if (multi.isEmpty) return Set.empty
    val blanked = SqliteDdl.blankLiterals(stmt)
    val n = blanked.length
    val depthAt = new Array[Int](n)
    var d = 0
    var i = 0
    while (i < n) {
      val c = blanked.charAt(i)
      if (c == ')') d = math.max(0, d - 1)
      depthAt(i) = d
      if (c == '(') d += 1
      i += 1
    }
    val tokRe = ("(?i)(?<![a-z0-9_$])(where|group|order|limit|having|" +
      "window|union|intersect|except|or|not|case)(?![a-z0-9_$])").r
    val toks = tokRe.findAllMatchIn(blanked)
      .filter(m => depthAt(m.start) == 0).toSeq
    val whereStart = toks.find(_.matched.equalsIgnoreCase("where"))
      .map(_.start).getOrElse(return Set.empty)
    val whereEnd = toks.collectFirst {
      case m if m.start > whereStart && Set("group", "order", "limit",
        "having", "window", "union", "intersect", "except")
        .contains(m.matched.toLowerCase(java.util.Locale.ROOT)) => m.start
    }.getOrElse(n)
    val poisoned = toks.exists(m => m.start > whereStart && m.start < whereEnd &&
      Set("or", "not", "case")
        .contains(m.matched.toLowerCase(java.util.Locale.ROOT)))
    if (poisoned) return Set.empty
    multi.collect {
      case (owner, ps) if ps.forall(p =>
        p > whereStart && p < whereEnd && depthAt(p) == 0) => owner
    }.toSet
  }

  /** Rewrite rowid references over content= fts tables to their
    * hidden view column (r15): `t.rowid` / `alias.rowid` (aliases
    * resolved from FROM/JOIN text) and — when exactly one content-fts
    * table is mentioned — bare `rowid`/`_rowid_`/`oid`. Real fts5's
    * rowid is the join-back key of the external-content idiom
    * (`SELECT rowid FROM t WHERE t MATCH …`), so the read surface must
    * serve it. Matches are found on literal-blanked text. */
  def rewriteRowidRefs(stmt: String, contentFts: Set[String]): String = {
    if (contentFts.isEmpty) return stmt
    val blanked = SqliteDdl.blankLiterals(stmt)
    val blankedLower = blanked.toLowerCase(java.util.Locale.ROOT)
    val mentioned = contentFts.filter { t =>
      ("(^|[^a-z0-9_])" + java.util.regex.Pattern.quote(t) + "([^a-z0-9_]|$)").r
        .findFirstIn(blankedLower).isDefined
    }
    if (mentioned.isEmpty) return stmt
    // aliases of mentioned fts tables, from FROM/JOIN clauses
    val kw = Set("where", "on", "group", "order", "limit", "left", "right",
      "inner", "outer", "cross", "join", "union", "intersect", "except",
      "having", "using", "natural", "as", "match")
    val aliasOf = mutable.Map[String, String]() // lowercased alias → table
    mentioned.foreach(t => aliasOf(t) = t)
    val fromRe = ("(?i)\\b(?:from|join)\\s+([A-Za-z_][A-Za-z0-9_]*)" +
      "\\s+(?:as\\s+)?([A-Za-z_][A-Za-z0-9_]*)").r
    fromRe.findAllMatchIn(blanked).foreach { m =>
      val tab = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val al = m.group(2).toLowerCase(java.util.Locale.ROOT)
      if (mentioned.contains(tab) && !kw.contains(al)) aliasOf(al) = tab
    }
    val ridRe = ("(?i)(?:([A-Za-z_][A-Za-z0-9_]*)\\s*\\.\\s*)?" +
      "(?<![A-Za-z0-9_$])(rowid|_rowid_|oid)(?![A-Za-z0-9_$])").r
    val sb = new java.lang.StringBuilder
    var last = 0
    for (m <- ridRe.findAllMatchIn(blanked)) {
      val qual = Option(m.group(1)).map(_.toLowerCase(java.util.Locale.ROOT))
      val repl = qual match {
        case Some(q) if aliasOf.contains(q) =>
          Some(s"`${m.group(1)}`.`${ridCol(aliasOf(q))}`")
        case Some(_) => None // someone else's qualified rowid
        case None if mentioned.size == 1 =>
          Some(s"`${ridCol(mentioned.head)}`")
        case None => None // ambiguous bare rowid: leave for the gate
      }
      repl.foreach { r =>
        sb.append(stmt, last, m.start).append(r)
        last = m.end
      }
    }
    sb.append(stmt, last, stmt.length).toString
  }

  // ------------------------------------- bm25() / rank scoring (r11)

  /** One scoring unit: a phrase's tokens, its prefix/anchor flag
    * bitmask, the bitmask of searchable columns it counts in (fts5
    * column filters narrow it; default = all columns), and — for NEAR
    * members — the group it clusters with (`group` indexes the query's
    * NEAR groups, −1 standalone): probed, a NEAR member's tf counts
    * ONLY instances participating in a valid same-column cluster
    * (fts5 trims the poslists), while its idf df still queries the
    * phrase independently. */
  final case class PhraseSpec(tokens: Seq[String], flags: Int, colMask: Long,
      group: Int = -1)

  /** Corpus statistics for bm25, from ONE aggregate pass over the
    * backing table: row count, average UNWEIGHTED total token count
    * per row (probed: bm25's column weights scale tf only — document
    * length and avgdl stay unweighted), and per-phrase hit counts
    * (rows with ≥1 occurrence inside the phrase's column mask). */
  final case class AuxStats(nRows: Long, avgdl: Double, nHits: Seq[Long])

  /** The query's phrases in expression order (duplicates preserved —
    * probed: `x x` scores the x term twice), the NEAR-group proximity
    * list, and a prefix-encoded copy of the expression TREE (probed:
    * only phrases inside SATISFIED branches contribute tf — a phrase
    * present in the row but under a failed AND sibling scores 0, so
    * the scorer must re-evaluate the tree per row, exactly like fts5's
    * per-node poslists). Tree code: 0 ⟨phraseIdx⟩ | 1 ⟨group, from,
    * until⟩ | 2 AND | 3 OR | 4 NOT, children following in prefix
    * order.
    *
    * Known deviation (bm25/rank/highlight/snippet alike): real fts5
    * additionally LEAKS a phrase's instances on the one row where its
    * expression iterator happens to rest while the enclosing branch
    * is failed/dead — e.g. for `NEAR(x missing) NOT g OR a`, `g`
    * scores on the FIRST g-containing row only (probed; g's iterator
    * was initialized and never advanced because its parent went EOF).
    * That exposure is a cross-row artifact of fts5_expr's lazy
    * iterator protocol, not a function of the scored row; this engine
    * gates by satisfied branches consistently on every row. */
  def collectPhrases(node: Node, columns: Seq[String],
      indexedMask: Long = -1L)
      : (Seq[PhraseSpec], Seq[Int], Seq[Int]) = {
    val all = (if (columns.length >= 63) ~0L
    else (1L << columns.length) - 1) & indexedMask
    val specs = mutable.ArrayBuffer[PhraseSpec]()
    val groupNs = mutable.ArrayBuffer[Int]()
    val code = mutable.ArrayBuffer[Int]()
    def flagsOf(p: Phrase): Int =
      (if (p.prefix) 1 else 0) | (if (p.anchored) 2 else 0)
    def go(nd: Node, mask: Long): Unit = nd match {
      case p: Phrase =>
        code += 0 += specs.length
        specs += PhraseSpec(p.tokens, flagsOf(p), mask)
      case NearGroup(ps, n) =>
        groupNs += n
        val g = groupNs.length - 1
        code += 1 += g += specs.length += (specs.length + ps.length)
        ps.foreach(p => specs += PhraseSpec(p.tokens, flagsOf(p), mask, g))
      case ColFilter(c, child) =>
        val i = columns.indexWhere(_.equalsIgnoreCase(c))
        if (i < 0) throw new IllegalArgumentException(s"fts5: no such column: $c")
        go(child, (1L << i) & indexedMask) // UNINDEXED filter → mask 0
      case AndN(l, r) => code += 2; go(l, mask); go(r, mask)
      case OrN(l, r) => code += 3; go(l, mask); go(r, mask)
      case NotN(l, r) => code += 4; go(l, mask); go(r, mask)
    }
    go(node, all)
    (specs.toSeq, groupNs.toSeq, code.toSeq)
  }

  /** fts5's idf: `ln((N − nHit + 0.5) / (nHit + 0.5))`, floored at
    * 1e-6 (probed: a term in >half the corpus scores ~1e-6·tf-part,
    * never negative). */
  def idfOf(nRows: Long, nHit: Long): Double = {
    val x = math.log((nRows - nHit + 0.5) / (nHit + 0.5))
    if (x <= 0.0) 1e-6 else x
  }

  /** Occurrences of the phrase in `toks` (match STARTS — overlapping
    * instances all count, probed: `"w w"` in `w w w w` counts 3);
    * flags bit 0 = prefix, bit 1 = `^` anchor (position 0 only). */
  def phraseCount(toks: ArrayData, phrase: Array[UTF8String], flags: Int): Int = {
    val prefix = (flags & 1) != 0
    val n = toks.numElements()
    val k = phrase.length
    if (k == 0 || n < k) return 0
    def at(i: Int): Boolean = {
      var j = 0
      var ok = true
      while (ok && j < k) {
        val t = toks.getUTF8String(i + j)
        ok = if (prefix && j == k - 1) t.startsWith(phrase(j))
        else t.equals(phrase(j))
        j += 1
      }
      ok
    }
    if ((flags & 2) != 0) return if (at(0)) 1 else 0
    var c = 0
    var i = 0
    while (i <= n - k) { if (at(i)) c += 1; i += 1 }
    c
  }

  /** The per-row bm25 evaluator [[Fts5Bm25]] ships to executors: all
    * query-level constants (phrases, flags, masks, idfs, avgdl,
    * weights) are baked in at plan time; `score` sees only the row's
    * per-column token arrays. k1=1.2, b=0.75 (fts5's constants,
    * probed); the sign is negated like fts5 (smaller = better, so
    * `ORDER BY rank` needs no direction flip). */
  final class Bm25Scorer(phrases: Array[Array[UTF8String]], flags: Array[Int],
      masks: Array[Long], idfs: Array[Double], avgdl: Double,
      weights: Array[Double], groupIds: Array[Int], groupNs: Array[Long],
      treeCode: Array[Int]) extends Serializable {

    // the prefix-encoded expression tree (see collectPhrases)
    private sealed trait SN extends Serializable
    private case class SPhrase(i: Int) extends SN
    private case class SNear(g: Int, from: Int, until: Int) extends SN
    private case class SOp(op: Int, l: SN, r: SN) extends SN
    @transient private lazy val root: SN = {
      var p = 0
      def parse(): SN = treeCode(p) match {
        case 0 => p += 2; SPhrase(treeCode(p - 1))
        case 1 => p += 4; SNear(treeCode(p - 3), treeCode(p - 2), treeCode(p - 1))
        case op => p += 1; SOp(op, parse(), parse())
      }
      parse()
    }

    /** Match starts of phrase `i` in one column's tokens. */
    private def startsOf(toks: ArrayData, i: Int): Array[Int] = {
      val phrase = phrases(i)
      val prefix = (flags(i) & 1) != 0
      val n = toks.numElements()
      val k = phrase.length
      if (k == 0 || n < k) return Array.emptyIntArray
      def at(p: Int): Boolean = {
        var j = 0
        var ok = true
        while (ok && j < k) {
          val t = toks.getUTF8String(p + j)
          ok = if (prefix && j == k - 1) t.startsWith(phrase(j))
          else t.equals(phrase(j))
          j += 1
        }
        ok
      }
      if ((flags(i) & 2) != 0)
        return if (at(0)) Array(0) else Array.emptyIntArray
      val buf = mutable.ArrayBuffer[Int]()
      var p = 0
      while (p <= n - k) { if (at(p)) buf += p; p += 1 }
      buf.toArray
    }

    /** Per-column participating-instance counts for one NEAR group
      * (probed: fts5 trims each member's poslist to instances inside a
      * valid full cluster — max chosen start − min chosen end ≤ N+1 —
      * before bm25 counts tf). Adds weighted counts into `wcnt` and
      * raw counts into `raw`. */
    private def addNearCounts(toks: ArrayData, members: Array[Int], n: Long,
        w: Double, wcnt: Array[Double], raw: Array[Int]): Unit = {
      val starts = members.map(startsOf(toks, _))
      val lens = members.map(i => phrases(i).length)
      val kept = Fts5.nearParticipants(starts, lens, n)
      var mi = 0
      while (mi < members.length) {
        val cnt = kept(mi).length
        if (cnt > 0) {
          wcnt(members(mi)) += w * cnt
          raw(members(mi)) += cnt
        }
        mi += 1
      }
    }

    def score(toksPerCol: ArrayData): Double = {
      val nCols = toksPerCol.numElements()
      var d = 0.0
      var c = 0
      while (c < nCols) {
        if (!toksPerCol.isNullAt(c)) d += toksPerCol.getArray(c).numElements()
        c += 1
      }
      val k1 = 1.2
      val b = 0.75
      val norm = k1 * (1.0 - b + (if (avgdl > 0.0) b * d / avgdl else 0.0))
      // per-phrase counts: weighted (tf) and raw (match gating — a
      // 0-weighted column still MATCHES, it just scores nothing)
      val wcnt = new Array[Double](phrases.length)
      val raw = new Array[Int](phrases.length)
      var i = 0
      while (i < phrases.length) {
        if (groupIds(i) < 0) {
          var cc = 0
          while (cc < nCols) {
            if ((masks(i) & (1L << cc)) != 0 && cc < weights.length &&
                !toksPerCol.isNullAt(cc)) {
              val cnt = phraseCount(toksPerCol.getArray(cc), phrases(i), flags(i))
              if (cnt > 0) {
                wcnt(i) += weights(cc) * cnt
                raw(i) += cnt
              }
            }
            cc += 1
          }
        } else if (i == 0 || groupIds(i - 1) != groupIds(i)) {
          // first member of a NEAR group: count the whole group
          val g = groupIds(i)
          var j = i
          while (j < phrases.length && groupIds(j) == g) j += 1
          val members = (i until j).toArray
          var cc = 0
          while (cc < nCols) {
            if ((masks(i) & (1L << cc)) != 0 && cc < weights.length &&
                !toksPerCol.isNullAt(cc))
              addNearCounts(toksPerCol.getArray(cc), members, groupNs(g),
                weights(cc), wcnt, raw)
            cc += 1
          }
        }
        i += 1
      }
      // probed: only phrases inside SATISFIED branches contribute —
      // re-evaluate the tree and gate tf like fts5's per-node poslists
      val tf = new Array[Double](phrases.length)
      def matched(n: SN): Boolean = n match {
        case SPhrase(i) => raw(i) > 0
        case SNear(_, from, _) => raw(from) > 0 // a cluster fills every member
        case SOp(2, l, r) => matched(l) && matched(r)
        case SOp(3, l, r) => matched(l) || matched(r)
        case SOp(_, l, r) => matched(l) && !matched(r)
      }
      def contribute(n: SN): Unit = n match {
        case SPhrase(i) => tf(i) = wcnt(i)
        case SNear(_, from, until) =>
          var i = from
          while (i < until) { tf(i) = wcnt(i); i += 1 }
        case SOp(2, l, r) => contribute(l); contribute(r)
        case SOp(3, l, r) =>
          if (matched(l)) contribute(l)
          if (matched(r)) contribute(r)
        case SOp(_, l, _) => contribute(l)
      }
      if (matched(root)) contribute(root)
      var score = 0.0
      i = 0
      while (i < phrases.length) {
        if (tf(i) > 0.0)
          score += idfs(i) * (tf(i) * (k1 + 1.0)) / (tf(i) + norm)
        i += 1
      }
      -score
    }
  }

  /** The per-row evaluator behind highlight()/snippet() (r11): all
    * query-level constants baked in; `render` sees the row's raw
    * column texts. The algorithm was pinned by probing the sandbox
    * fts5 AND disassembling its fts5SnippetFunction/fts5SnippetScore
    * (the reference serves these through whatever libsqlite3 ships,
    * trough/read.py:63-67). Contract: instances come from the same
    * satisfied-branch-gated, NEAR-trimmed poslists bm25 counts;
    * highlight wraps each instance's original-text span, merging
    * strictly-OVERLAPPING ranges (adjacent stay apart). snippet, per
    * column, scores two candidates per instance offset `io`:
    *  - BASIC: 1000 per first-seen phrase + 1 per repeat over starts
    *    in [io, io+n) (seen-set fresh per candidate); rendered
    *    re-centered at `iAdj = iFirst − (n − (iLast − iFirst))/2`
    *    (iFirst = START of the first counted instance, iLast = END of
    *    the last), clamped to [0, docsize−n];
    *  - SENTENCE: at `b` = the LARGEST sentence boundary ≤ io (token
    *    0, or a token preceded — skipping spaces/tabs/CR/LF — by '.'
    *    or ':'), only when b < io strictly and docsize > n; scored
    *    over [b, b+n) plus a bonus of 120 when b == 0 else 100;
    *    rendered AT b, no re-centering.
    * Strictly-better wins, so the earliest candidate takes ties. The
    * rendered span stretches to the raw string's edges when the
    * window touches token 0 / the last token (tail rule:
    * iRangeEnd ≥ bestDocsize−1) and takes the ellipsis otherwise;
    * instances starting before the window are dropped whole, ones
    * crossing its end clip there. Probed edges: nToken is NOT clamped
    * (n=70 honored beyond the documented 64); nToken ≤ 0 yields
    * fts5's emergent disabled/empty-window shapes (reproduced by the
    * same code path); highlight answers NULL for an out-of-range
    * column while snippet errors "column index out of range"; with no
    * MATCH clause (zero phrases) highlight echoes the text and
    * snippet windows [0, n); a NULL column text answers NULL. */
  final class AuxTextEval(phrases: Array[Array[String]], flags: Array[Int],
      masks: Array[Long], groupIds: Array[Int], groupNs: Array[Long],
      treeCode: Array[Int], snippetMode: Boolean, colIdx: Int,
      open: String, close: String, ellipsis: String, nTokenRaw: Int,
      tok: Tok = Tok.u61)
      extends Serializable {

    private sealed trait SN extends Serializable
    private case class SPhrase(i: Int) extends SN
    private case class SNear(g: Int, from: Int, until: Int) extends SN
    private case class SOp(op: Int, l: SN, r: SN) extends SN
    @transient private lazy val root: SN = {
      var p = 0
      def parse(): SN = treeCode(p) match {
        case 0 => p += 2; SPhrase(treeCode(p - 1))
        case 1 => p += 4; SNear(treeCode(p - 3), treeCode(p - 2), treeCode(p - 1))
        case op => p += 1; SOp(op, parse(), parse())
      }
      parse()
    }

    private def startsOf(toks: Array[String], i: Int): Array[Int] = {
      val ph = phrases(i)
      val prefix = (flags(i) & 1) != 0
      val n = toks.length
      val k = ph.length
      if (k == 0 || n < k) return Array.emptyIntArray
      def at(p: Int): Boolean = {
        var j = 0
        var ok = true
        while (ok && j < k) {
          ok = if (prefix && j == k - 1) toks(p + j).startsWith(ph(j))
          else toks(p + j) == ph(j)
          j += 1
        }
        ok
      }
      if ((flags(i) & 2) != 0)
        return if (at(0)) Array(0) else Array.emptyIntArray
      (0 to n - k).filter(at).toArray
    }

    def render(colTexts: ArrayData): UTF8String = {
      val nCols = colTexts.numElements()
      val texts = Array.tabulate(nCols)(c =>
        if (colTexts.isNullAt(c)) null else colTexts.getUTF8String(c).toString)
      val toks = texts.map(t =>
        if (t == null) null else Fts5.tokenizeWithOffsets(t, tok))
      // gated, NEAR-trimmed instance starts per phrase per column
      val inst = Array.fill(phrases.length, nCols)(Array.emptyIntArray)
      var i = 0
      while (i < phrases.length) {
        if (groupIds(i) < 0) {
          var c = 0
          while (c < nCols) {
            if ((masks(i) & (1L << c)) != 0 && toks(c) != null)
              inst(i)(c) = startsOf(toks(c)._1, i)
            c += 1
          }
          i += 1
        } else {
          val g = groupIds(i)
          var j = i
          while (j < phrases.length && groupIds(j) == g) j += 1
          val members = (i until j).toArray
          val lens = members.map(m => phrases(m).length)
          var c = 0
          while (c < nCols) {
            if ((masks(i) & (1L << c)) != 0 && toks(c) != null) {
              val kept = Fts5.nearParticipants(
                members.map(m => startsOf(toks(c)._1, m)), lens, groupNs(g))
              members.indices.foreach(mi => inst(members(mi))(c) = kept(mi))
            }
            c += 1
          }
          i = j
        }
      }
      val present = phrases.indices.map(p => inst(p).exists(_.nonEmpty)).toArray
      def matched(n: SN): Boolean = n match {
        case SPhrase(i) => present(i)
        case SNear(_, from, _) => present(from)
        case SOp(2, l, r) => matched(l) && matched(r)
        case SOp(3, l, r) => matched(l) || matched(r)
        case SOp(_, l, r) => matched(l) && !matched(r)
      }
      val active = new Array[Boolean](phrases.length)
      def contribute(n: SN): Unit = n match {
        case SPhrase(i) => active(i) = true
        case SNear(_, from, until) =>
          var i = from
          while (i < until) { active(i) = true; i += 1 }
        case SOp(2, l, r) => contribute(l); contribute(r)
        case SOp(3, l, r) =>
          if (matched(l)) contribute(l)
          if (matched(r)) contribute(r)
        case SOp(_, l, _) => contribute(l)
      }
      // zero phrases = statement has no MATCH clause on this table
      // (probed: highlight echoes, snippet windows [0, n) unwrapped)
      if (phrases.nonEmpty && matched(root)) contribute(root)

      // all active instances of one column as (startTok, phraseIdx)
      def colInstances(c: Int): Array[(Int, Int)] =
        phrases.indices.iterator.filter(active(_))
          .flatMap(p => inst(p)(c).iterator.map(off => (off, p)))
          .toArray.sortBy(identity)

      // CInstIter-style coalescing (real fts5's instance iterator):
      // instances of ANY phrase that OVERLAP IN TOKEN SPACE merge into
      // one (startTok, endTokIncl) — windowing then drops/clips the
      // MERGED instance. Probed (trigram): NEAR(حَبً مَرْحَبًا*) — the
      // inner phrase rides inside the longer one's token span, so a
      // snippet window past the merged start renders unmarked; while
      // 'abcabc' MATCH abc keeps TWO instances (tokens 0 and 3 don't
      // overlap) and a 3-token window renders [abc]ab.
      def mergedInstances(c: Int): Array[(Int, Int)] = {
        val out = mutable.ArrayBuffer[(Int, Int)]()
        colInstances(c).foreach { case (off, p) =>
          val end = off + phrases(p).length - 1
          if (out.nonEmpty && off <= out.last._2)
            out(out.length - 1) = (out.last._1, math.max(out.last._2, end))
          else out += ((off, end))
        }
        out.toArray
      }

      def renderWindow(c: Int, winStart: Int, winEnd: Int): UTF8String = {
        val text = texts(c)
        if (text == null) return null
        val (tks, cs, ce) = toks(c)
        val docsize = tks.length
        // instance token ranges inside the window, clipped at its
        // edge, as ORIGINAL-text char spans; merging happens in char
        // space (probed: trigram merges instances whose spans touch —
        // `abcabc` MATCH abc renders [abcabc] — while unicode61 spans
        // always have a separator between tokens, so char-space
        // merging reproduces its token-space behavior exactly)
        val ranges = mergedInstances(c).iterator
          .filter { case (off, _) => off >= winStart && off < winEnd }
          .map { case (off, end) =>
            (cs(off), ce(math.min(end, winEnd - 1)))
          }.toSeq
        val merged = mutable.ArrayBuffer[(Int, Int)]()
        ranges.foreach { case (s0, e0) =>
          if (merged.nonEmpty && s0 <= merged.last._2)
            merged(merged.length - 1) =
              (merged.last._1, math.max(merged.last._2, e0))
          else merged += ((s0, e0))
        }
        val from = if (winStart == 0) 0 else cs(winStart)
        val to = if (winEnd >= docsize) text.length else ce(winEnd - 1)
        // java.lang.StringBuilder: the 3-arg append is the
        // (CharSequence, from, to) overload (scala's would auto-tuple)
        val sb = new java.lang.StringBuilder
        if (winStart > 0) sb.append(ellipsis)
        var pos = from
        merged.foreach { case (a, b) =>
          sb.append(text, pos, a).append(open).append(text, a, b).append(close)
          pos = b
        }
        sb.append(text, pos, to)
        if (winEnd < docsize) sb.append(ellipsis)
        UTF8String.fromString(sb.toString)
      }

      // the disassembled render: range [winStart, winStart+n-1]
      // INCLUSIVE, disabled when the end is negative (n ≤ 0 at
      // winStart 0 — prints through the last instance); leading
      // ellipsis iff winStart > 0; raw tail iff the range end reaches
      // nColSize−1, else trailing ellipsis
      def renderSnippet(c: Int, winStart: Int, n: Int,
          nColSize: Int): UTF8String = {
        val text = texts(c)
        // NULL column text answers NULL (probed — incl. contentless
        // tables, whose declared columns are always NULL)
        if (text == null) return null
        val (tks, cs, ce) = toks(c)
        val docsize = tks.length
        val rangeEnd = winStart.toLong + n - 1 // inclusive
        val disabled = rangeEnd < 0
        val inWin = mergedInstances(c).iterator.filter { case (off, _) =>
          disabled || (off >= winStart && off <= rangeEnd)
        }.map { case (off, end) =>
          val e0 = if (disabled) end else math.min(end.toLong, rangeEnd).toInt
          (cs(off), ce(e0)) // char spans; touching spans merge below
        }
        val merged = mutable.ArrayBuffer[(Int, Int)]()
        inWin.foreach { case (s0, e0) =>
          if (merged.nonEmpty && s0 <= merged.last._2)
            merged(merged.length - 1) =
              (merged.last._1, math.max(merged.last._2, e0))
          else merged += ((s0, e0))
        }
        val sb = new java.lang.StringBuilder
        if (winStart > 0) sb.append(ellipsis)
        var pos = if (winStart == 0 || winStart >= docsize) 0 else cs(winStart)
        merged.foreach { case (a, b) =>
          sb.append(text, pos, a).append(open).append(text, a, b).append(close)
          pos = b
        }
        if (!disabled && rangeEnd <= docsize - 1 && rangeEnd >= winStart) {
          val to = ce(rangeEnd.toInt)
          if (pos < to) sb.append(text, pos, to)
          pos = math.max(pos, to)
        }
        if (rangeEnd >= nColSize - 1) {
          if (pos < text.length) sb.append(text, pos, text.length)
        } else sb.append(ellipsis)
        UTF8String.fromString(sb.toString)
      }

      if (!snippetMode) {
        // probed (quote()): out-of-range column ⇒ EMPTY string, NULL
        // text ⇒ NULL (snippet errors on out-of-range instead)
        if (colIdx < 0 || colIdx >= nCols) return UTF8String.EMPTY_UTF8
        if (texts(colIdx) == null) return null
        // full-text window: no ellipses, no clipping
        renderWindow(colIdx, 0, toks(colIdx)._1.length)
      } else {
        val n = nTokenRaw
        var nBestScore = 0
        var bestCol = if (colIdx >= 0) colIdx else 0
        var bestStart = 0
        var nColSize = 0
        val cols =
          if (colIdx >= 0) (if (colIdx < nCols) Seq(colIdx) else Nil)
          else 0 until nCols
        cols.foreach { c =>
          if (toks(c) != null) {
            val insts = colInstances(c)
            if (insts.nonEmpty) {
              val (tks, cs, _) = toks(c)
              val docsize = tks.length
              val bounds = sentenceStarts(texts(c), cs)
              def windowScore(from: Int): Int = {
                var score = 0
                val seen = new Array[Boolean](phrases.length)
                insts.foreach { case (off, p) =>
                  if (off >= from && off.toLong < from.toLong + n) {
                    score += (if (seen(p)) 1 else 1000)
                    seen(p) = true
                  }
                }
                score
              }
              insts.foreach { case (io, _) =>
                // BASIC candidate: scored at [io, io+n), rendered at
                // the re-centered, clamped iAdj
                var score = 0
                val seen = new Array[Boolean](phrases.length)
                var iFirst = -1
                var iLast = 0
                insts.foreach { case (off, p) =>
                  if (off >= io && off.toLong < io.toLong + n) {
                    score += (if (seen(p)) 1 else 1000)
                    seen(p) = true
                    if (iFirst < 0) iFirst = off
                    iLast = off + phrases(p).length
                  }
                }
                if (score > nBestScore) {
                  var iAdj = iFirst.toLong - (n - (iLast - iFirst)) / 2
                  if (iAdj + n > docsize) iAdj = docsize.toLong - n
                  if (iAdj < 0) iAdj = 0
                  nBestScore = score; bestCol = c
                  bestStart = iAdj.toInt; nColSize = docsize
                }
                // SENTENCE candidate: the largest boundary STRICTLY
                // below io, rendered there, +120 (b=0) / +100 bonus
                if (docsize > n) {
                  var jj = 0
                  while (jj + 1 < bounds.length && bounds(jj + 1) <= io)
                    jj += 1
                  val b = bounds(jj)
                  if (b < io) {
                    val s2 = windowScore(b) + (if (b == 0) 120 else 100)
                    if (s2 > nBestScore) {
                      nBestScore = s2; bestCol = c
                      bestStart = b; nColSize = docsize
                    }
                  }
                }
              }
            }
          }
        }
        if (colIdx >= nCols) // probed: real fts5's named runtime error
          throw new IllegalArgumentException("column index out of range")
        if (texts(bestCol) == null) return null
        if (nColSize == 0) nColSize = toks(bestCol)._1.length
        renderSnippet(bestCol, bestStart, n, nColSize)
      }
    }

    /** fts5SentenceFinderCb: token positions that begin a "sentence" —
      * token 0, plus tokens whose nearest preceding non-[ \t\n\r]
      * character is '.' or ':'. */
    private def sentenceStarts(text: String, cs: Array[Int]): Array[Int] = {
      val buf = mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < cs.length) {
        if (i == 0) buf += 0
        else {
          var j = cs(i) - 1
          var ch = ' '
          while (j >= 0 && {
            ch = text.charAt(j)
            ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r'
          }) j -= 1
          if (j >= 0 && (ch == '.' || ch == ':')) buf += i
        }
        i += 1
      }
      buf.toArray
    }
  }

  /** The six literal-folded array arguments shared by [[Fts5Bm25]] and
    * [[Fts5AuxText]]: phrase token arrays, flag bitmasks, column
    * masks, NEAR-group ids, NEAR-group proximities (sentinel
    * `array(-1)` when none — a bare `array()` won't type), and the
    * prefix-encoded expression tree. */
  private def nodeArraySql(cols: Seq[String], node: Node,
      indexedMask: Long = -1L): (Seq[PhraseSpec], Seq[String]) = {
    val (phrases, groupNs, treeCode) = collectPhrases(node, cols, indexedMask)
    val phArr = phrases.map(_.tokens.map(t => s"'$t'")
      .mkString("array(", ", ", ")")).mkString("array(", ", ", ")")
    val flArr = phrases.map(_.flags).mkString("array(", ", ", ")")
    val mkArr = phrases.map(_.colMask).mkString("array(", ", ", ")")
    val gidArr = phrases.map(_.group).mkString("array(", ", ", ")")
    val gnArr =
      if (groupNs.isEmpty) "array(-1)" // never indexed; array() won't type
      else groupNs.mkString("array(", ", ", ")")
    val treeArr = treeCode.mkString("array(", ", ", ")")
    (phrases, Seq(phArr, flArr, mkArr, gidArr, gnArr, treeArr))
  }

  /** Rewrite `bm25(t [, w…])` calls, `rank` references (bare or
    * table-qualified, case-insensitive — probed), and
    * `highlight(t, col, open, close)` / `snippet(t, col, open, close,
    * ellipsis, n)` calls over the statement's fts tables into
    * literal-folded [[Fts5Bm25]] / [[Fts5AuxText]] calls. Corpus
    * statistics come from `statsOf` (one aggregate job per table per
    * statement; highlight/snippet need none). Probed edges: without a
    * MATCH clause bm25() answers 0.0 and rank NULL for every row,
    * highlight echoes the raw column, and snippet windows [0, n)
    * unwrapped; MULTIPLE MATCH clauses that are all top-level AND
    * conjuncts of the main WHERE score/render exactly like their
    * single AND-combined query (probed, r16); other multi-MATCH
    * shapes are query-plan dependent in real fts5 — refused by name. Deviation:
    * highlight/snippet arguments after the table must be literals
    * (real fts5 evaluates them per row) — refused by name. */
  private def rewriteAux(stmt: String, ftsTables: Map[String, FtsTableDef],
      mentioned: Seq[String], matches: Map[String, List[(Node, Option[String])]],
      conjOwners: Set[String], orOwners: Set[String],
      statsOf: (String, Seq[PhraseSpec]) => AuxStats): String = {
    def maskOf(tLower: String): Long = ftsTables(tLower).indexedMask
    val blanked = SqliteDdl.blankLiterals(stmt)
    val lower = blanked.toLowerCase(java.util.Locale.ROOT)
    if (!lower.contains("bm25") && !lower.contains("highlight") &&
      !lower.contains("snippet") &&
      !"(?i)\\brank\\b".r.findFirstIn(blanked).isDefined)
      return stmt
    val exprCache =
      mutable.Map[(String, Seq[Double], Node, Option[String]), String]()
    // one MATCH branch's row predicate, recompiled exactly as the
    // MATCH rewrite compiled it (same compileMatch, same qualifier
    // shapes) — the CASE arms of the OR-chain emulation
    def branchPred(tLower: String, node: Node, qual: Option[String]): String = {
      val fd = ftsTables(tLower)
      val cols = fd.columns
      def qn(c: String) = {
        val cc = if (fd.contentless) idxCol(c) else c
        qual.map(q => s"`$q`.`$cc`").getOrElse(s"`$cc`")
      }
      if (fd.externalContent) {
        val inner = compileMatch(node, cols, c => s"`$c`", fd.unindexed, fd.tok)
        s"(${qn(ridCol(tLower))} IN (SELECT `$RowidCol` FROM " +
          s"`${idxView(tLower)}` WHERE $inner))"
      } else s"(${compileMatch(node, cols, qn, fd.unindexed, fd.tok)})"
    }
    // ≥2 top-level-conjunct MATCHes score exactly like their single
    // AND-combined query (probed, r16); other multi shapes refuse
    def combined(tLower: String): Option[(Node, Option[String])] =
      matches.getOrElse(tLower, Nil) match {
        case Nil => None
        case List(nq) => Some(nq)
        case ms if conjOwners.contains(tLower) &&
            ms.flatMap(_._2).distinct.length <= 1 =>
          // column-scoped clauses carry no qualifier — any single
          // explicit qualifier (alias or table) serves the whole set
          Some((ms.map(_._1).reduce(AndN(_, _)),
            ms.flatMap(_._2).distinct.headOption))
        case _ => None
      }
    def scoreExpr(tLower: String, weights: Seq[Double], forRank: Boolean): String = {
      def buildScore(node: Node, qual: Option[String]): String =
          exprCache.getOrElseUpdate((tLower, weights, node, qual), {
            val cols = ftsTables(tLower).columns
            if (cols.length > 63)
              throw new UnsupportedOperationException(
                "bm25()/rank over fts5 tables with more than 63 columns is " +
                  "not supported by this engine (column-mask width)")
            val (phrases, Seq(phArr, flArr, mkArr, gidArr, gnArr, treeArr)) =
              nodeArraySql(cols, node, maskOf(tLower))
            val st = statsOf(tLower, phrases)
            val idfs = phrases.zip(st.nHits).map { case (_, h) => idfOf(st.nRows, h) }
            // weights: positional like fts5 — missing default 1.0,
            // extras ignored (probed)
            val w = cols.indices.map(i => weights.lift(i).getOrElse(1.0))
            // contentless: tf counts read the hidden index text (the
            // declared columns are NULL — r15); real fts5 scores from
            // the index too
            def qc(c: String) = {
              val cc = if (ftsTables(tLower).contentless) idxCol(c) else c
              qual.map(q => s"`$q`.`$cc`").getOrElse(s"`$cc`")
            }
            // UNINDEXED columns contribute no tokens to the per-row
            // document length (probed) — feed them empty
            val tmask = maskOf(tLower)
            val tokArg =
              if (ftsTables(tLower).tok != Tok.u61)
                s", '${ftsTables(tLower).tok.spec}'"
              else ""
            val toksArr = cols.zipWithIndex.map { case (c, i) =>
              if ((tmask & (1L << i)) == 0) "fts5_tokens('')"
              else s"fts5_tokens(${qc(c)}$tokArg)"
            }.mkString("array(", ", ", ")")
            val idfArr = idfs.map(_.toString).mkString("array(", ", ", ")")
            val wArr = w.map(_.toString).mkString("array(", ", ", ")")
            s"fts5_bm25($toksArr, $phArr, $flArr, $mkArr, $idfArr, " +
              s"${st.avgdl}, $wArr, $gidArr, $gnArr, $treeArr)"
          })
      matches.getOrElse(tLower, Nil) match {
        case Nil => if (forRank) "NULL" else "0.0" // probed: no MATCH
        case _ if combined(tLower).isDefined =>
          val (node, qual) = combined(tLower).get
          buildScore(node, qual)
        case ms if orOwners.contains(tLower) =>
          // one OR chain: a row keeps the FIRST matching branch's
          // score, like real fts5's OR-optimized plan (probed)
          val fq = ms.flatMap(_._2).distinct.headOption
          "(CASE " + ms.map { case (node, q0) =>
            val q = q0.orElse(fq)
            s"WHEN ${branchPred(tLower, node, q)} THEN ${buildScore(node, q)}"
          }.mkString(" ") + " END)"
        case _ =>
          throw new UnsupportedOperationException(
            "bm25()/rank with multiple MATCH clauses on the same fts " +
              "table is supported only when the clauses are top-level " +
              "AND conjuncts of the main WHERE (scored as the single " +
              "AND-combined query) or one OR chain (first matching " +
              "branch scores) — both probed against real fts5. Mixed " +
              "AND/OR nestings and NOT-negated MATCHes cannot execute " +
              "in real fts5 at all ('unable to use function MATCH in " +
              "the requested context', probed on 3.51) — there is no " +
              "reference scoring to match; move the logic into one " +
              "MATCH query (AND/OR/NOT are fts5 query syntax)")
      }
    }
    final case class Repl(start: Int, end: Int, text: String)
    val repls = mutable.ArrayBuffer[Repl]()
    val bm25Re = "(?i)\\bbm25\\s*\\(([^()]*)\\)".r
    for (m <- bm25Re.findAllMatchIn(blanked)) {
      val argsOrig = stmt.substring(m.start(1), m.end(1))
      val parts = SqlScript.splitTopLevel(argsOrig).map(_.trim)
      if (parts.nonEmpty && parts.head.nonEmpty) {
        val tLower = SqlScript.unquoteIdent(parts.head)
          .toLowerCase(java.util.Locale.ROOT)
        if (ftsTables.contains(tLower)) {
          val weights = parts.tail.map(a => a.toDoubleOption.getOrElse(
            throw new UnsupportedOperationException(
              s"bm25() weights must be numeric literals, got: $a")))
          repls += Repl(m.start, m.end, scoreExpr(tLower, weights.toVector,
            forRank = false))
        } // else: not an fts table — leave, the gate reports it
      }
    }
    // highlight(t, col, open, close) / snippet(t, col, open, close,
    // ellipsis, nToken): literal-fold the query constants into one
    // fts5_aux_text over the row's RAW column texts
    def auxTextExpr(tLower: String, fn: String, snippetMode: Boolean,
        colIdx: Int, openLit: String, closeLit: String,
        ellipsisLit: String, nTok: Int): String = {
      val cols = ftsTables(tLower).columns
      if (cols.length > 63)
        throw new UnsupportedOperationException(
          s"$fn() over fts5 tables with more than 63 columns is not " +
            "supported by this engine (column-mask width)")
      def buildAux(nodeOpt: Option[Node], qual: Option[String]): String = {
        def qc(c: String) = qual.map(q => s"`$q`.`$c`").getOrElse(s"`$c`")
        // probed: highlight without a MATCH echoes the raw column (the
        // EMPTY string when the index is out of range — quote()-probed)
        if (nodeOpt.isEmpty && !snippetMode) {
          if (colIdx < 0 || colIdx >= cols.length) "''"
          else qc(cols(colIdx))
        } else {
          val arrs = nodeOpt match {
            case Some(node) => nodeArraySql(cols, node, maskOf(tLower))._2
            // sentinel single empty-token phrase, mask 0: zero instances
            // everywhere, never matched — exactly the no-MATCH behavior
            case None => Seq("array(array(''))", "array(0)", "array(0)",
              "array(-1)", "array(-1)", "array(0, 0)")
          }
          val colsArr = cols.map(qc).mkString("array(", ", ", ")")
          (s"fts5_aux_text($colsArr, ${arrs.mkString(", ")}, " +
            s"${if (snippetMode) 1 else 0}, $colIdx, $openLit, $closeLit, " +
            s"$ellipsisLit, $nTok, '${ftsTables(tLower).tok.spec}')")
        }
      }
      matches.getOrElse(tLower, Nil) match {
        case Nil => buildAux(None, Some(tLower)) // cols ride the table name
        case _ if combined(tLower).isDefined =>
          val (node, q) = combined(tLower).get
          buildAux(Some(node), q)
        case ms if orOwners.contains(tLower) =>
          val fq = ms.flatMap(_._2).distinct.headOption
          "(CASE " + ms.map { case (node, q0) =>
            val q = q0.orElse(fq)
            s"WHEN ${branchPred(tLower, node, q)} THEN " +
              buildAux(Some(node), q)
          }.mkString(" ") + " END)"
        case _ => throw new UnsupportedOperationException(
          s"$fn() with multiple MATCH clauses on the same fts table is " +
            "supported only when the clauses are top-level AND conjuncts " +
            "of the main WHERE (rendered as the single AND-combined " +
            "query) or one OR chain (first matching branch renders) — " +
            "both probed against real fts5. Mixed AND/OR nestings and " +
            "NOT-negated MATCHes cannot execute in real fts5 at all " +
            "('unable to use function MATCH in the requested context', " +
            "probed on 3.51) — there is no reference rendering to match; " +
            "move the logic into one MATCH query (AND/OR/NOT are fts5 " +
            "query syntax)")
      }
    }
    val auxRe = "(?i)\\b(highlight|snippet)\\s*\\(([^()]*)\\)".r
    for (m <- auxRe.findAllMatchIn(blanked)) {
      val fn = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val argsOrig = stmt.substring(m.start(2), m.end(2))
      val parts = SqlScript.splitTopLevel(argsOrig).map(_.trim)
      if (parts.nonEmpty && parts.head.nonEmpty) {
        val tLower = SqlScript.unquoteIdent(parts.head)
          .toLowerCase(java.util.Locale.ROOT)
        if (ftsTables.contains(tLower)) { // else: the gate reports it
          val snippetMode = fn == "snippet"
          if (parts.length != (if (snippetMode) 6 else 4))
            throw new IllegalArgumentException( // real fts5's message
              s"wrong number of arguments to function $fn()")
          def intLit(a: String): Int = a.toIntOption.getOrElse(
            throw new UnsupportedOperationException(
              s"$fn() integer arguments must be integer literals in this " +
                s"engine (real fts5 evaluates them per row), got: $a"))
          def strLit(a: String): String =
            if (a.length >= 2 && a.head == '\'' && a.last == '\'') a
            else throw new UnsupportedOperationException(
              s"$fn() string arguments must be string literals in this " +
                s"engine (real fts5 evaluates them per row), got: $a")
          val colIdx = intLit(parts(1))
          val (openLit, closeLit) = (strLit(parts(2)), strLit(parts(3)))
          val (ellipsisLit, nTok) =
            if (snippetMode) (strLit(parts(4)), intLit(parts(5))) else ("''", 0)
          repls += Repl(m.start, m.end, auxTextExpr(tLower, fn, snippetMode,
            colIdx, openLit, closeLit, ellipsisLit, nTok))
        }
      }
    }
    val id = "[A-Za-z_][A-Za-z0-9_]*"
    val rankRe = s"(?i)(?:($id)\\s*\\.\\s*)?\\brank\\b".r
    for (m <- rankRe.findAllMatchIn(blanked)) {
      val after = blanked.substring(m.end).dropWhile(_.isWhitespace)
      val beforeWords = blanked.substring(0, m.start).trim
      val prevWord = beforeWords.split("\\s+").lastOption.getOrElse("")
      // skip rank(...) (the window function), alias definitions
      // (`AS rank`), and identifiers touching quoting the blanking hid
      val isCall = after.startsWith("(")
      val isAlias = prevWord.equalsIgnoreCase("as")
      val touchesQuote = (m.start > 0 && stmt.charAt(m.start - 1) == '"') ||
        (m.end < stmt.length && stmt.charAt(m.end) == '"')
      if (!isCall && !isAlias && !touchesQuote) {
        val qual = Option(m.group(1)).map(_.toLowerCase(java.util.Locale.ROOT))
        val target = qual match {
          case Some(q) =>
            if (ftsTables.contains(q)) Some(q)
            // qualifier = the alias a MATCH clause rode under
            else matches.collectFirst {
              case (t, ms) if ms.exists(_._2.exists(_.equalsIgnoreCase(q))) => t
            }
          case None =>
            // bare rank: the statement's single fts table (probed:
            // sqlite resolves it against the matched vtab)
            if (mentioned.length == 1) Some(mentioned.head) else None
        }
        target.foreach { t =>
          repls += Repl(m.start, m.end, "(" + scoreExpr(t, Vector(), forRank = true) + ")")
        }
      }
    }
    if (repls.isEmpty) return stmt
    val sb = new StringBuilder(stmt)
    repls.sortBy(-_.start).foreach(r => sb.replace(r.start, r.end, r.text))
    sb.toString
  }
}

/** `fts5_match_phrase(tokens, phrase, prefix)` — consecutive-token
  * phrase containment, the predicate half of MATCH compilation. A
  * dedicated expression (not HOF lambdas) keeps the generated SQL
  * trivially parseable by the dialect pipeline and the whole predicate
  * inside whole-stage codegen. NULL tokens (NULL document column) ⇒
  * NULL ⇒ no match, SQLite's behavior. */
case class Fts5PhraseMatch(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "fts5_match_phrase"
  // a NULL document column has no tokens ⇒ FALSE, not NULL — fts5
  // keeps `x NOT q` rows whose q-searched column is NULL (r11; the
  // three-valued NULL would wrongly drop them through NOT)
  override def nullable: Boolean = false
  // the flags bitmask (1 = trailing-* prefix, 2 = ^ anchor) arrives as
  // an integer literal (the dialect has no boolean literals) or, for
  // compatibility, a genuine boolean meaning prefix-only
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = first.eval(input)
    val phrase = second.eval(input)
    val flags = third.eval(input)
    if (toks == null || phrase == null || flags == null) false
    else Fts5.phraseMatch(toks.asInstanceOf[ArrayData],
      phrase.asInstanceOf[ArrayData], flags match {
        case b: java.lang.Boolean => if (b.booleanValue()) 1L else 0L
        case n: java.lang.Number => n.longValue()
      })
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val a = first.genCode(ctx)
    val b = second.genCode(ctx)
    val c = third.genCode(ctx)
    val flag = third.dataType match {
      case org.apache.spark.sql.types.BooleanType => s"(${c.value} ? 1L : 0L)"
      case _ => s"(long) (${c.value})"
    }
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      ${c.code}
      boolean ${ev.value} = (${a.isNull} || ${b.isNull} || ${c.isNull})
        ? false : graft.engine.Fts5.phraseMatch(${a.value}, ${b.value}, $flag);
    """, isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Fts5PhraseMatch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `fts5_near(tokens, phrases, flags, n)` — the NEAR-group half of
  * MATCH compilation (r11): `phrases` is an array of token arrays,
  * `flags` the per-phrase prefix bitmasks, `n` the proximity. One
  * codegen'd expression keeps the whole predicate inside whole-stage
  * codegen, like [[Fts5PhraseMatch]]. NULL document column ⇒ NULL ⇒ no
  * match. */
case class Fts5NearMatch(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "fts5_near"
  // NULL document column ⇒ FALSE, not NULL (see [[Fts5PhraseMatch]])
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = first.eval(input)
    if (toks == null) false
    else Fts5.nearMatch(toks.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[ArrayData],
      third.eval(input).asInstanceOf[ArrayData],
      fourth.eval(input).asInstanceOf[java.lang.Number].longValue())
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val a = first.genCode(ctx)
    val b = second.genCode(ctx)
    val c = third.genCode(ctx)
    val d = fourth.genCode(ctx)
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      ${c.code}
      ${d.code}
      boolean ${ev.value} = ${a.isNull} ? false :
        graft.engine.Fts5.nearMatch(${a.value}, ${b.value}, ${c.value},
          (long) (${d.value}));
    """, isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Fts5NearMatch =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `fts5_bm25(toksPerCol, phrases, flags, masks, idfs, avgdl,
  * weights)` — the per-row half of bm25()/rank scoring (r11). Children
  * 1–6 are query-level CONSTANTS the rewrite literal-folds (phrase
  * token arrays, flag bitmasks, column masks, precomputed idfs, corpus
  * avgdl, column weights); they are evaluated ONCE at plan time into a
  * [[Fts5.Bm25Scorer]] shipped as a codegen reference object, so the
  * generated code per row is a single virtual call on the row's token
  * arrays — whole-stage codegen keeps the scan tight. */
case class Fts5Bm25(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "fts5_bm25"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 10)
      TypeCheckResult.TypeCheckFailure("fts5_bm25 takes exactly 10 arguments")
    else if (!children.tail.forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "fts5_bm25 arguments 2-10 must be constants")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val scorer: Fts5.Bm25Scorer = {
    def arr(i: Int): ArrayData = children(i).eval(null).asInstanceOf[ArrayData]
    val phrases = {
      val a = arr(1)
      Array.tabulate(a.numElements()) { i =>
        val p = a.getArray(i)
        Array.tabulate(p.numElements())(j => p.getUTF8String(j).clone())
      }
    }
    new Fts5.Bm25Scorer(phrases, arr(2).toIntArray(), arr(3).toLongArray(),
      arr(4).toDoubleArray(),
      children(5).eval(null).asInstanceOf[java.lang.Number].doubleValue(),
      arr(6).toDoubleArray(), arr(7).toIntArray(), arr(8).toLongArray(),
      arr(9).toIntArray())
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = children.head.eval(input)
    if (toks == null) 0.0 else scorer.score(toks.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("bm25Scorer", scorer,
      classOf[Fts5.Bm25Scorer].getName)
    val c0 = children.head.genCode(ctx)
    ev.copy(code = code"""
      ${c0.code}
      double ${ev.value} = ${c0.isNull} ? 0.0 : $ref.score(${c0.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Fts5Bm25 = copy(children = newChildren)
}

/** `fts5_aux_text(colTexts, phrases, flags, masks, groupIds, groupNs,
  * treeCode, snippetMode, colIdx, open, close, ellipsis, nToken)` —
  * the per-row half of highlight()/snippet() (r11). Child 0 is the
  * row's RAW column texts (the markers splice into the original
  * string, not the folded tokens); children 1–12 are query-level
  * CONSTANTS the rewrite literal-folds, evaluated ONCE at plan time
  * into a [[Fts5.AuxTextEval]] shipped as a codegen reference object —
  * the generated code per row is a single virtual call, keeping the
  * projection inside whole-stage codegen like [[Fts5Bm25]]. */
case class Fts5AuxText(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "fts5_aux_text"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 13 && children.length != 14)
      TypeCheckResult.TypeCheckFailure(
        "fts5_aux_text takes 13 or 14 arguments")
    else if (!children.tail.forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "fts5_aux_text arguments 2-14 must be constants")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val renderer: Fts5.AuxTextEval = {
    def arr(i: Int): ArrayData = children(i).eval(null).asInstanceOf[ArrayData]
    def int(i: Int): Int =
      children(i).eval(null).asInstanceOf[java.lang.Number].intValue()
    def str(i: Int): String =
      children(i).eval(null).asInstanceOf[UTF8String].toString
    val phrases = {
      val a = arr(1)
      Array.tabulate(a.numElements()) { i =>
        val p = a.getArray(i)
        Array.tabulate(p.numElements())(j => p.getUTF8String(j).toString)
      }
    }
    new Fts5.AuxTextEval(phrases, arr(2).toIntArray(), arr(3).toLongArray(),
      arr(4).toIntArray(), arr(5).toLongArray(), arr(6).toIntArray(),
      int(7) != 0, int(8), str(9), str(10), str(11), int(12),
      tok = if (children.length > 13) Fts5.Tok.parse(str(13)) else Fts5.Tok.u61)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val texts = children.head.eval(input)
    if (texts == null) null
    else renderer.render(texts.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("auxTextRenderer", renderer,
      classOf[Fts5.AuxTextEval].getName)
    val c0 = children.head.genCode(ctx)
    ev.copy(code = code"""
      ${c0.code}
      UTF8String ${ev.value} = ${c0.isNull} ? null : $ref.render(${c0.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Fts5AuxText =
    copy(children = newChildren)
}

/** `fts5_tokens(text[, spec])` — the token array of a string under
  * tokenizer config `spec` (a [[Fts5.Tok.spec]] string; the SQL
  * surface also accepts the r11-r13 packed-int modes via
  * [[Fts5.Tok.fromLegacy]]); the row-side half of MATCH compilation
  * (registered on the dialect function surface,
  * [[SqliteCompat.register]]). Codegen'd via a static call taking the
  * spec literal (parse memoized in [[Fts5.Tok.cached]]), so MATCH
  * predicates stay inside whole-stage codegen. */
case class Fts5Tokens(child: Expression, tok: Fts5.Tok = Fts5.Tok.u61)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fts5_tokens requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "fts5_tokens"
  override def nullSafeEval(v: Any): Any =
    Fts5.tokenizeUtf8(v.asInstanceOf[UTF8String], tok)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Tok.spec is [a-z0-9;=+*] only — safe inside a Java string literal
    defineCodeGen(ctx, ev,
      c => s"""graft.engine.Fts5.tokenizeUtf8($c, "${tok.spec}")""")
  override protected def withNewChildInternal(newChild: Expression): Fts5Tokens =
    copy(child = newChild)
}
