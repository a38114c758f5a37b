package graft.engine

/** The Porter stemming algorithm exactly as fts5's `porter` tokenizer
  * applies it (the official ANSI-C variant with the published
  * departures: bli→ble, logi→log at m>0, biliti→ble — all probed
  * against the sandbox fts5: possibli→possibl, analogi→analog while
  * geologi stays at m=0, sensibiliti→sensibl, crying→cry, cried→cri,
  * happy→happi, 2dogs→2dog, x9ing unchanged for want of a vowel).
  * Operates on UTF-8 BYTES like porter.c — digits and multibyte
  * sequences count as consonants, rules only touch ASCII suffixes so
  * the output stays valid UTF-8 — and passes tokens longer than 64
  * bytes through unchanged (FTS5_PORTER_MAX_TOKEN). Input arrives
  * already unicode61-folded (lowercase, diacritics removed). */
object Porter {

  def stem(token: String): String = {
    val b = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.length > 64) return token
    val out = stemBytes(b)
    if (out eq b) token
    else new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def isVowelNoY(c: Byte): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** cons(i) per the paper: y is a consonant at position 0 or after a
    * vowel, a vowel after a consonant. */
  private def cons(w: Array[Byte], len: Int, i: Int): Boolean = {
    val c = w(i)
    if (isVowelNoY(c)) false
    else if (c == 'y') i == 0 || !cons(w, len, i - 1)
    else true
  }

  /** m: number of VC sequences in w[0,len). */
  private def measure(w: Array[Byte], len: Int): Int = {
    var i = 0
    while (i < len && cons(w, len, i)) i += 1
    var m = 0
    while (i < len) {
      while (i < len && !cons(w, len, i)) i += 1
      if (i < len) m += 1
      while (i < len && cons(w, len, i)) i += 1
    }
    m
  }

  private def hasVowel(w: Array[Byte], len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (!cons(w, len, i)) return true
      i += 1
    }
    false
  }

  private def doubleCons(w: Array[Byte], len: Int): Boolean =
    len >= 2 && w(len - 1) == w(len - 2) && cons(w, len, len - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(w: Array[Byte], len: Int): Boolean =
    len >= 3 && cons(w, len, len - 3) && !cons(w, len, len - 2) &&
      cons(w, len, len - 1) && {
        val c = w(len - 1)
        c != 'w' && c != 'x' && c != 'y'
      }

  private def endsWith(w: Array[Byte], len: Int, s: String): Boolean = {
    val n = s.length
    if (len < n) return false
    var i = 0
    while (i < n) {
      if (w(len - n + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def stemBytes(in: Array[Byte]): Array[Byte] = {
    // working buffer with room for the longest growth (at→ate)
    val w = java.util.Arrays.copyOf(in, in.length + 2)
    var len = in.length
    if (len < 3) return in // porter.c: words of length 1-2 unchanged

    // porter.c requires every suffix to be PROPER (at least one stem
    // byte precedes it — probed: bare 'eed'→'e' via the ed rule,
    // 'ies'→'ie' and 'sses'→'sse' via the s rule)
    def ends(s: String): Boolean = len > s.length && endsWith(w, len, s)
    def setTo(drop: Int, add: String): Unit = {
      len -= drop
      var i = 0
      while (i < add.length) { w(len) = add.charAt(i).toByte; len += 1; i += 1 }
    }
    /** Replace `suf` with `add` when m(stem) > threshold. Returns true
      * when the suffix MATCHED (rule consumed, stop scanning). */
    def r(suf: String, add: String, mGt: Int): Boolean = {
      if (!ends(suf)) return false
      if (measure(w, len - suf.length) > mGt) setTo(suf.length, add)
      true
    }

    // step 1a
    if (ends("sses")) setTo(4, "ss")
    else if (ends("ies")) setTo(3, "i")
    else if (!ends("ss") && ends("s")) setTo(1, "")

    // step 1b
    if (ends("eed")) { if (measure(w, len - 3) > 0) setTo(3, "ee") }
    else {
      val dropped =
        if (ends("ed") && hasVowel(w, len - 2)) { setTo(2, ""); true }
        else if (ends("ing") && hasVowel(w, len - 3)) { setTo(3, ""); true }
        else false
      if (dropped) {
        if (ends("at")) setTo(2, "ate")
        else if (ends("bl")) setTo(2, "ble")
        else if (ends("iz")) setTo(2, "ize")
        else if (doubleCons(w, len)) {
          val c = w(len - 1)
          if (c != 'l' && c != 's' && c != 'z') len -= 1
        } else if (measure(w, len) == 1 && cvc(w, len)) setTo(0, "e")
      }
    }

    // step 1c
    if (ends("y") && hasVowel(w, len - 1)) { w(len - 1) = 'i' }

    // step 2 (m > 0), first matching suffix wins
    val step2 = Seq(
      ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
      ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
      ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
      ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
      ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
      ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"))
    step2.exists { case (s, a) => r(s, a, 0) }

    // step 3 (m > 0)
    val step3 = Seq(("icate", "ic"), ("ative", ""), ("alize", "al"),
      ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""))
    step3.exists { case (s, a) => r(s, a, 0) }

    // step 4 (m > 1); (s|t)ion requires the preceding letter
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent")
    val hit4 = step4.exists(s => r(s, "", 1))
    if (!hit4) {
      if (ends("ion") &&
        len - 3 >= 1 && (w(len - 4) == 's' || w(len - 4) == 't')) {
        if (measure(w, len - 3) > 1) setTo(3, "")
      } else {
        Seq("ou", "ism", "ate", "iti", "ous", "ive", "ize")
          .exists(s => r(s, "", 1))
      }
    }

    // step 5a
    if (ends("e")) {
      val m = measure(w, len - 1)
      if (m > 1 || (m == 1 && !cvc(w, len - 1))) len -= 1
    }
    // step 5b
    if (len >= 2 && w(len - 1) == 'l' && doubleCons(w, len) &&
      measure(w, len) > 1) len -= 1

    // step 1c edits y→i IN PLACE without changing the length, so a
    // same-length result can still differ from the input (pony→poni,
    // happy→happi) — compare content, not just length
    if (len == in.length) {
      var i = 0
      while (i < len && w(i) == in(i)) i += 1
      if (i == len) in else java.util.Arrays.copyOf(w, len)
    } else java.util.Arrays.copyOf(w, len)
  }
}
