package graft.text

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", 1980 — public domain algorithm), the stemmer behind the ES
  * `english` analyzer the reference's q-search relies on
  * (reference: tests/test_controllers.py:16 "analyzer": "english").
  * Straight implementation of steps 1a–5b over lowercase ASCII words.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w)
    w = step5a(w); w = step5b(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Suffixes = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: String): String =
    step2Suffixes.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step3Suffixes = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: String): String =
    step3Suffixes.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String =
    step4Suffixes.collectFirst {
      case s if w.endsWith(s) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > 1 &&
            (s != "ion" || (stem.nonEmpty && "st".contains(stem.last)))) stem
        else w
    }.getOrElse(w)

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w.dropRight(1) else w
}
