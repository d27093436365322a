package graft.text

/** F9 — Porter stemmer, exact parity with the stemmer the reference
  * applies to tags (Data_manager/TagPreprocessing.py:20-62 uses
  * `nltk.stem.PorterStemmer`, whose default mode is NLTK_EXTENSIONS).
  *
  * This is a from-scratch implementation of the published Porter (1980)
  * algorithm plus the NLTK extensions that mode adds on top:
  *  - an irregular-forms pool (sky/dying/lying/…);
  *  - words of length ≤ 2 pass through unstemmed;
  *  - step 1a: "ies"→"ie" for 4-letter words (ties→tie, dies→die);
  *  - step 1b: "ied"→"ie"/"i" by length (died→die, studied→studi);
  *  - step 1c: y→i after a non-initial consonant (crying→cri) instead
  *    of the original *v* condition;
  *  - step 2: "alli"→"al" re-entrant rule, "fulli"→"ful", "logi"→"log"
  *    measured on the l-inclusive stem;
  *  - ends-cvc treats 2-letter vowel-consonant words as cvc.
  *
  * Pure function of the input token — deterministic across engines,
  * safe to register as a UDF (the per-token loop is inherently
  * procedural; everything around it stays in codegen'd expressions).
  */
object PorterStemmer {

  private val pool: Map[String, String] = Map(
    "sky" -> "sky", "skies" -> "sky",
    "dying" -> "die", "lying" -> "lie", "tying" -> "tie",
    "news" -> "news",
    "innings" -> "inning", "inning" -> "inning",
    "outings" -> "outing", "outing" -> "outing",
    "cannings" -> "canning", "canning" -> "canning",
    "howe" -> "howe",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed")

  private val vowels = Set('a', 'e', 'i', 'o', 'u')

  /** Consonant test at position i: vowels are not consonants; 'y' is a
    * consonant at position 0 and after a vowel, a vowel after a
    * consonant (the published definition). */
  private def isConsonant(w: String, i: Int): Boolean = {
    val c = w.charAt(i)
    if (vowels.contains(c)) false
    else if (c == 'y') { if (i == 0) true else !isConsonant(w, i - 1) }
    else true
  }

  /** Porter's measure m: the number of vowel→consonant transitions in
    * the [C](VC)^m[V] decomposition. */
  private def measure(stem: String): Int = {
    var m = 0
    var i = 1
    while (i < stem.length) {
      if (!isConsonant(stem, i - 1) && isConsonant(stem, i)) m += 1
      i += 1
    }
    m
  }

  private def containsVowel(stem: String): Boolean =
    stem.indices.exists(i => !isConsonant(stem, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** *o condition: stem ends cvc where the final c is not w/x/y; the
    * NLTK extension also accepts 2-letter vowel-consonant stems. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    (n >= 3 && isConsonant(w, n - 3) && !isConsonant(w, n - 2) &&
      isConsonant(w, n - 1) && !"wxy".contains(w.charAt(n - 1))) ||
    (n == 2 && !isConsonant(w, 0) && isConsonant(w, 1))
  }

  private def replace(w: String, suffix: String, rep: String): String =
    w.substring(0, w.length - suffix.length) + rep

  /** First-matching-suffix rule application (the published semantics:
    * once a suffix matches, its condition decides apply-or-stop — later
    * rules are not tried). */
  private def applyRules(w: String,
      rules: Seq[(String, String, Option[String => Boolean])]): String = {
    rules.foreach { case (suffix, rep, cond) =>
      if (w.endsWith(suffix)) {
        val stem = replace(w, suffix, "")
        return if (cond.forall(_(stem))) stem + rep else w
      }
    }
    w
  }

  private def hasPositiveMeasure(stem: String): Boolean = measure(stem) > 0

  private def step1a(w: String): String = {
    if (w.endsWith("ies") && w.length == 4) replace(w, "ies", "ie")
    else applyRules(w, Seq(
      ("sses", "ss", None), ("ies", "i", None),
      ("ss", "ss", None), ("s", "", None)))
  }

  private def step1b(w: String): String = {
    if (w.endsWith("ied"))
      return if (w.length == 4) replace(w, "ied", "ie")
             else replace(w, "ied", "i")
    if (w.endsWith("eed")) {
      val stem = replace(w, "eed", "")
      return if (measure(stem) > 0) stem + "ee" else w
    }
    val stem =
      if (w.endsWith("ed") && containsVowel(replace(w, "ed", "")))
        replace(w, "ed", "")
      else if (w.endsWith("ing") && containsVowel(replace(w, "ing", "")))
        replace(w, "ing", "")
      else return w
    if (stem.endsWith("at") || stem.endsWith("bl") || stem.endsWith("iz"))
      stem + "e"
    else if (endsDoubleConsonant(stem) &&
             !"lsz".contains(stem.charAt(stem.length - 1)))
      stem.substring(0, stem.length - 1)
    else if (measure(stem) == 1 && endsCvc(stem)) stem + "e"
    else stem
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && w.length > 2 &&
        isConsonant(w, w.length - 2)) replace(w, "y", "i")
    else w

  private def step2(w: String): String = {
    // NLTK extension: the alli→al rule runs first and re-enters step 2
    // (rationalli → rational → ration-al path)
    if (w.endsWith("alli") && hasPositiveMeasure(replace(w, "alli", "")))
      return step2(replace(w, "alli", "al"))
    val pm: Option[String => Boolean] = Some(hasPositiveMeasure)
    applyRules(w, Seq(
      ("ational", "ate", pm), ("tional", "tion", pm),
      ("enci", "ence", pm), ("anci", "ance", pm), ("izer", "ize", pm),
      ("bli", "ble", pm), ("alli", "al", pm), ("entli", "ent", pm),
      ("eli", "e", pm), ("ousli", "ous", pm), ("ization", "ize", pm),
      ("ation", "ate", pm), ("ator", "ate", pm), ("alism", "al", pm),
      ("iveness", "ive", pm), ("fulness", "ful", pm),
      ("ousness", "ous", pm), ("aliti", "al", pm), ("iviti", "ive", pm),
      ("biliti", "ble", pm), ("fulli", "ful", pm),
      // the 'l' of logi→log measures with the stem (geo-/theo- words)
      ("logi", "log", Some((_: String) =>
        hasPositiveMeasure(replace(w, "logi", "l"))))))
  }

  private def step3(w: String): String = {
    val pm: Option[String => Boolean] = Some(hasPositiveMeasure)
    applyRules(w, Seq(
      ("icate", "ic", pm), ("ative", "", pm), ("alize", "al", pm),
      ("iciti", "ic", pm), ("ical", "ic", pm), ("ful", "", pm),
      ("ness", "", pm)))
  }

  private def step4(w: String): String = {
    val m1: Option[String => Boolean] = Some(s => measure(s) > 1)
    applyRules(w, Seq(
      ("al", "", m1), ("ance", "", m1), ("ence", "", m1), ("er", "", m1),
      ("ic", "", m1), ("able", "", m1), ("ible", "", m1), ("ant", "", m1),
      ("ement", "", m1), ("ment", "", m1), ("ent", "", m1),
      ("ion", "", Some(s => measure(s) > 1 && s.nonEmpty &&
                        "st".contains(s.charAt(s.length - 1)))),
      ("ou", "", m1), ("ism", "", m1), ("ate", "", m1), ("iti", "", m1),
      ("ous", "", m1), ("ive", "", m1), ("ize", "", m1)))
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = replace(w, "e", "")
      if (measure(stem) > 1) stem
      else if (measure(stem) == 1 && !endsCvc(stem)) stem
      else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w.substring(0, w.length - 1)) > 1)
      w.substring(0, w.length - 1)
    else w

  /** Stem one (lowercased) word. */
  def stem(word: String): String = {
    val w = word.toLowerCase
    pool.get(w) match {
      case Some(s) => s
      case None =>
        if (w.length <= 2) w
        else step5b(step5a(step4(step3(step2(step1c(step1b(step1a(w))))))))
    }
  }
}
