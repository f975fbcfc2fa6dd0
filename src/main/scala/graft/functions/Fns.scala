package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column expressions mirroring the reference's string/URI/date
  * helpers (SURVEY.md §2.8). Everything here is a pure Catalyst Column
  * expression — no UDFs — so the whole extraction path stays inside
  * whole-stage codegen and predicate pushdown keeps working.
  *
  * Each function cites the reference code whose semantics it reproduces.
  */
object Fns {

  /** `clean_term` — the cultural-form variant of the reference's term
    * normalizer (`Biography/culturalForm.py:513-521`):
    * lowercase → "-"→" " → strip → remove spaces → drop trailing "s" →
    * drop trailing "ism"/"ist"/"ing" → drop trailing "er".
    * Applied to BOTH sides of every dictionary link (J1 in SURVEY.md §2.3).
    */
  def cleanTerm(c: Column): Column = {
    val t0 = regexp_replace(trim(regexp_replace(lower(c), "-", " ")), " ", "")
    val t1 = when(t0.endsWith("s"), t0.substr(lit(1), length(t0) - 1)).otherwise(t0)
    val suf3 = t1.substr(length(t1) - 2, lit(3))
    val t2 = when(length(t1) >= 3 && suf3.isin("ism", "ist", "ing"),
      t1.substr(lit(1), length(t1) - 3)).otherwise(t1)
    val t3 = when(t2.endsWith("er"), t2.substr(lit(1), length(t2) - 2)).otherwise(t2)
    t3
  }

  /** The simple normalizer variant used by occupation/birth-death linking
    * (`Biography/occupation.py:184-186`, `birthDeath.py:24-26`):
    * only lowercase + strip hyphens/whitespace, no suffix stemming.
    */
  def cleanTermSimple(c: Column): Column =
    regexp_replace(trim(regexp_replace(lower(c), "-", " ")), " ", "")

  /** `remove_punctuation` + space→underscore + special folds
    * (`Utils/utilities.py:221-235`). Feeds URI minting, so it must be
    * deterministic and byte-stable. The reference keeps "-" (its v2
    * comment at utilities.py:311), strips other ASCII punctuation, maps
    * " "→"_", "¾"→"3-4", "©"→"c", "Ã"→"A", then unidecode-folds.
    * We implement the punctuation strip + the explicit fold table; the
    * general unidecode table is reduced to the Latin-1 accent folds that
    * can actually occur in our value domain (translate() below).
    */
  /** Accent-fold pairs, built pairwise so from/to can never misalign.
    * Covers Latin-1 Supplement AND Latin Extended-A (the unidecode rows a
    * European-language corpus actually exercises — CJK/Cyrillic would need
    * a transliteration table, declared out of scope in SURVEY §2.0.1). */
  private val foldPairs: Seq[(Char, Char)] =
    ("ÃA ÀA ÁA ÂA ÄA àa áa âa äa ÈE ÉE ÊE ËE èe ée êe ëe ÌI ÍI ÎI ÏI ìi íi îi ïi " +
     "ÒO ÓO ÔO ÖO òo óo ôo öo ÙU ÚU ÛU ÜU ùu úu ûu üu ÑN ñn ÇC çc ØO øo ÅA åa ÝY ýy ÿy " +
     "ÐD ðd " + // Latin-1 eth
     "ĀA āa ĂA ăa ĄA ąa ĆC ćc ĈC ĉc ĊC ċc ČC čc ĎD ďd ĐD đd " +
     "ĒE ēe ĔE ĕe ĖE ėe ĘE ęe ĚE ěe ĜG ĝg ĞG ğg ĠG ġg ĢG ģg " +
     "ĤH ĥh ĦH ħh ĨI ĩi ĪI īi ĬI ĭi ĮI įi İI ıi ĴJ ĵj ĶK ķk ĸk " +
     "ĹL ĺl ĻL ļl ĽL ľl ĿL ŀl ŁL łl ŃN ńn ŅN ņn ŇN ňn ŊN ŋn " +
     "ŌO ōo ŎO ŏo ŐO őo ŔR ŕr ŖR ŗr ŘR řr ŚS śs ŜS ŝs ŞS şs ŠS šs " +
     "ŢT ţt ŤT ťt ŦT ŧt ŨU ũu ŪU ūu ŬU ŭu ŮU ůu ŰU űu ŲU ųu " +
     "ŴW ŵw ŶY ŷy ŸY ŹZ źz ŻZ żz ŽZ žz")
      .split(" ").toSeq.map(p => (p(0), p(1)))

  def removePunctuation(c: Column): Column = {
    // multi-char folds (unidecode ligature behavior) before translate:
    val pre = Seq("¾" -> "3-4", "©" -> "c", "œ" -> "oe", "Œ" -> "OE",
      "æ" -> "ae", "Æ" -> "AE", "ß" -> "ss",
      "Ĳ" -> "IJ", "ĳ" -> "ij", "Þ" -> "Th", "þ" -> "th", "ŉ" -> "'n")
      .foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
    val folded2 = translate(pre,
      foldPairs.map(_._1).mkString, foldPairs.map(_._2).mkString)
    val noPunct = regexp_replace(folded2, """[!"#$%&'()*+,./:;<=>?@\[\\\]^`{|}~_]""", "")
    regexp_replace(noPunct, " ", "_")
  }

  /** `make_standard_uri` (`Utils/utilities.py:307-316`): namespace prepend
    * of the cleaned term. */
  def mintUri(ns: String, term: Column): Column =
    concat(lit(ns), removePunctuation(term))

  /** `strip_all_whitespace` (`Utils/utilities.py:210-212`). */
  def stripAllWhitespace(c: Column): Column = regexp_replace(c, "\\s+", "")

  /** `split_by_casing` (`Utils/utilities.py:215-216`): camelCase → words. */
  def splitByCasing(c: Column): Column =
    array_join(regexp_extract_all(c, lit("^[a-z]+|[A-Z][^A-Z]*"), lit(0)), " ")

  /** `limit_words(s, n)` (`Utils/utilities.py:242-263`, has doctests):
    * collapse whitespace, keep first n words, append "..." if truncated.
    */
  def limitWords(c: Column, n: Int): Column = {
    val wordsArr = split(trim(regexp_replace(c, "\\s+", " ")), " ")
    val kept = array_join(slice(wordsArr, 1, n), " ")
    when(size(wordsArr) > n, concat(kept, lit("..."))).otherwise(kept)
  }

  /** Snippet builder (`Utils/context.py:256-281` F7), replayed in the
    * reference's exact step order: (1) sentence budget via
    * limit_to_full_sentences (context.py:264), (2) the date→"date: "
    * insertion is skipped — transcript text carries no inline DATE tags,
    * (3) "\n"→" ", (4) "."→". ", (5) "  "→" ", (6) strip
    * (context.py:277-281). All replaces are single left-to-right passes,
    * matching Python str.replace semantics. Order matters for parity.
    */
  val SnippetMaxWords = 12
  def snippet(c: Column, maxWords: Int = SnippetMaxWords): Column = {
    val budgeted = limitToFullSentences(c, maxWords)
    val s1 = regexp_replace(budgeted, "\n", " ")
    val s2 = regexp_replace(s1, "\\.", ". ")
    val s3 = regexp_replace(s2, "  ", " ")
    trim(s3)
  }

  /** `limit_to_full_sentences(s, max)` (`Utils/utilities.py:266-281`):
    * split on '.', accumulate whole sentences while the accumulated text
    * has fewer than `max` spaces, re-append '.', then collapse the ".  ."
    * artifact — replayed exactly, quirks included.
    */
  def limitToFullSentences(c: Column, maxWords: Int): Column = {
    val s = trim(c)
    val acc = aggregate(split(s, "\\."), lit(""), (acc, x) => {
      val candidate = concat(acc, trim(x))
      val withDot = when(candidate.endsWith("."), candidate)
        .otherwise(concat(candidate, lit(".")))
      when(size(split(acc, " ")) - 1 < maxWords, withDot).otherwise(acc)
    })
    when(s === "", s).otherwise(regexp_replace(acc, "\\.  \\.", ". "))
  }

  /** F9 — the FULL 13-format date-parse cascade, one try per strptime
    * pattern of `Utils/activity.py:82-169` in the reference's order
    * (%Y-%m-%d, %Y-%m-%d-, %Y--, %Y-, %Y, %Y-%m-, %Y-%m, %B %Y, %d %B %Y,
    * %Y-%m--, %b %Y, %d %b %Y) plus the full dateTime form the transcript
    * payloads carry. Returns null (never throws) on unparseable input,
    * like the reference's `parsed=False` path.
    */
  val dateFormats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss", // transcript full-precision form
    "yyyy-MM-dd",
    "yyyy-MM-dd-",  // trailing-dash variants the Orlando data carries
    "yyyy--",
    "yyyy-",
    "yyyy",
    "yyyy-MM-",
    "yyyy-MM",
    "MMMM yyyy",    // %B %Y
    "d MMMM yyyy",  // %d %B %Y
    "yyyy-MM--",
    "MMM yyyy",     // %b %Y
    "d MMM yyyy")   // %d %b %Y

  def dateParseCascade(c: Column): Column = {
    val t = trim(c)
    coalesce(dateFormats.map(f => try_to_timestamp(t, lit(f))): _*)
  }

  /** `format_date` length-dispatch (`Utils/activity.py:52-73`,
    * `Utils/event.py:90-110`): the reference tags the literal's datatype by
    * the LEXICAL LENGTH of the date string (19→dateTime, 10→date,
    * 7→gYearMonth, 4/5→gYear) and never normalizes partial dates (its
    * `normalize=False` comment at event.py:90-99). Returns a struct
    * (lexical, dtype).
    */
  def formatDate(lex: Column): Column = {
    import graft.model.Ns
    val dtype = when(length(lex) === 19, lit(Ns.xsdDateTime))
      .when(length(lex) === 10, lit(Ns.xsdDate))
      .when(length(lex) === 7, lit(Ns.xsdGYearMon))
      .when(length(lex) === 4 || length(lex) === 5, lit(Ns.xsdGYear))
      .otherwise(lit(Ns.xsdString))
    struct(lex.as("lexical"), dtype.as("dtype"))
  }

  /** Date-certainty map — the FULL reference certainty_map
    * (`Utils/activity.py:216-229`): CERT/FROM → high; C/BY/AFTER/TO/BOTH/
    * NEITHER → medium; ROUGHLYDATED (alone) → low; UNKNOWN/None → unknown. */
  def dateCertainty(c: Column): Column =
    when(c.isin("CERT", "FROM"), "highCertainty")
      .when(c.isin("C", "BY", "AFTER", "TO", "BOTH", "NEITHER"),
        "mediumCertainty")
      .when(c === "ROUGHLYDATED", "lowCertainty")
      .otherwise("unknownCertainty")
}
