package graft

import graft.functions.Fns
import org.apache.spark.sql.functions._

/** Unit tests for the scalar helpers, mirroring the reference's doctests
  * and normalization quirks (SURVEY.md §5 item 2). */
class FnsSpec extends SparkSpec {

  private def evalStr(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.cast("string")).collect()(0).getString(0)

  test("cleanTerm reproduces culturalForm.py:513-521 stemming") {
    val cases = Seq(
      "novelist" -> "novel",        // -ist
      "Novels" -> "novel",          // lower + trailing s
      "singer" -> "sing",           // -er
      "singing" -> "sing",          // -ing
      "school-teacher" -> "schoolteach", // hyphen fold + -er
      "blacksmith" -> "blacksmith",
      "Ontarian" -> "ontarian",
      "weaver" -> "weav",
      "Painter" -> "paint",
      "organist" -> "organ",
      "  Quaker " -> "quak",        // strip + s? no: -er
      "ism" -> "")                  // 3-char suffix strips whole token
    cases.foreach { case (in, want) =>
      assert(evalStr(Fns.cleanTerm(lit(in))) == want, s"cleanTerm($in)")
    }
  }

  test("cleanTermSimple only lowercases and strips hyphens/spaces") {
    assert(evalStr(Fns.cleanTermSimple(lit("Nation_7"))) == "nation_7")
    assert(evalStr(Fns.cleanTermSimple(lit("MIDDLE EAST"))) == "middleeast")
    assert(evalStr(Fns.cleanTermSimple(lit("school-teacher"))) == "schoolteacher")
  }

  test("removePunctuation mirrors utilities.py:221-235 (keep '-', fold specials)") {
    assert(evalStr(Fns.removePunctuation(lit("Customer#000000007"))) == "Customer000000007")
    assert(evalStr(Fns.removePunctuation(lit("Aged 55 ¾"))) == "Aged_55_3-4")
    assert(evalStr(Fns.removePunctuation(lit("semi-colon; kept-dash"))) == "semi-colon_kept-dash")
    assert(evalStr(Fns.removePunctuation(lit("Café Ñandú"))) == "Cafe_Nandu")
    // ligature folds (unidecode behavior)
    assert(evalStr(Fns.removePunctuation(lit("Œuvre cœur Ærø straße")))
      == "OEuvre_coeur_AEro_strasse")
    // Latin Extended-A folds (unidecode rows a European corpus exercises)
    assert(evalStr(Fns.removePunctuation(lit("Łódź Ĳssel Þing ŒdipĀ")))
      == "Lodz_IJssel_Thing_OEdipA")
    assert(evalStr(Fns.removePunctuation(lit("Ştefan Ţara Ŋgoro Ǧ")))
      == "Stefan_Tara_Ngoro_Ǧ") // chars beyond the tables pass through, declared
  }

  test("removePunctuation transliterates Cyrillic and Greek (F1 widened)") {
    assert(evalStr(Fns.removePunctuation(lit("Достоевский"))) == "Dostoevskii")
    assert(evalStr(Fns.removePunctuation(lit("Пушкин Чехов"))) == "Pushkin_Chekhov")
    assert(evalStr(Fns.removePunctuation(lit("объять Щедрин"))) == "obiat_Shchedrin")
    assert(evalStr(Fns.removePunctuation(lit("Αθήνα"))) == "Athena")
    assert(evalStr(Fns.removePunctuation(lit("Ψυχή φιλοσοφία"))) == "Psukhe_philosophia")
    // CJK still passes through (declared out of scope)
    assert(evalStr(Fns.removePunctuation(lit("東京 loft"))) == "東京_loft")
  }

  test("limitWords reproduces utilities.py doctests") {
    assert(evalStr(Fns.limitWords(lit("This is a sample string"), 2)) == "This is...")
    assert(evalStr(Fns.limitWords(lit("This is a sample string"), 10)) == "This is a sample string")
    assert(evalStr(Fns.limitWords(lit("  spaced   out  words  "), 2)) == "spaced out...")
  }

  test("formatDate dispatches datatype by lexical length (activity.py:52-73)") {
    import graft.model.Ns
    def dt(s: String) = evalStr(Fns.formatDate(lit(s)).getField("dtype"))
    assert(dt("1891") == Ns.xsdGYear)
    assert(dt("1891-05") == Ns.xsdGYearMon)
    assert(dt("1891-05-03") == Ns.xsdDate)
    assert(dt("1891-05-03 12:00:01") == Ns.xsdDateTime)
    // NB: the dispatch is purely lexical-length (like the reference), so a
    // 5-char non-date would hit the gYear branch; 6 chars falls through.
    assert(dt("weirdo") == Ns.xsdString)
  }

  test("splitByCasing (utilities.py:215-216)") {
    assert(evalStr(Fns.splitByCasing(lit("camelCaseWords"))) == "camel Case Words")
  }

  test("dateCertainty map (activity.py:217-228)") {
    assert(evalStr(Fns.dateCertainty(lit("CERT"))) == "highCertainty")
    assert(evalStr(Fns.dateCertainty(lit("FROM"))) == "highCertainty")
    assert(evalStr(Fns.dateCertainty(lit("BY"))) == "mediumCertainty")
    assert(evalStr(Fns.dateCertainty(lit("C"))) == "mediumCertainty")
    assert(evalStr(Fns.dateCertainty(lit("ROUGHLYDATED"))) == "lowCertainty")
    assert(evalStr(Fns.dateCertainty(lit("???"))) == "unknownCertainty")
  }
}
