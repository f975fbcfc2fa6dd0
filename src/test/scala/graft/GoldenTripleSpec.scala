package graft

import graft.model.{Ns, Triple}
import graft.operators.{Emit, Link, Mentions, SameAs}
import java.sql.Timestamp

/** Golden triple sets (SURVEY.md §5 test plan item 1): a hand-written
  * conversation with hand-derived expected triples exercising every
  * extractor path — matched/unmatched places, authority/minted persons,
  * IRI/ISO-literal/fallback-literal occupations, W3 moved semantics,
  * ordinals, sameAs edges. Asserts EXACT set equality (P/R = 1.0).
  */
class GoldenTripleSpec extends SparkSpec {

  private val conv = "convA"
  private val cu = Ns.conv + conv

  private def turns = {
    import spark.implicits._
    Seq(
      (conv, 0, "user", "I visited Nation_3 and met Customer#000000007 working as novelist.", "", Timestamp.valueOf("2024-01-01 10:00:00")),
      (conv, 1, "user", "I visited Nation_28 and met Customer#000000199 working as zorbulator leaving Nation_3.", "", Timestamp.valueOf("2024-01-01 10:01:00")),
      (conv, 2, "user", "I met Customer#000000010 working as Ontarian leaving Nation_4.", "", Timestamp.valueOf("2024-01-01 10:02:00")),
      // multi-mention turn (find_all parity): 2 places, 2 persons, 2 occupations
      (conv, 3, "user", t3, "", Timestamp.valueOf("2024-01-01 10:03:00")),
      // two-sentence turn whose first sentence exceeds the snippet budget
      (conv, 4, "user", t4, "", Timestamp.valueOf("2024-01-01 10:04:00")),
      // education family: one authority hit (even academy), one skolem miss
      (conv, 5, "user", t5, "", Timestamp.valueOf("2024-01-01 10:05:00"))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  private def iri(s: String, p: String, o: String) = Triple(s, p, o, true, "", "")
  private def litStr(s: String, p: String, o: String) = Triple(s, p, o, false, "", Ns.xsdString)
  private def litLang(s: String, p: String, o: String) = Triple(s, p, o, false, "en", "")
  private def litPlain(s: String, p: String, o: String) = Triple(s, p, o, false, "", "")

  private def ctxTriples(kind: String, ord: Int, turn: Int, text: String) = {
    val c = s"${Ns.ctx}${conv}_${kind}Context_$ord"
    Seq(
      iri(c, Ns.rdfType, Ns.tContext),
      litPlain(c, Ns.hasTarget, s"/conv[$conv]/turn[$turn]"),
      litLang(c, Ns.hasSnippet, text))
  }

  /** Hand-derived Activity + Time-Span node (8 triples): typed partial-date
    * literal by lexical length, interval endpoints, certainty. */
  private def actTriples(kind: String, ord: Int, lex: String, dtype: String,
                         start: String, end: String, cert: String) = {
    val a = s"${Ns.act}${conv}_${kind}Activity_$ord"
    val tsp = a + "_time-span"
    Seq(
      iri(a, Ns.rdfType, Ns.tActivity),
      litLang(a, Ns.rdfsLabel, s"$conv $kind activity $ord"),
      iri(a, Ns.hasTimeSpan, tsp),
      iri(tsp, Ns.rdfType, Ns.tTimeSpan),
      Triple(tsp, Ns.atSomeTimeWithin, lex, false, "", dtype),
      Triple(tsp, Ns.beginOfBegin, start, false, "", Ns.xsdDateTime),
      Triple(tsp, Ns.endOfEnd, end, false, "", Ns.xsdDateTime),
      litPlain(tsp, Ns.hasCertainty, cert))
  }

  private val t0 = "I visited Nation_3 and met Customer#000000007 working as novelist."
  private val t1 = "I visited Nation_28 and met Customer#000000199 working as zorbulator leaving Nation_3."
  private val t2 = "I met Customer#000000010 working as Ontarian leaving Nation_4."
  private val t3 = "I visited Nation_3 and met Customer#000000007 working as singer" +
    " then visited Nation_5 and also met Customer#000000010 later working as weaver."
  private val t4 = "I met Customer#000000199 working as floozle one two three four" +
    " five six seven eight. We discussed the quarterly matters."
  // t4's first sentence has 14 words (13 spaces ≥ budget 12) → the snippet
  // drops the filler sentence (F6/F7, utilities.py:266-281 + context.py:277)
  private val t4snip = "I met Customer#000000199 working as floozle one two three four" +
    " five six seven eight."
  private val t5 = "Then I studied at Academy_2 and later studied at Academy_7."
  private val dt3 = "2024-01-01 10:03:00"           // turn 3's full-precision ts
  private val d0 = "2024-01-01 00:00:00"
  private val dYearEnd = "2024-12-31 23:59:59"
  private val dMonEnd = "2024-01-31 23:59:59"
  private val dDayEnd = "2024-01-01 23:59:59"

  private val golden: Set[Triple] = (Seq(
    // skeleton (biography.py:198-226 analog)
    iri(cu, Ns.rdfType, Ns.tPerson),
    litLang(cu, Ns.rdfsLabel, conv),
    // mention facts (set-dedup'd: t3 re-mentions person/7, person/10, place/3)
    iri(cu, Ns.mentionsPlace, Ns.place + "3"),            // Nation_28 unmatched → dropped
    iri(cu, Ns.mentionsPlace, Ns.place + "5"),            // t3 "then visited"
    iri(cu, Ns.leftPlace, Ns.place + "3"),
    iri(cu, Ns.leftPlace, Ns.place + "4"),
    iri(cu, Ns.knowsPerson, Ns.person + "7"),
    iri(cu, Ns.knowsPerson, Ns.kg + "temp/Customer000000199"), // minted (no authority row)
    iri(cu, Ns.knowsPerson, Ns.person + "10"),
    iri(cu, Ns.hasOccupation, Ns.occ + "novelist"),
    litStr(cu, Ns.hasOccupation, "zorbulator"),           // fallback literal
    litStr(cu, Ns.hasOccupation, "ISO-3166-2:CA-ON"),     // non-http dict term
    iri(cu, Ns.hasOccupation, Ns.occ + "singer"),
    iri(cu, Ns.hasOccupation, Ns.occ + "weaver"),
    litStr(cu, Ns.hasOccupation, "floozle"),
    iri(cu, Ns.hasEducation, Ns.kg + "edu/auth/2"),       // authority hit
    iri(cu, Ns.hasEducation, Ns.kg + "edu/skolem/Academy7"), // skolemized BNode
    // W3: Nation_3 (left at t1) is visited at t0/t3 → anti-joined out;
    // Nation_4 (left at t2) is never visited → spatialRelationship survives
    iri(cu, Ns.spatialRel, Ns.place + "4"),
    // sameAs: viaf = custkey DIV 3; chain person_k→person_{k-1} iff k%5≠0
    iri(Ns.person + "7", Ns.owlSameAs, Ns.viaf + "2"),
    iri(Ns.person + "7", Ns.owlSameAs, Ns.person + "6"),
    iri(Ns.person + "10", Ns.owlSameAs, Ns.viaf + "3"))
    // contexts with per-(conv, kind) ordinals, document order (turn, midx)
    ++ ctxTriples("place", 1, 0, t0)
    ++ ctxTriples("place", 2, 3, t3)       // t3 midx 0 (Nation_3)
    ++ ctxTriples("place", 3, 3, t3)       // t3 midx 1 (Nation_5)
    ++ ctxTriples("place_left", 1, 1, t1)
    ++ ctxTriples("place_left", 2, 2, t2)
    ++ ctxTriples("person", 1, 0, t0)
    ++ ctxTriples("person", 2, 1, t1)
    ++ ctxTriples("person", 3, 2, t2)
    ++ ctxTriples("person", 4, 3, t3)      // t3 midx 0 (Customer#7)
    ++ ctxTriples("person", 5, 3, t3)      // t3 midx 1 (Customer#10)
    ++ ctxTriples("person", 6, 4, t4snip)
    ++ ctxTriples("occupation", 1, 0, t0)
    ++ ctxTriples("occupation", 2, 1, t1)
    ++ ctxTriples("occupation", 3, 2, t2)
    ++ ctxTriples("occupation", 4, 3, t3)  // singer
    ++ ctxTriples("occupation", 5, 3, t3)  // weaver
    ++ ctxTriples("occupation", 6, 4, t4snip)
    ++ ctxTriples("education", 1, 5, t5)   // t5 midx 0 (Academy_2)
    ++ ctxTriples("education", 2, 5, t5)   // t5 midx 1 (Academy_7)
    // activities (place/place_left/occupation only): precision cycles with
    // turn%4 (0→gYear 1→gYearMonth 2→date 3→dateTime), certainty with turn%5
    ++ actTriples("place", 1, "2024", Ns.xsdGYear, d0, dYearEnd, "highCertainty")
    // turn 3: cert code 3%5=3 → 'C' → mediumCertainty (the reference's
    // certainty_map has no low entry besides ROUGHLYDATED, activity.py:216-229)
    ++ actTriples("place", 2, dt3, Ns.xsdDateTime, dt3, dt3, "mediumCertainty")
    ++ actTriples("place", 3, dt3, Ns.xsdDateTime, dt3, dt3, "mediumCertainty")
    ++ actTriples("place_left", 1, "2024-01", Ns.xsdGYearMon, d0, dMonEnd, "mediumCertainty")
    ++ actTriples("place_left", 2, "2024-01-01", Ns.xsdDate, d0, dDayEnd, "mediumCertainty")
    ++ actTriples("occupation", 1, "2024", Ns.xsdGYear, d0, dYearEnd, "highCertainty")
    ++ actTriples("occupation", 2, "2024-01", Ns.xsdGYearMon, d0, dMonEnd, "mediumCertainty")
    ++ actTriples("occupation", 3, "2024-01-01", Ns.xsdDate, d0, dDayEnd, "mediumCertainty")
    ++ actTriples("occupation", 4, dt3, Ns.xsdDateTime, dt3, dt3, "mediumCertainty")
    ++ actTriples("occupation", 5, dt3, Ns.xsdDateTime, dt3, dt3, "mediumCertainty")
    ++ actTriples("occupation", 6, "2024", Ns.xsdGYear, d0, dYearEnd, "lowCertainty")
    // turn 5: prec 5%4=1 → gYearMonth; cert 5%5=0 → high
    ++ actTriples("education", 1, "2024-01", Ns.xsdGYearMon, d0, dMonEnd, "highCertainty")
    ++ actTriples("education", 2, "2024-01", Ns.xsdGYearMon, d0, dMonEnd, "highCertainty")).toSet

  test("triple emission matches the hand-derived golden set exactly (P/R = 1.0)") {
    import spark.implicits._
    val tr = turns
    val linked = Link.linkAll(spark, sfDir, Mentions.extract(tr))
    val got = Emit.allTriples(spark, sfDir, tr, linked).as[Triple].collect().toSet
    val missing = golden -- got
    val extra = got -- golden
    assert(missing.isEmpty, s"missing triples: ${missing.mkString("\n")}")
    assert(extra.isEmpty, s"unexpected triples: ${extra.mkString("\n")}")
    assert(got.size == 182) // facts + contexts + activities, education family included
  }

  test("canonicalization rewrites identities to the component min label") {
    import spark.implicits._
    val tr = turns
    val linked = Link.linkAll(spark, sfDir, Mentions.extract(tr))
    val triples = Emit.allTriples(spark, sfDir, tr, linked)
    val canon = SameAs.closure(SameAs.edgesOf(triples))
      .as[(String, String)].collect().toMap
    // component {person/6, person/7, viaf/2} → min is person/10? no:
    // lexicographically "http://kg.graft/person/6" < "http://kg.graft/person/7" < "http://viaf.graft/2"
    assert(canon(Ns.person + "7") == Ns.person + "6")
    assert(canon(Ns.viaf + "2") == Ns.person + "6")
    assert(canon(Ns.person + "10") == Ns.person + "10")
    assert(canon(Ns.viaf + "3") == Ns.person + "10")
    val rewritten = SameAs.canonicalize(triples, SameAs.closure(SameAs.edgesOf(triples)))
      .as[Triple].collect().toSet
    assert(rewritten.contains(iri(cu, Ns.knowsPerson, Ns.person + "6")))
    assert(!rewritten.exists(t => t.pred == Ns.knowsPerson && t.obj_value == Ns.person + "7"))
    // fixpoint: canonicalizing again changes nothing
    val again = SameAs.canonicalize(
      SameAs.canonicalize(triples, SameAs.closure(SameAs.edgesOf(triples))),
      SameAs.closure(SameAs.edgesOf(triples))).as[Triple].collect().toSet
    assert(again == rewritten)
  }
}
