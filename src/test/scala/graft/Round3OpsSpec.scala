package graft

import graft.model.Ns
import graft.operators.{Names, Profiles, Titles}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Hand-checked specs for the round-3 extraction families: personname,
  * titles (cross-linked authority), Writing contexts, lifeInfo keywords. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 10:00:00")

  private def tr(rows: (String, Int, String, String)*) =
    rows.map { case (c, t, r, x) => (c, t, r, x, "", ts) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("personname: first-wins dedup, IndexedName std entry, context skips it") {
    val t = tr(
      ("c1", 0, "user", "met X nicknamed Nick_3."),
      ("c1", 1, "user", "met Y nicknamed Nick_3."), // duplicate name — ignored
      ("c1", 2, "assistant", "Z born Given_1 Family_2."))
    val got = Names.nameTriples(t).as[model.Triple].collect().toSet
    val nick = Ns.name + "c1_NameEnt_Nick3"
    val born = Ns.name + "c1_NameEnt_Given1_Family2"
    val pnctx = Ns.ctx + "c1_PersonNameContext_0"
    // document-first (the nickname) plays STANDARD/IndexedName
    assert(got.contains(model.Triple(nick, Ns.rdfType, Ns.tIndexedName, true, "", "")))
    assert(got.contains(model.Triple(nick, Ns.indexedBy, "Orlando", false, "", "")))
    // the context links every variant EXCEPT the std entry (name_list[1:])
    assert(got.contains(model.Triple(pnctx, Ns.hasName, born, true, "", "")))
    assert(!got.contains(model.Triple(pnctx, Ns.hasName, nick, true, "", "")))
    // connotation dispatch: Nick_3 → k=3 → LocalName (index 3)
    assert(got.contains(model.Triple(nick, Ns.rdfType, Ns.kg + "type/LocalName", true, "", "")))
    // WROTEORPUBLISHEDAS analog: assistant turn → AuthorialName
    assert(got.contains(model.Triple(born, Ns.rdfType, Ns.tAuthorialName, true, "", "")))
    assert(!got.contains(model.Triple(nick, Ns.rdfType, Ns.tAuthorialName, true, "", "")))
    // birth-name part graph with sort orders
    val g = Ns.name + "Given1"
    val f = Ns.name + "Family2"
    assert(got.contains(model.Triple(g, Ns.rdfType, Ns.tForename, true, "", "")))
    assert(got.contains(model.Triple(g, Ns.hasSortOrder, "1", false, "", Ns.xsdInt)))
    assert(got.contains(model.Triple(f, Ns.hasSortOrder, "2", false, "", Ns.xsdInt)))
    assert(got.contains(model.Triple(born, Ns.hasNamePart, f, true, "", "")))
    // the duplicate mention added nothing beyond the set semantics
    assert(got.count(t => t.pred == Ns.rdfsLabel && t.obj_value == "Nick_3") == 1)
  }

  test("titles: ct_islink self-join pairs labels/types; garbage row dropped") {
    val d = Titles.dict(spark)
      .select(col("key"), col("labels"), col("types"))
      .as[(String, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // row 1 links to row 2: BOTH keys carry [other, item] = [Title_2, Title_1]
    assert(d("Title_1")._1 == Seq("Title_2", "Title_1"))
    assert(d("Title_2")._1 == Seq("Title_2", "Title_1"))
    assert(d("Title_1")._2 == Seq(Titles.titleRows(2)._3, Titles.titleRows(1)._3))
    // row 3 has non-numeric ct_islink "x" → ValueError→continue → NO entry
    assert(!d.contains("Title_3"))
    // a plain row is a single
    assert(d("Title_0")._1 == Seq("Title_0"))
    // unknown titletype (Manuscript) yields no class triple (KeyError→skip)
    val trip = Titles.titleTriples(spark, tr(("c1", 0, "user", "nothing here.")))
    val classes = trip.filter(col("pred") === Ns.rdfType)
      .select("obj_value").as[String].collect().toSet
    assert(!classes.exists(_.toLowerCase.contains("manuscript")))
    assert(classes.contains(Ns.kg + "type/standaloneWork"))
    assert(classes.contains(Ns.kg + "type/embeddedWork"))
  }

  test("writing: profile = limit_words(35) of the FIRST system turn; genres harvested") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val t = tr(
      ("c1", 0, "user", "ignored."),
      ("c1", 1, "system", s"$words working as novelist."),
      ("c1", 2, "system", "second summary — ignored working as weaver."))
    val got = Profiles.writingTriples(t).as[model.Triple].collect().toSet
    val ctx1 = Ns.ctx + "c1_WritingContext_1"
    val ctx2 = Ns.ctx + "c1_WritingContext_2"
    val expectedProfile = (1 to 35).map(i => s"w$i").mkString(" ") + "..."
    assert(got.contains(model.Triple(ctx1, Ns.profile, expectedProfile, false, "", "")))
    assert(got.contains(model.Triple(ctx2, Ns.genericRangeIncludes, "novelist", false, "", "")))
    assert(!got.exists(_.obj_value == "weaver"), "only the FIRST system turn is the summary")
  }

  test("other_contexts: id replace semantics, per-family ordinals, labels") {
    // conv_000100 spans eids 2000-2019+; 2001 = 23*87 (fam 87%5=2 →
    // LeisureAndSociety), 2116 = 23*92 (fam 92%5=2 — SAME family → n=2),
    // 2024 = 23*88 (fam 3 → OtherLifeEvent, its own ordinal stream)
    val t = Seq(
      ("conv_000100", 1, "user", "anything.", "", ts),
      ("conv_000100", 116, "user", "anything.", "", ts),
      ("conv_000100", 24, "user", "anything.", "", ts),
      ("conv_000100", 2, "user", "non-participating.", "", ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = Profiles.otherContextTriples(t).as[model.Triple].collect().toSet
    val c1 = Ns.ctx + "conv_000100_LeisureAndSocietyContext_1"
    val a1 = Ns.ctx + "conv_000100_LeisureAndSocietyEvent_1_1"
    val c2 = Ns.ctx + "conv_000100_LeisureAndSocietyContext_2"
    val a2 = Ns.ctx + "conv_000100_LeisureAndSocietyEvent_2_2"
    val c3 = Ns.ctx + "conv_000100_OtherLifeEventContext_1"
    assert(got.contains(model.Triple(c1, Ns.pred + "linksActivity", a1, true, "", "")))
    assert(got.contains(model.Triple(c2, Ns.pred + "linksActivity", a2, true, "", "")))
    assert(got.contains(model.Triple(a1, Ns.rdfType,
      Ns.kg + "event/LeisureAndSocietyEvent", true, "", "")))
    assert(got.contains(model.Triple(a1, Ns.rdfsLabel,
      "Leisure And Society Event", false, "en", "")))
    assert(got.exists(_.subj == c3), "OtherLifeEvent family gets its own stream")
    // the lowercase context/ namespace survives the Context→Event replace
    assert(!got.exists(_.obj_value.contains("event/conv")), "namespace untouched")
    assert(got.size == 18, "3 participating turns x 6 triples")
  }

  test("citations: REF path uses the CLEANED suffix, temp path the RAW dbref") {
    val t = Seq(
      ("c1", 0, "tool", "cited text.", "tool_4", ts),
      ("c1", 1, "tool", "cited text.", "tool_1", ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = Profiles.citationTriples(t).as[model.Triple].collect().toSet
    // REF present (k≥3): node = REF + "_dbref_" + remove_punctuation suffix
    val refCite = Ns.work + "4_dbref_tool4"
    assert(got.contains(model.Triple(Ns.conv + "c1", Ns.refersTo, refCite, true, "", "")))
    assert(got.contains(model.Triple(refCite, Ns.referredToBy, Ns.work + "4", true, "", "")))
    // REF missing: node from the RAW DBREF (citation.py:48-50 asymmetry)
    val tmpCite = Ns.kg + "temp/dbref_tool_1"
    assert(got.contains(model.Triple(tmpCite, Ns.referredToBy, Ns.kg + "temp/tool_1", true, "", "")))
    assert(got.contains(model.Triple(tmpCite, Ns.rdfType, Ns.tCitation, true, "", "")))
    assert(got.contains(model.Triple(refCite, Ns.symbolicContent, "0", false, "", "")))
  }

  test("lifeinfo: keyword categories, unspecified fallback, burial events") {
    val t = tr(
      ("c1", 0, "user", "spoke while discussing adoption."),
      ("c1", 1, "user", "spoke while discussing gardening."),
      ("c1", 2, "user", "spoke while discussing the grave."),
      ("c1", 3, "user", "no tag here miscarriage.")) // keyword without the tag → ignored
    val got = Profiles.lifeInfoTriples(t).as[model.Triple].collect().toSet
    val cu = Ns.conv + "c1"
    assert(got.contains(model.Triple(cu, Ns.reproductiveHistory, Ns.bio + "adoption", true, "", "")))
    assert(!got.exists(_.obj_value == Ns.bio + "miscarriage"),
      "keywords only classify tagged (CHILDLESSNESS-analog) turns")
    assert(got.contains(model.Triple(cu, Ns.unspecifiedReproHist,
      Ns.bio + "unspecifiedReproductiveHistory", true, "", "")))
    val ev = Ns.event + "c1_BurialEvent_1"
    assert(got.contains(model.Triple(ev, Ns.rdfsLabel, "Burial Event", false, "", "")))
    assert(got.contains(model.Triple(cu, Ns.burialEvent, ev, true, "", "")))
  }
}
