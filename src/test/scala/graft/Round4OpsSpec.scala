package graft

import graft.model.Ns
import graft.operators.{Ann, Families}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Hand-checked specs for the round-4 families (gender, per-relation family
  * predicates, cause-of-death, title refs, Writer Oeuvre) and the bounded
  * ANN driver-side samples. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 10:00:00")

  private def tr(rows: (String, Int, String, String, String)*) =
    rows.map { case (c, t, r, x, tool) => (c, t, r, x, tool, ts) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("ANN driver samples are ABSOLUTELY bounded at any corpus size") {
    // fixture scale: the documented base moduli apply unchanged
    assert(Ann.trainModFor(500L) == Ann.TrainMod)
    assert(Ann.queryModFor(500L) == Ann.QueryMod)
    // 10^9-vector scale: sample size = n / mod stays ≤ the cap
    for (n <- Seq(1000000L, 123456789L, 1000000000L, 7777777777L)) {
      assert(n / Ann.trainModFor(n) <= Ann.TrainCap, s"train sample at n=$n")
      assert(n / Ann.queryModFor(n) <= Ann.QueryCap, s"query set at n=$n")
    }
  }

  test("family predicates: verbatim-map quirks drive the placeholder branch") {
    // familyMap replays the CSV verbatim: BROTHER carries ' MALE' (leading
    // space) and several relations the literal 'None' — neither can ever
    // equal an uppercased writer sex, so those relations ALWAYS take the
    // placeholder for dictionary-known members
    assert(Families.familyMap.find(_._1 == "BROTHER").get._3 == " MALE")
    assert(Families.familyMap.find(_._1 == "CHILD").get._3 == "None")
    assert(Families.familyMap.length == 28)
    // composed over a synthetic linked frame: matched person with a
    // conflicting sex → placeholder; unknown person → minted URI kept
    val linked = Seq(
      ("conv_000001", 0, "person", 0, "Customer#000000002", true,
        Ns.person + "2", true, "", ""),
      ("conv_000001", 1, "person", 0, "Customer#000000999", false,
        Ns.kg + "temp/Customer000000999", true, "", ""))
      .toDF("conv_id", "turn_idx", "kind", "midx", "surface", "matched",
        "obj_value", "obj_is_iri", "obj_lang", "obj_dtype")
    val got = Families.familyTriples(spark, sfDir, linked)
      .as[model.Triple].collect()
    // eid=20: relIdx (20*3+0)%28 = 4 → DAUGHTER/FEMALE; person 2 gender:
    // custkey 2 DIV 2 = 1 odd → male → conflict → placeholder
    val conv = Ns.conv + "conv_000001"
    assert(got.contains(model.Triple(conv, Ns.pred + "daughter",
      conv + "_PLACEHOLDER_daughter", true, "", "")))
    // eid=21: relIdx 63%28 = 7 → GRANDDAUGHTER; unknown member unchanged
    assert(got.contains(model.Triple(conv, Ns.pred + "grandDaughter",
      Ns.kg + "temp/Customer000000999", true, "", "")))
  }

  test("cause-of-death: URIRef, category-literal, and fallback branches") {
    val t = tr(
      ("c1", 0, "user", "x while discussing syphilis.", ""),
      ("c1", 1, "user", "x while discussing miscarriage.", ""),
      ("c1", 2, "user", "x while discussing gardening.", ""),
      ("c1", 3, "user", "no cause here.", ""))
    val got = Families.deathCauses(t).as[model.Triple].collect().toSet
    val conv = Ns.conv + "c1"
    assert(got.contains(model.Triple(conv, Ns.causeOfDeath,
      "http://id.lincsproject.ca/ii/VenerealDisease", true, "", "")))
    assert(got.contains(model.Triple(conv, Ns.causeOfDeath,
      "Pregnancy_or_childbirth", false, "", Ns.xsdString)))
    assert(got.contains(model.Triple(conv, Ns.causeOfDeath,
      "gardening", false, "", Ns.xsdString)))
    assert(got.size == 3)
  }

  test("cause-of-death near-miss: adoption → abortion at levenshtein 2") {
    val t = tr(("c1", 0, "user", "x while discussing adoption.", ""))
    val nm = Families.codNearMiss(t)
      .select("cause", "candidate", "lev").as[(String, String, Int)].collect()
    assert(nm.contains(("adoption", "abortion", 2)))
  }

  test("title refs: seen-dedup, dbref-less skip, matched/unmatched split") {
    val t = tr(
      // conv a: first bibcit tool_3 → dbref 3 → ref title Title_6
      ("a", 0, "user", "reading Title_6.", ""),
      ("a", 1, "user", "reading Title_6.", ""), // titles_seen dedup
      ("a", 2, "user", "reading Title_8.", ""), // ≠ Title_6 → unmatched
      ("a", 3, "tool", "cite.", "tool_3"),
      ("a", 4, "tool", "cite.", "tool_4"), // not first — ignored
      // conv b: bibcit without dbref (k<3) → rows SKIPPED entirely
      ("b", 0, "user", "reading Title_2.", ""),
      ("b", 1, "tool", "cite.", "tool_1"),
      // conv c: no bibcit at all → unmatched
      ("c", 0, "user", "reading Title_4.", ""))
    val got = Families.titleRefs(t)
      .as[(String, String, String, Int)].collect().toSet
    assert(got == Set(
      ("a", "Title_6", "matched", 3),
      ("a", "Title_8", "unmatched", -1),
      ("c", "Title_4", "unmatched", -1)))
  }

  test("closure: driver union-find ≡ iterative min-label propagation") {
    // chains, a star, a singleton edge, and two disjoint components —
    // incl. a merge where the min label arrives via the LATER union
    val edges = Seq(
      ("n5", "n4"), ("n4", "n3"), ("n3", "n2"), ("n2", "n1"),
      ("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("s3", "a0"),
      ("x2", "x1"), ("z9", "z8")).toDF("a", "b")
    val fast = operators.SameAs.closure(edges)
      .as[(String, String)].collect().toSet
    val iter = operators.SameAs.closureIterative(edges)
      .as[(String, String)].collect().toSet
    assert(fast == iter, s"driver=$fast iterative=$iter")
    assert(fast.contains(("n5", "n1")) && fast.contains(("hub", "a0")))
  }

  test("birth position: MIDDLE never maps (the reference's MIDDLE: typo)") {
    // eids 17, 34, 51, 68 → positions (eid DIV 17) % 4 = 1,2,3,0 →
    // ELDEST, YOUNGEST, MIDDLE, ONLY; MIDDLE must silently drop
    val rows = Seq(17L, 34L, 51L, 68L).map { eid =>
      (f"conv_${eid / 20}%06d", (eid % 20).toInt, "user",
        "x born Given_1 Family_2.", "", ts)
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = Families.birthPositionTriples(rows)
      .as[model.Triple].collect().toSet
    val objs = got.map(_.obj_value)
    assert(objs == Set(Ns.bio + "eldestChild", Ns.bio + "youngestChild",
      Ns.bio + "onlyChild"), s"got $objs")
  }

  test("writing: Oeuvre node typed+labelled+authored, extent attached") {
    val t = tr(("c1", 1, "system", "summary text working as weaver.", ""))
    val got = operators.Profiles.writingTriples(t)
      .as[model.Triple].collect().toSet
    val oeuvre = Ns.conv + "c1_Oeuvre"
    assert(got.contains(model.Triple(oeuvre, Ns.rdfType, Ns.tOeuvre, true, "", "")))
    assert(got.contains(model.Triple(Ns.conv + "c1", Ns.bfAuthor, oeuvre, true, "", "")))
    assert(got.contains(model.Triple(oeuvre, Ns.rdfsLabel, "c1's Oeuvre", false, "", "")))
    assert(got.contains(model.Triple(oeuvre, Ns.extent,
      "summary text working as weaver.", false, "", "")))
  }
}
