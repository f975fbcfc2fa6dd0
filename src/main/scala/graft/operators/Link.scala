package graft.operators

import graft.functions.Fns
import graft.model.Ns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking: mentions × broadcast authority dictionaries
  * (SURVEY.md §2.3 J1/J2/J5).
  *
  * SINGLE-PASS design: the four authority dictionaries (places, people,
  * orgs, occupations) are unioned into ONE broadcast table keyed by
  * (kind, key); the mention stream computes its per-kind normalized key in
  * one projection and joins ONCE. One scan of the fact side, one broadcast
  * hash join — at 10^12 turns the fact side never shuffles and is never
  * re-read (the previous per-kind-branch design re-scanned the input 4×).
  *
  * Per-kind unmatched behavior mirrors the reference:
  *  - place: unmatched → dropped from emission, counted in metrics
  *    (`Utils/utilities.py:375-385` filters null place URIs;
  *    `Utils/place.py:146-156` logs UNMAPPED_OCCURENCES);
  *  - person: unmatched → deterministic minted URI
  *    (`make_standard_uri`, `Utils/utilities.py:289-316`);
  *  - org: unmatched → minted "_ORG" URI (`Utils/organizations.py:56-83`);
  *  - occupation: matched IRI → IRI object; matched non-http term →
  *    Literal("ISO-3166-2:"+term, xsd:string); unmatched → fallback
  *    Literal(surface, xsd:string) (`Biography/culturalForm.py:570-604`).
  */
object Link {

  /** All four dictionaries as one (kind, key, d_term, d_is_iri) table.
    * place_left shares the place dictionary via the dkind mapping below. */
  def unifiedDict(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Dicts
    val places = Dicts.places(spark, dir).select(
      lit("place").as("kind"), col("key"),
      col("uri").as("d_term"), lit(true).as("d_is_iri"))
    val people = Dicts.people(spark, dir).select(
      lit("person").as("kind"), col("key"),
      col("uri").as("d_term"), lit(true).as("d_is_iri"))
    val orgs = Dicts.orgs(spark, dir).select(
      lit("org").as("kind"), col("key"),
      col("uri").as("d_term"), lit(true).as("d_is_iri"))
    val occs = Dicts.occupations(spark).select(
      lit("occupation").as("kind"), col("key"),
      col("term").as("d_term"), col("is_iri").as("d_is_iri"))
    val edus = Dicts.educations(spark).select(
      lit("education").as("kind"), col("key"),
      col("uri").as("d_term"), lit(true).as("d_is_iri"))
    places.unionAll(people).unionAll(orgs).unionAll(occs).unionAll(edus)
  }

  /** Unified linked-mention schema:
    * (conv_id, turn_idx, kind, midx, surface, matched, obj_value,
    *  obj_is_iri, obj_lang, obj_dtype [, text, ts ride-alongs]).
    * Rows whose object must be dropped (unmatched places) are KEPT here
    * with matched=false and obj_value null — emission filters them,
    * metrics counts them.
    */
  def linkAll(spark: SparkSession, dir: String, mentions: DataFrame): DataFrame = {
    val dict = broadcast(unifiedDict(spark, dir))

    val isPlace = col("kind").isin("place", "place_left")
    val keyed = mentions
      // per-kind key normalization in ONE projection over the single scan
      .withColumn("dkind",
        when(col("kind") === "place_left", lit("place")).otherwise(col("kind")))
      .withColumn("key",
        when(isPlace, Fns.cleanTermSimple(col("surface")))
          .when(col("kind") === "occupation", Fns.cleanTerm(col("surface")))
          .otherwise(lower(col("surface"))))

    val matchedIri = coalesce(col("d_is_iri"), lit(false))
    keyed
      .join(dict.withColumnRenamed("kind", "dkind"), Seq("dkind", "key"), "left")
      // the cleaned mint stem is computed ONCE as its own column: inlining
      // Fns.removePunctuation's (config-sized but long) fold chain into
      // every CASE branch replicated it ~6× per row (3 mint branches ×
      // again inside the join's pushed isnotnull predicate), blowing the
      // generated code past janino's 64 KB limit and knocking the whole
      // linking stage out of whole-stage codegen
      .withColumn("mint_stem", Fns.removePunctuation(col("surface")))
      .select(col("conv_id"), col("turn_idx"), col("kind"), col("midx"),
        col("surface"), col("text"), col("ts"),
        col("d_term").isNotNull.as("matched"),
        when(isPlace, col("d_term")) // null when unmatched → dropped at emit
          .when(col("kind") === "person",
            coalesce(col("d_term"), concat(lit(Ns.kg + "temp/"), col("mint_stem"))))
          .when(col("kind") === "org",
            coalesce(col("d_term"),
              concat(lit(Ns.org), col("mint_stem"), lit("_ORG"))))
          // education: authority IRI | deterministic skolem IRI (the
          // reference's education BNodes, skolemized per SURVEY §7.4-3)
          .when(col("kind") === "education",
            coalesce(col("d_term"),
              concat(lit(Ns.kg + "edu/skolem/"), col("mint_stem"))))
          // occupation: IRI | ISO literal | fallback literal
          .when(matchedIri, col("d_term"))
          .when(col("d_term").isNotNull, concat(lit("ISO-3166-2:"), col("d_term")))
          .otherwise(col("surface"))
          .as("obj_value"),
        when(isPlace, col("d_term").isNotNull)
          .when(col("kind").isin("person", "org", "education"), lit(true))
          .otherwise(matchedIri).as("obj_is_iri"),
        lit("").as("obj_lang"),
        when(col("kind") === "occupation" && !matchedIri, lit(Ns.xsdString))
          .otherwise(lit("")).as("obj_dtype"))
  }
}
