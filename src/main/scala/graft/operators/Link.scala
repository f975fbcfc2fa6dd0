package graft.operators

import graft.functions.Fns
import graft.model.Ns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking: mentions × broadcast authority dictionaries
  * (SURVEY.md §2.3 J1/J2/J5). Every join here is an explicit
  * `broadcast(dict)` hash join — dictionaries are authority snapshots,
  * always small relative to the fact side; at 10^12 turns the fact side
  * never shuffles for linking. Per-kind unmatched behavior mirrors the
  * reference:
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

  /** Unified linked-mention schema:
    * (conv_id, turn_idx, kind, surface, matched, obj_value, obj_is_iri,
    *  obj_lang, obj_dtype). Rows whose object must be dropped (unmatched
    * places) are KEPT here with matched=false and obj_value null — emission
    * filters them, metrics counts them.
    */
  def linkAll(spark: SparkSession, dir: String, mentions: DataFrame): DataFrame = {
    import graft.sources.Dicts

    val placeDict = broadcast(Dicts.places(spark, dir))
    val occDict   = broadcast(Dicts.occupations(spark))
    val peopleDict = broadcast(
      Dicts.people(spark, dir).select(col("key"), col("uri")))
    val orgDict = broadcast(Dicts.orgs(spark, dir))

    val places = mentions.filter(col("kind").isin("place", "place_left"))
      .withColumn("key", Fns.cleanTermSimple(col("surface")))
      .join(placeDict, Seq("key"), "left")
      .select(col("conv_id"), col("turn_idx"), col("kind"), col("surface"), col("text"),
        col("uri").isNotNull.as("matched"),
        col("uri").as("obj_value"),
        col("uri").isNotNull.as("obj_is_iri"),
        lit("").as("obj_lang"), lit("").as("obj_dtype"))

    val persons = mentions.filter(col("kind") === "person")
      .withColumn("key", lower(col("surface")))
      .join(peopleDict, Seq("key"), "left")
      .select(col("conv_id"), col("turn_idx"), col("kind"), col("surface"), col("text"),
        col("uri").isNotNull.as("matched"),
        coalesce(col("uri"), Fns.mintUri(Ns.kg + "temp/", col("surface")))
          .as("obj_value"),
        lit(true).as("obj_is_iri"),
        lit("").as("obj_lang"), lit("").as("obj_dtype"))

    val orgs = mentions.filter(col("kind") === "org")
      .withColumn("key", lower(col("surface")))
      .join(orgDict, Seq("key"), "left")
      .select(col("conv_id"), col("turn_idx"), col("kind"), col("surface"), col("text"),
        col("uri").isNotNull.as("matched"),
        coalesce(col("uri"),
          concat(Fns.mintUri(Ns.org, col("surface")), lit("_ORG")))
          .as("obj_value"),
        lit(true).as("obj_is_iri"),
        lit("").as("obj_lang"), lit("").as("obj_dtype"))

    val occs = mentions.filter(col("kind") === "occupation")
      .withColumn("key", Fns.cleanTerm(col("surface")))
      .join(occDict, Seq("key"), "left")
      .select(col("conv_id"), col("turn_idx"), col("kind"), col("surface"), col("text"),
        col("term").isNotNull.as("matched"),
        when(col("is_iri"), col("term"))
          .when(col("term").isNotNull, concat(lit("ISO-3166-2:"), col("term")))
          .otherwise(col("surface")).as("obj_value"),
        coalesce(col("is_iri"), lit(false)).as("obj_is_iri"),
        lit("").as("obj_lang"),
        when(coalesce(col("is_iri"), lit(false)), lit(""))
          .otherwise(lit(Ns.xsdString)).as("obj_dtype"))

    places.unionAll(persons).unionAll(orgs).unionAll(occs)
  }
}
