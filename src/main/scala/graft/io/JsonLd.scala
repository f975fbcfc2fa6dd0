package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON-LD-lines export (K2 — one of the reference's serialization formats,
  * `Utils/utilities.py:807-808` lists json-ld): one compacted node object
  * per subject per line:
  *
  *   {"@id":"<subj>","<pred>":[<obj>,...],...}
  *
  * with objects as {"@id":...} for IRIs and {"@value":...[,"@language"|
  * "@type":...]} for literals — predicate entries and object lists sorted
  * for deterministic line sets. Escaping covers quote/backslash (the
  * emitted value domain carries no control characters; the oracle pins it).
  *
  * Scale: groupBy(subj, pred) then groupBy(subj) — two partial-agg
  * shuffles over key-plus-payload only.
  */
object JsonLd {

  private def esc(c: org.apache.spark.sql.Column) =
    replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\""))

  def export(triples: DataFrame): DataFrame = {
    val obj = when(col("obj_is_iri"),
      concat(lit("{\"@id\":\""), esc(col("obj_value")), lit("\"}")))
      .when(col("obj_lang") =!= "",
        concat(lit("{\"@value\":\""), esc(col("obj_value")),
          lit("\",\"@language\":\""), col("obj_lang"), lit("\"}")))
      .when(col("obj_dtype") =!= "",
        concat(lit("{\"@value\":\""), esc(col("obj_value")),
          lit("\",\"@type\":\""), col("obj_dtype"), lit("\"}")))
      .otherwise(concat(lit("{\"@value\":\""), esc(col("obj_value")), lit("\"}")))
    val perPred = triples
      .select(col("subj"), col("pred"), obj.as("o"))
      .groupBy("subj", "pred")
      .agg(array_join(array_sort(collect_list(col("o"))), ",").as("objs"))
      .select(col("subj"),
        concat(lit("\""), col("pred"), lit("\":["), col("objs"), lit("]"))
          .as("entry"))
    perPred.groupBy("subj")
      .agg(array_join(array_sort(collect_list(col("entry"))), ",").as("entries"))
      .select(concat(lit("{\"@id\":\""), col("subj"), lit("\","),
        col("entries"), lit("}")).as("line"))
  }
}
