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
  * Scale: ONE groupBy(subj) partial-agg shuffle over key-plus-payload; the
  * per-predicate grouping happens inside each subject's collected array
  * (sorted (pred, obj) structs folded into the entry list with one
  * `aggregate` pass) instead of a second full shuffle of the same payload.
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
    // ONE shuffle: collect (pred, o) per subject, sort the struct array
    // (pred-major, object-minor — exactly the order the former
    // sort-entries-then-sort-objects two-level shape produced: entry
    // strings "<pred>":[…] sort identically to their preds because '"'
    // precedes every IRI character), then fold it into the entry list,
    // opening a new "pred":[ run whenever the pred changes.
    triples
      .select(col("subj"), struct(col("pred"), obj.as("o")).as("po"))
      .groupBy("subj")
      .agg(array_sort(collect_list(col("po"))).as("pos"))
      .select(concat(
        lit("{\"@id\":\""), col("subj"), lit("\","),
        aggregate(col("pos"),
          struct(lit("").as("s"), lit("").as("lp")),
          (acc, x) => struct(
            concat(acc("s"),
              when(acc("lp") === x("pred"), concat(lit(","), x("o")))
                .otherwise(concat(
                  when(acc("lp") === lit(""), lit("")).otherwise(lit("],")),
                  lit("\""), x("pred"), lit("\":["), x("o")))).as("s"),
            x("pred").as("lp")),
          acc => concat(acc("s"), lit("]"))),
        lit("}")).as("line"))
  }
}
