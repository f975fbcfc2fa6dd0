package graft.operators

import graft.model.Ns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bibliography two-phase, two-source join — the graft analog of the
  * reference's largest module (`Mods/modsBib.py`):
  *
  *  - phase 1: scan the "writing" fact table and aggregate a DBREF→genre
  *    map (`WritingParse.parse_db_refs`, `Mods/modsBib.py:288-347`: many
  *    TEXTSCOPEs per DBREF, genres collected per record id). Graft: the
  *    lineitem table plays the writing docs (many lines per orderkey), the
  *    genre of a line is its returnflag+linestatus code.
  *  - phase 2: scan the "bibliography" fact table and emit per-record CIDOC
  *    triples, joining the phase-1 genre map in on the shared key
  *    (`BibliographyParse.build_graph`, `modsBib.py:817-1236`). Graft: the
  *    orders table plays the bibliography records (one per orderkey),
  *    authored by its customer (person URIs — the same namespace the
  *    mention pipeline links into, like modsBib's PEOPLE_MAPPING rewrite at
  *    `modsBib.py:789-815`).
  *
  * Scale design: this is the engine's one genuine FACT×FACT join — both
  * sides are large, so neither can broadcast. Phase 1 is a partial-agg
  * groupBy (collect_set per key); the join is pinned to sort-merge
  * (`hint("merge")`) because that IS the right plan at 10^12 rows — at
  * fixture scale AQE would broadcast the aggregated side and hide the plan
  * class under test. AQE skew-join splits hot orderkeys.
  */
object Works {

  /** Phase 1: orderkey → sorted distinct genre codes. */
  def genreMap(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(array_sort(collect_set(
        concat(col("l_returnflag"), col("l_linestatus")))).as("genres"))

  /** Phase 2: per-order Work triples + genre triples via the shuffle join.
    * Orders with no writing-side rows still emit type/author triples (the
    * reference emits bibliography records regardless; genre only on a map
    * hit, `modsBib.py:933-947`). */
  def workTriples(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val workUri = concat(lit(Ns.work), col("o_orderkey").cast("string"))
    val typed = orders.select(workUri.as("subj"),
      lit(Ns.rdfType).as("pred"), lit(Ns.tWork).as("obj_value"),
      lit(true).as("obj_is_iri"), lit("").as("obj_lang"), lit("").as("obj_dtype"))
    val author = orders.select(workUri.as("subj"),
      lit(Ns.authoredBy).as("pred"),
      concat(lit(Ns.person), col("o_custkey").cast("string")).as("obj_value"),
      lit(true).as("obj_is_iri"), lit("").as("obj_lang"), lit("").as("obj_dtype"))
    val genres = orders.select(col("o_orderkey"), workUri.as("work_uri"))
      .join(genreMap(lineitem).hint("merge"), Seq("o_orderkey"))
      .select(col("work_uri").as("subj"), lit(Ns.hasGenre).as("pred"),
        explode(col("genres")).as("g"))
      .select(col("subj"), col("pred"),
        concat(lit(Ns.genre), col("g")).as("obj_value"),
        lit(true).as("obj_is_iri"), lit("").as("obj_lang"), lit("").as("obj_dtype"))
    // relatedItems (one level of `modsBib.py:1110-1134`'s recursive related
    // records): each work relates to the author's previous work — a window
    // over the second fact table, deterministic (custkey, orderkey) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val related = orders
      .select(col("o_custkey"), col("o_orderkey"), workUri.as("work_uri"))
      .withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("work_uri").as("subj"), lit(Ns.relatedWork).as("pred"),
        concat(lit(Ns.work), col("prev").cast("string")).as("obj_value"),
        lit(true).as("obj_is_iri"), lit("").as("obj_lang"), lit("").as("obj_dtype"))
    typed.unionAll(author).unionAll(genres).unionAll(related)
  }
}
