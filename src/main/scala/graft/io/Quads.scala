package graft.io

import graft.model.Ns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K4 — quad export for visualization (`Huviz/huvizQuads.py:119-140`): the
  * reference regroups its context-centric triples into SUBJECT-CENTRIC
  * named graphs (a ConjunctiveGraph quad per triple, graph = the entity the
  * statement is about). Graft: the graph label of a triple is the
  * conversation whose URIs its subject embeds (conv/context/activity nodes
  * all carry the conv id); triples about global entities (sameAs edges,
  * works) land in the uber graph — the same per-person-file vs uber-file
  * split the reference serializes. The reference's 3-level BFS copy of
  * neighbor subgraphs is visualization sugar and is not replayed.
  *
  * Scale: a pure projection over the triple table — zero shuffle.
  */
object Quads {

  /** Triple table → (graph, subj, pred, obj_value, obj_is_iri, obj_lang,
    * obj_dtype). */
  def export(triples: DataFrame): DataFrame = {
    val conv = regexp_extract(col("subj"), "(conv_[0-9]+)", 1)
    triples.select(
      when(conv =!= "", concat(lit(Ns.conv), conv))
        .otherwise(lit(Ns.kg + "graph/uber")).as("graph"),
      col("subj"), col("pred"), col("obj_value"),
      col("obj_is_iri"), col("obj_lang"), col("obj_dtype"))
  }

  /** The Huviz 3-level BFS neighbor copy (`Huviz/huvizQuads.py:119-140`):
    * every graph additionally receives the triples of resources reachable
    * from its objects in ≤3 hops (the nested predicate_objects loops),
    * realized as 3 ITERATED equi-joins frontier⋈triples on subj — each
    * level is a plain shuffle join on the subject key, no recursion state
    * on the driver beyond the loop counter. Output: original quads ∪ the
    * copied levels, set semantics. */
  def bfs(triples: DataFrame): DataFrame = {
    // the triple table feeds the quad base AND all 3 level joins — persist
    // it once or every level recomputes the whole upstream pipeline
    val t = triples.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val quads = export(t)
    val qCols = Seq(col("graph"), col("subj"), col("pred"), col("obj_value"),
      col("obj_is_iri"), col("obj_lang"), col("obj_dtype"))
    var frontier = quads.filter(col("obj_is_iri"))
      .select(col("graph"), col("obj_value").as("subj")).distinct()
    var acc = quads
    for (_ <- 1 to 3) {
      // each level feeds TWO consumers (the union and the next frontier) —
      // persist it or the level-join chain recomputes quadratically
      val level = frontier.join(t, "subj").select(qCols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      acc = acc.unionAll(level)
      frontier = level.filter(col("obj_is_iri"))
        .select(col("graph"), col("obj_value").as("subj")).distinct()
    }
    acc.distinct()
  }
}
