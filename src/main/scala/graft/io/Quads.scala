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
}
