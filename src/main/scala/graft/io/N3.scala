package graft.io

import org.apache.spark.sql.DataFrame

/** Notation3 text export (K2 — "n3" in the reference's serialization list,
  * `Utils/utilities.py:807-808`). For plain RDF graphs (no formulae,
  * no @forAll/@forSome — the only thing the reference ever serializes),
  * N3 is a strict superset of Turtle and rdflib's n3 serializer emits the
  * same prefix/statement shape as its turtle one; the export therefore
  * shares the Turtle renderer verbatim (same grouped statements, same
  * escaping, same prefix table). Kept as its own format entry point so a
  * user of the reference's six-format list finds all six. */
object N3 {
  def export(triples: DataFrame): DataFrame = Turtle.export(triples)
}
