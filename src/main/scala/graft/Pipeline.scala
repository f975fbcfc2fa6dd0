package graft

import graft.model.Ns
import graft.operators._
import graft.sources.SynthTranscripts
import org.apache.spark.{storage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end stage wiring (SURVEY.md §3.1 Spark trace):
  * transcripts → mentions → broadcast-linked → triple emit → sameAs closure
  * → canonical triple table. Each stage is exposed as a DataFrame factory so
  * SparkEntry.queries can surface any intermediate for the correctness gate.
  */
object Pipeline {

  def transcripts(s: SparkSession, d: String): DataFrame =
    SynthTranscripts(s, d)

  def mentions(s: SparkSession, d: String): DataFrame =
    Mentions.extract(transcripts(s, d))

  def linked(s: SparkSession, d: String): DataFrame =
    Link.linkAll(s, d, mentions(s, d))

  def triples(s: SparkSession, d: String): DataFrame =
    Emit.allTriples(s, d, transcripts(s, d), linked(s, d))

  /** The triple table + precomputed `conv` column (for Quads/convStats —
    * drops the per-row subject regex those consumers otherwise pay). */
  def triplesWithConv(s: SparkSession, d: String): DataFrame =
    Emit.allTriplesConv(s, d, transcripts(s, d), linked(s, d))

  def sameAsClusters(s: SparkSession, d: String): DataFrame =
    SameAs.closure(SameAs.edgesOf(triples(s, d)))

  def canonTriples(s: SparkSession, d: String): DataFrame = {
    // ONE materialization, split by SUBJECT NAMESPACE:
    // context/activity subjects live under Ns.ctx / Ns.act by construction
    // and fact subjects under Ns.conv / Ns.person — disjoint prefixes — so
    // filtering the materialized table reproduces exactly the former
    // factTriples / contextTriples / activityTriples partition (oracle
    // unchanged). The former shape re-ran the ctx ordinal window + snippet
    // build and the activity window per call ON TOP of the fact emission;
    // this shape pays one emission (cache-substituted with the harness's
    // warm shared triple table when staged) plus one checkpoint. The
    // localCheckpoint (not a mere cache) stays required: the rewrite reads
    // the table in three branches (candidate/bypass/edges), and a
    // self-union over a cached plan silently rebuilds one branch
    // (SameAs.canonicalize input contract).
    import graft.model.Ns
    // measured (r6): keeping the checkpoint even over the warm cached
    // table wins — its three consumers re-scan cheap deserialized
    // checkpoint blocks instead of decompressing the columnar cache 3×
    // (4.28 s vs 3.80 s warm with a skip-when-cached variant)
    val all = triples(s, d).localCheckpoint()
    val isCtxAct =
      col("subj").startsWith(Ns.ctx) || col("subj").startsWith(Ns.act)
    val facts = all.filter(!isCtxAct)
    val canon = SameAs.closure(SameAs.edgesOf(facts))
    SameAs.canonicalize(facts, canon)
      .unionAll(all.filter(isCtxAct)) // ctx/act rows — canon-inert bypass
  }

  /** Context ordinals (W1/A5) surfaced directly for verification — the
    * SAME frame emission uses (Emit.ctxFrame), so the verified ordinals and
    * the minted context URIs can never drift apart. */
  def ordinals(s: SparkSession, d: String): DataFrame =
    Emit.ctxFrame(linked(s, d))
      .select("conv_id", "turn_idx", "kind", "midx", "ordinal", "ctx_uri")

  /** W2 "closest heading": each turn gets the text of the nearest
    * role=system turn at-or-before it, falling back to the nearest after
    * (`Utils/context.py:61-92`). Pure window functions, co-partitioned with
    * the conv bucketing — one shuffle on conv_id.
    */
  def headings(s: SparkSession, d: String): DataFrame = {
    val tr = transcripts(s, d)
    val h = when(col("role") === "system", col("text"))
    val before = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tr.select(col("conv_id"), col("turn_idx"),
      coalesce(
        last(h, ignoreNulls = true).over(before),
        first(h, ignoreNulls = true).over(after),
        lit("")).as("heading"))
  }

  /** A7 "first mentioned" person per conversation
    * (`Biography/biography.py:139-144`: mother/father = first mentioned).
    * Order key is document order (turn_idx, midx) packed into one BIGINT
    * with a 10^6 radix — collision-free for any realistic mention count
    * per turn and overflow-free for any turn index. */
  def firstPerson(s: SparkSession, d: String): DataFrame =
    linked(s, d).filter(col("kind") === "person")
      .groupBy("conv_id")
      .agg(min_by(col("obj_value"),
        col("turn_idx").cast("long") * 1000000L + col("midx"))
        .as("first_person"))
}
