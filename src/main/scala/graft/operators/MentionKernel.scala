package graft.operators

import graft.model.Mention
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-star extraction shape: batched mapPartitions over salted,
  * conv_id-bucketed partitions (BASELINE.json north_star; SURVEY.md §2.10).
  *
  * The default extraction path (operators.Mentions) is a pure Catalyst
  * projection — codegen'd, usually faster. This kernel is the imperative
  * escape hatch for extractors Catalyst can't express (a real NER model, a
  * tokenizer with cross-token state): regexes/automata are compiled ONCE
  * per partition, rows are processed in fixed-size batches (the shape a
  * model-inference runtime needs), and the salting helper splits hot
  * conversations across tasks while keeping per-turn work stateless.
  * Equivalence with the Catalyst path is asserted in tests AND through the
  * kg_mentions oracle (query kg_mentions_kernel).
  */
object MentionKernel {

  val BatchSize = 256

  /** Salted conv bucketing: co-locates a conversation's turns (bucket by
    * conv_id) while splitting mega-conversations (hot keys at 10^12-turn
    * scale) across `salt` sub-partitions. Per-turn extraction is stateless,
    * so the split is semantics-free. */
  def repartitionSalted(df: DataFrame, numPartitions: Int, salt: Int): DataFrame =
    df.repartition(numPartitions,
      col("conv_id"), pmod(col("turn_idx"), lit(salt)))

  /** transcripts → mentions(conv_id, turn_idx, kind, midx, surface), same
    * rows as Mentions.extract (modulo the ride-along text/ts columns). ALL
    * matches per (turn, kind) are collected in document order — find_all
    * parity with `Utils/utilities.py:351-360`. */
  def extract(spark: SparkSession, transcripts: DataFrame,
              numPartitions: Int = 0, salt: Int = 4): DataFrame = {
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    repartitionSalted(transcripts, parts, salt)
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        // per-partition init: compile the frame automata once
        val compiled = Mentions.frames.map { case (kind, re) =>
          (kind, java.util.regex.Pattern.compile(re))
        }
        it.grouped(BatchSize).flatMap { batch => // batched, model-ready shape
          batch.iterator.flatMap { case (conv, turn, text) =>
            compiled.flatMap { case (kind, p) =>
              val m = p.matcher(text)
              val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
              while (m.find())
                out += Mention(conv, turn, kind, out.size, m.group(1))
              out
            }
          }
        }
      }
      .toDF()
  }
}
