package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (Array[Float] column).
  *
  * - Brute-force cosine top-k: broadcast the (small) query set against the
  *   full vector table — the scale path for "few queries × huge corpus".
  *   All math in double via zip_with + aggregate fold (codegen'd, no UDF).
  * - LSH-bucketed variant: random-hyperplane signs derived from md5 so the
  *   plane set is deterministic and oracle-reproducible; vectors join on
  *   bucket signature first, shrinking the candidate space — the scale path
  *   for "all-pairs near-dup at 10^9 vectors".
  * - Near-duplicate pairs: cosine ≥ threshold over an augmented corpus
  *   (scaled copies — scalar multiples have cosine 1 up to 1 ulp, so the
  *   0.999 threshold is decision-stable across engines).
  */
object Ann {

  /** Cast float embedding to double once; precompute the L2 norm. The
    * repartition spreads the (often single-file) vector table across all
    * cores — the pair joins below are nested-loop evaluations whose
    * parallelism equals the stream side's partition count. */
  def prepared(emb: DataFrame): DataFrame = {
    val parts = emb.sparkSession.sparkContext.defaultParallelism
    emb.repartition(parts)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

  /** Fused codegen'd dot product (graft.plans.DotProduct) — bit-equal to
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` but without the per-row
    * intermediate array; registration is idempotent per session. */
  private def dot(a: Column, b: Column): Column = {
    graft.plans.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_dot", a, b)
  }

  /** Brute-force cosine top-k. Queries: vec_id % 25 == 0 (a deterministic
    * probe set). Output (query_id, neighbor_id, rank), rank 1..k by
    * (cosine desc, neighbor_id asc) — ids only, so float-precision noise
    * can't leak into the compared values. */
  def bruteForceTopK(emb: DataFrame, k: Int = 5): DataFrame = {
    val p = prepared(emb)
    val q = p.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val joined = p.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val NumPlanes = 8

  /** Random-hyperplane LSH signature: plane p's weight for dimension i is
    * +1 if the first hex nibble of md5(p || '_' || i) is even else -1.
    * signature bit p = (Σ_i w_pi · v_i) > 0. Output (vec_id, bucket). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val p = prepared(emb)
    val dims = p.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
    val planes = dims.select(col("vec_id"), col("i"), col("x"),
      explode(sequence(lit(0), lit(NumPlanes - 1))).as("pl"))
      .withColumn("w",
        when(expr("instr('0123456789abcdef', substring(md5(concat(cast(pl as string), '_', cast(i as string))), 1, 1)) % 2") === 1,
          lit(1.0)).otherwise(lit(-1.0)))
    planes.groupBy("vec_id", "pl")
      .agg(sum(col("w") * col("x")).as("proj"))
      .withColumn("bit",
        when(col("proj") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(pl AS INT))"))
          .otherwise(lit(0L)))
      .groupBy("vec_id")
      .agg(sum("bit").cast("long").as("bucket"))
  }

  /** LSH-bucketed ANN search — the 10^9-vector scale path: each query only
    * scores vectors sharing its full hyperplane signature, so the pair
    * space shrinks from |Q|×N to per-bucket joins (equi-join on bucket —
    * shuffle/broadcast-friendly, no nested loop over the corpus). Top-k
    * within candidates; recall improves with fewer planes / multiple
    * tables, tested against the exact brute force. */
  def lshSearch(emb: DataFrame, k: Int = 5): DataFrame = {
    val p = prepared(emb).join(lshBuckets(emb), "vec_id")
    val q = p.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bucket"))
    val cands = p.join(broadcast(q),
      p("bucket") === q("bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  /** Near-duplicate pairs over the augmented corpus (original ∪ 2×-scaled
    * copies at vec_id+100000): cosine ≥ 0.999, a < b. */
  def nearDupPairs(emb: DataFrame): DataFrame = {
    // even vec_ids only: bounds the O(n²) pair space in the verification
    // query; the at-scale path buckets through lshBuckets first.
    val base = emb.filter(col("vec_id") % 2 === 0)
    val aug = base.select(col("vec_id"), col("embedding"))
      .unionAll(base.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val p = prepared(aug)
    val l = p.select(col("vec_id").as("a"), col("v").as("av"), col("norm").as("an"))
    val r = p.select(col("vec_id").as("b"), col("v").as("bv"), col("norm").as("bn"))
    l.join(r, col("a") < col("b"))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .filter(col("cos") >= 0.999)
      .select("a", "b")
  }
}
