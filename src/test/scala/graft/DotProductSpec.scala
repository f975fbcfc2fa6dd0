package graft

import org.apache.spark.sql.functions._

/** graft_dot (custom codegen Expression) ≡ the built-in composition. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals aggregate(zip_with(...)) bit-for-bit") {
    graft.plans.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val got = df.select(call_function("graft_dot", col("a"), col("b"))).as[Double].collect()
    val want = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    assert(got.toSeq == want.toSeq)
    assert(got(0) == 32.0)
  }

  test("ann topk unchanged with codegen dot (oracle-parity smoke)") {
    val topk = operators.Ann.bruteForceTopK(sources.Tables.embeddings(spark, sfDir))
    assert(topk.count() == topk.select("query_id").distinct().count() * 5)
  }

  test("lshSearch results ⊆ same-bucket candidates; scaled twins always found") {
    import org.apache.spark.sql.functions._
    val emb = sources.Tables.embeddings(spark, sfDir)
    // augmented: 2×-scaled copies — identical hyperplane signs, so LSH must
    // place each twin in its original's bucket and surface it as rank 1
    val aug = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val res = operators.Ann.lshSearch(aug)
      .as[(Long, Long, Int)].collect()
    val rank1 = res.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    val queries = rank1.keySet.filter(_ < 100000)
    assert(queries.nonEmpty)
    queries.foreach { q =>
      assert(rank1(q) == q + 100000, s"query $q should retrieve its scaled twin")
    }
  }

  test("ivf: cells partition the corpus; search recall vs brute force") {
    val emb = sources.Tables.embeddings(spark, sfDir)
    val cells = operators.Ann.ivfCells(emb).as[(Long, Long)].collect()
    assert(cells.length == emb.count(), "every vector gets exactly one cell")
    assert(cells.map(_._2).distinct.forall(c => c >= 0 && c < operators.Ann.NumCells))
    val ivf = operators.Ann.ivfSearch(emb).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val exact = operators.Ann.bruteForceTopK(emb).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(exact.nonEmpty)
    val recall = (ivf & exact).size.toDouble / exact.size
    // NumProbe/NumCells = 25% of the corpus scanned; measured 0.66 on the
    // sf0.01 fixture — gate well below to stay robust to fixture changes
    assert(recall >= 0.4, s"ivf recall@5 $recall too low for ${operators.Ann.NumProbe}/${operators.Ann.NumCells} probes")
  }

  test("lsh: banded search retrieves planted near-duplicates at rank 1") {
    // On RANDOM vectors banded AND-hashing has near-zero overlap with
    // brute-force top-5 BY DESIGN (measured 0.03 here): random "nearest"
    // neighbors are not actually similar, and the bands correctly reject
    // them — that is the precision/candidate-bound trade LSH buys. The
    // meaningful recall property is on genuinely similar pairs: a 2×
    // scalar copy (sign-invariant → shares ALL bands) must be found and
    // must rank first (cos = 1).
    import org.apache.spark.sql.functions._
    val emb = sources.Tables.embeddings(spark, sfDir)
    val aug = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val res = operators.Ann.lshSearch(aug).as[(Long, Long, Int)].collect()
    val queries = res.map(_._1).distinct.filter(_ < 100000L)
    assert(queries.nonEmpty)
    val rank1 = res.filter(_._3 == 1).map(r => (r._1, r._2)).toMap
    val found = queries.count(q => rank1.get(q).contains(q + 100000L))
    assert(found == queries.length,
      s"only $found/${queries.length} planted near-dups retrieved at rank 1")
  }
}
