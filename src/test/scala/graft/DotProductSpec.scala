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
}
