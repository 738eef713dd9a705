package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native bounded top-k aggregate: SQL-callable via the registry, and
  * equal to a brute-force per-group sort at every k. */
class TopKAggSpec extends SparkSpec {

  test("top_k_smallest via SQL text equals brute force, incl. under-full groups") {
    GraftFunctions.register(spark)
    spark.range(100)
      .selectExpr("id % 7 AS g", "(id * 37) % 101 AS k", "id")
      .createOrReplaceTempView("tkv")
    val got = spark.sql(
      "SELECT g, top_k_smallest(k, id, 3) AS t FROM tkv GROUP BY g").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getLong(1)))
      }.toMap
    val rows = spark.sql("SELECT g, k, id FROM tkv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (g, members) =>
      val expect = members.map(m => (m._2, m._3)).sortBy(identity).take(3).toSeq
      assert(got(g) === expect, s"group $g")
    }
    // a group with fewer rows than k returns all of them, sorted
    spark.range(2).selectExpr("0L AS g", "id AS k", "id")
      .createOrReplaceTempView("tkv2")
    val small = spark.sql(
      "SELECT top_k_smallest(k, id, 5) AS t FROM tkv2 GROUP BY g").collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(e => (e.getLong(0), e.getLong(1)))
    assert(small === Seq((0L, 0L), (1L, 1L)))
  }

  test("non-literal k is rejected loudly") {
    GraftFunctions.register(spark)
    spark.range(4).selectExpr("id AS k", "id").createOrReplaceTempView("tkv3")
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_smallest(k, id, CAST(id AS INT)) FROM tkv3 GROUP BY k").collect()
    }
    assert(e.getMessage.toLowerCase.contains("top_k_smallest"))
  }
}
