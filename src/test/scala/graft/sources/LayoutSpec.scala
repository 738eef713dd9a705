package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    // warehouse.dir is a static conf — managed test tables land in the
    // default warehouse and are dropped below
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val customer = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
    Layout.writeBucketed(orders, "orders_b", "o_custkey", 4)
    Layout.writeBucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), Seq("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    // same answer as the plain join
    val expected = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey")).count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("partitioned write prunes partitions at scan") {
    val out = Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    Layout.writePartitioned(docs, out, "lang")
    val scan = spark.read.parquet(out).filter(col("lang") === "de")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("lang"),
      s"expected partition pruning, got:\n$physical")
    assert(scan.count() === docs.filter(col("lang") === "de").count())
  }

  test("range-clustered files have pairwise-disjoint min/max envelopes") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_range").toString + "/docs"
    Layout.writeRangeClustered(docs, out, "n_chars", files = 4)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perFile.length === 4)
    assert(perFile.map(_._3).sum === docs.count())
    perFile.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2, s"file envelopes overlap: hi=$hi1 > lo=$lo2")
      case _ =>
    }
  }
}
