package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted count+sum equals plain groupBy on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + scattered tail
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"k${i % 50}", i.toLong))).toDF("key", "v")
    val plain = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(df, "key", "v", "v", buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val big = ((1 to 5000).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2))).toDF("key", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "key", "v", buckets = 4)
      .select("key", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val vals = (1 to 100).toDF("x")
    val s1 = vals.select(Skew.salt(col("x"), 8).as("s")).collect().map(_.getInt(0))
    val s2 = vals.select(Skew.salt(col("x"), 8).as("s")).collect().map(_.getInt(0))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
  }
}
