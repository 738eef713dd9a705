package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class DedupSpec extends SparkSpec {

  /** Local union-find oracle. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val pairs = (1 to 30).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      import spark.implicits._
      val df = pairs.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ufComponents(pairs)
      assert(got === want, s"trial $trial")
    }
  }

  test("connectedComponents closes a chain that direct pairs would miss") {
    import spark.implicits._
    // chain 1-2, 2-3, 3-4: one component rooted at 1
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("dropDuplicates keeps exactly the component minima") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val dups = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicates(docs, "doc_id", dups)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 7L, 8L, 9L, 10L))
  }

  test("connectedComponents on empty pairs returns empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() === 0L)
  }
}
