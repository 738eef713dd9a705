package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** r8: the two-phase Rank call sites no longer hardcode 8/32 range
  * partitions — they follow `spark.sql.shuffle.partitions` (VERDICT r7
  * finding #2: a literal is a driver-chosen parallelism ceiling; 32 range
  * partitions over 100 TB = 32 sort tasks of ~3 TB each). That is only safe
  * because rank output is partition-count-independent; this spec pins that
  * for every production consumer by running each query at two very
  * different shuffle-partition settings and requiring identical rows. */
class RankConfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def atParts[T](n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prior)
  }

  private val consumers: Seq[(String, () => DataFrame)] = Seq(
    "pk1_sequence_pack" ->
      (() => graft.queries.CurationQueries.pk1SequencePack(spark, dir)),
    "sm7_temperature_sample" ->
      (() => graft.queries.CurationQueries.sm7TemperatureSample(spark, dir)),
    "sm4_batch_shuffle" ->
      (() => graft.queries.ALQueries.sm4BatchShuffle(spark, dir)),
    "sm8_curriculum" ->
      (() => graft.queries.ALQueries.sm8Curriculum(spark, dir)),
    "v8_negative_sampling" ->
      (() => graft.queries.MLQueries.v8NegativeSampling(spark, dir)),
    "a18_roc_auc" ->
      (() => graft.queries.TextQueries.queries("a18_roc_auc")(spark, dir)),
    "a19_pr_auc" ->
      (() => graft.queries.TextQueries.queries("a19_pr_auc")(spark, dir)))

  for ((name, build) <- consumers)
    test(s"$name: identical output at 3 and 32 Rank range partitions") {
      val small = atParts(3)(rows(build()))
      val large = atParts(32)(rows(build()))
      assert(small === large, s"$name diverged across Rank partition counts")
      assert(small.nonEmpty)
    }
}
