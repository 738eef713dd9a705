package graft

/** Launch-time session sizing shared by Bench and Verify.
  *
  * Shuffle partitions derive from the DATA, not the core count (guide §2.2:
  * size partitions to the 100 MB–1 GB band and let AQE coalesce): the r20
  * sf100 sweep needed a hand-set `SPARK_GRAFT_SHUFFLE=256` because the
  * protocol default (= cpus) left one ~15M-row hash map per core and blew
  * the driver heap (VERDICT r20 #7). Deriving `max(cpus, inputBytes/128MB)`
  * keeps every protocol SF's value EXACTLY the old default (sf0.1 is 17 MB
  * → floor at cpus, so driver-comparable bench numbers and identical
  * hashes), while a big-SF launch sizes itself with no knob. The env
  * override `SPARK_GRAFT_SHUFFLE` still wins when set.
  */
object Launch {
  /** ~128 MB of IN-MEMORY data per shuffle partition — the guide's band
    * floor; partition-count independence of every query is spec-pinned
    * (PartitionIndependenceSpec), so this is a granularity knob only. */
  val BytesPerShufflePartition: Long = 128L << 20

  /** Parquet-on-disk → in-memory row expansion allowance (zstd text
    * columns decode ~3–5×; tokenize/explode grows further). Applied to
    * the on-disk census so the 128 MB band means UNCOMPRESSED bytes. */
  val ParquetExpansion: Long = 4L

  /** Sums only `*.parquet` files (ADVICE r21): stray scratch/output files
    * dropped into the data dir must not silently inflate the derived
    * partition count between runs — a bench-comparability jitter risk at
    * big SFs. */
  def inputBytes(sfDir: String): Long = {
    val root = java.nio.file.Paths.get(sfDir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val st = java.nio.file.Files.walk(root)
      try st.filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally st.close()
    }
  }

  def derivedShufflePartitions(sfDir: String, cpus: Int): Int = {
    val n = math.max(cpus.toLong,
      (inputBytes(sfDir) * ParquetExpansion + BytesPerShufflePartition - 1)
        / BytesPerShufflePartition).toInt
    // stderr, not stdout: the bench JSON tail must stay clean. A drifted
    // derivation is visible in the run log (ADVICE r21).
    System.err.println(s"[launch] derived shuffle partitions: $n ($sfDir, $cpus cpus)")
    n
  }
}
