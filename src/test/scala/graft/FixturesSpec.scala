package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.registry.Fixtures

/** Harness-infrastructure safety pins (no Spark session needed). */
class FixturesSpec extends AnyFunSuite {

  test("deleteNoFollow removes the tree but never reaches through a symlink") {
    import java.nio.file.{Files, Paths}
    val victim = Files.createTempDirectory("graft-victim")
    val keepFile = victim.resolve("table-part0.parquet")
    Files.writeString(keepFile, "precious")
    val victimFile = Files.createTempFile("graft-victim-file", ".parquet")

    val scratch = Files.createTempDirectory("graft-scratch")
    Files.createSymbolicLink(scratch.resolve("dir-link"), victim)
    Files.createSymbolicLink(scratch.resolve("file-link"), victimFile)
    val sub = Files.createDirectory(scratch.resolve("real-sub"))
    Files.writeString(sub.resolve("own-file"), "scratch content")
    Files.createSymbolicLink(sub.resolve("nested-link"), victim)

    Fixtures.deleteNoFollow(scratch.toFile)

    // the scratch tree, including every link, is gone
    assert(!Files.exists(scratch, java.nio.file.LinkOption.NOFOLLOW_LINKS))
    // the link TARGETS survive untouched — recursing through a
    // dir-symlink would have deleted the victim's part file
    assert(Files.exists(keepFile), "dir-symlink target was deleted through the link")
    assert(Files.readString(keepFile) == "precious")
    assert(Files.exists(victimFile), "file-symlink target was deleted")
    Fixtures.deleteNoFollow(victim.toFile)
    Files.deleteIfExists(victimFile)
  }

  test("shutdown-hook reaper body: staged source tables survive the reap") {
    // end-to-end over the HOOK's own code path (reap), not just the
    // recursive-delete helper: build a scratch dir the way the
    // streaming rows do — stageDrop a fake source table in as a
    // dir-symlink plus per-part links — then reap it and assert the
    // table is intact. This is the exact shape of the bug that once
    // emptied the 10x orders/events tables.
    import java.nio.file.{Files, Paths}
    val table = Files.createTempDirectory("graft-reap-table")
    Files.writeString(table.resolve("part-00000.snappy.parquet"), "rows")
    val scratch1 = Files.createTempDirectory("graft-reap-s1")
    val scratch2 = Files.createTempDirectory("graft-reap-s2")
    // per-part links (stageDrop directory layout) in one scratch dir…
    Fixtures.stageDrop(table.toString, s"$scratch1/in", "events.parquet")
    // …and a raw dir-symlink (worst case) in the other, plus own state
    Files.createSymbolicLink(scratch2.resolve("table-link"), table)
    Files.createDirectories(scratch2.resolve("ckpt"))
    Files.writeString(scratch2.resolve("ckpt").resolve("offsets"), "0")

    val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    dirs.add(scratch1.toString)
    dirs.add(scratch2.toString)
    Fixtures.reap(dirs)

    // both scratch trees are gone…
    assert(!Files.exists(scratch1, java.nio.file.LinkOption.NOFOLLOW_LINKS))
    assert(!Files.exists(scratch2, java.nio.file.LinkOption.NOFOLLOW_LINKS))
    // …and the staged table survives with its bytes
    assert(Files.exists(table.resolve("part-00000.snappy.parquet")),
      "reaper deleted the staged source table through a link")
    assert(Files.readString(table.resolve("part-00000.snappy.parquet")) == "rows")
    Fixtures.deleteNoFollow(table.toFile)
  }

  test("stageDrop links a single file as one drop, a directory as per-part drops") {
    import java.nio.file.{Files, Paths}
    val destA = Files.createTempDirectory("graft-stage-a").toString
    val single = Files.createTempFile("graft-single", ".parquet")
    Files.writeString(single, "one")
    Fixtures.stageDrop(single.toString, destA, "orders.parquet")
    assert(new java.io.File(destA).list().toSeq == Seq("orders.parquet"))

    // Spark-written table: a directory of part files (+ noise the
    // file-stream source must never see)
    val table = Files.createTempDirectory("graft-table")
    Files.writeString(table.resolve("part-00000.snappy.parquet"), "p0")
    Files.writeString(table.resolve("part-00001.snappy.parquet"), "p1")
    Files.writeString(table.resolve("_SUCCESS"), "")
    val destB = Files.createTempDirectory("graft-stage-b").toString
    Fixtures.stageDrop(table.toString, destB, "orders.parquet")
    val staged = new java.io.File(destB).list().toSeq.sorted
    assert(staged == Seq("orders-p0.parquet", "orders-p1.parquet"), staged)
    // links resolve to the real parts
    assert(Files.readString(Paths.get(destB, "orders-p0.parquet")) == "p0")
    Fixtures.deleteNoFollow(new java.io.File(destA))
    Fixtures.deleteNoFollow(new java.io.File(destB))
    Fixtures.deleteNoFollow(table.toFile)
    Files.deleteIfExists(single)
  }
}
