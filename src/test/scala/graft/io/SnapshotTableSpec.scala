package graft.io

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotTableSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir = Files.createTempDirectory("graft-snap").toString + "/t"

  test("time travel: v1 stays bit-stable after v2 commits") {
    val dir = freshDir
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val v2 = Seq((2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "k")
    SnapshotTable.writeSnapshot(v1, dir, 1, "k", 2)
    SnapshotTable.writeSnapshot(v2, dir, 2, "k", 2)
    assert(SnapshotTable.readSnapshot(spark, dir, 1)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(SnapshotTable.readSnapshot(spark, dir, 2)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L, 4L))
  }

  test("a version refuses to be overwritten (copy-on-write commit)") {
    val dir = freshDir
    val df = Seq((1L, "a")).toDF("id", "k")
    SnapshotTable.writeSnapshot(df, dir, 1, "k", 1)
    intercept[IllegalArgumentException](
      SnapshotTable.writeSnapshot(df, dir, 1, "k", 1))
  }

  test("pruned read opens only intersecting files and keeps the answer exact") {
    val dir = freshDir
    // keys 000..099 range-laid into 10 files: ~10 keys per file
    val df = (0 until 100).map(i => (i.toLong, f"$i%03d")).toDF("id", "k")
    SnapshotTable.writeSnapshot(df, dir, 1, "k", 10)
    val (pruned, nRead, nTotal) = SnapshotTable.prunedRead(spark, dir, 1, "020", "029")
    assert(nTotal === 10)
    assert(nRead < nTotal && nRead >= 1, s"no skipping: $nRead/$nTotal")
    val ids = pruned.filter($"k".between("020", "029"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (20L to 29L).toSeq)
  }

  test("a miss range reads zero files but keeps the schema") {
    val dir = freshDir
    SnapshotTable.writeSnapshot(Seq((1L, "m")).toDF("id", "k"), dir, 1, "k", 1)
    val (df, nRead, _) = SnapshotTable.prunedRead(spark, dir, 1, "x", "z")
    assert(nRead === 0)
    assert(df.count() === 0L)
    assert(df.columns.toSeq === Seq("id", "k"))
  }

  test("an empty snapshot refuses to commit (no file list to read later)") {
    val dir = freshDir
    val empty = Seq((1L, "a")).toDF("id", "k").filter($"id" < 0)
    intercept[IllegalArgumentException](
      SnapshotTable.writeSnapshot(empty, dir, 1, "k", 2))
  }

  test("manifest round-trips stats and version") {
    val dir = freshDir
    SnapshotTable.writeSnapshot(
      Seq((1L, "aa"), (2L, "zz")).toDF("id", "k"), dir, 3, "k", 1)
    val m = SnapshotTable.readManifest(spark, dir, 3)
    assert(m.version === 3 && m.statsCol === "k")
    assert(m.files.size === 1)
    assert(m.files.head.statMin === "aa" && m.files.head.statMax === "zz")
  }

  test("expireVersions: deletes data and manifests below the floor only") {
    val dir = freshDir
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    SnapshotTable.writeSnapshot(df, dir, 1, "k", 1)
    SnapshotTable.writeSnapshot(df, dir, 2, "k", 1)
    SnapshotTable.writeSnapshot(df, dir, 3, "k", 1)
    assert(SnapshotTable.expireVersions(spark, dir, keepFrom = 3) === 2)
    // expired versions are physically gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "v2")))
    intercept[Exception](SnapshotTable.readSnapshot(spark, dir, 1))
    // the kept version still reads, and re-expiry is a no-op
    assert(SnapshotTable.readSnapshot(spark, dir, 3).count() === 2)
    assert(SnapshotTable.expireVersions(spark, dir, keepFrom = 3) === 0)
  }
}
