package graft.core

import java.io.FileNotFoundException
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

import graft.SparkSpec

/** The no-fork local FS must be a drop-in for the stock one: same status
  * tuple, same not-found behavior, same listing — it only removes the
  * `stat`/`chmod` process forks. And the shared session must actually be
  * using it, or the whole optimization silently reverts.
  */
class NoChmodLocalFsSpec extends SparkSpec {

  private def freshRaw(fs: RawLocalFileSystem): RawLocalFileSystem = {
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  test("getFileStatus matches the stock RawLocalFileSystem field by field") {
    val stock = freshRaw(new RawLocalFileSystem)
    val ours = freshRaw(new NoChmodRawLocalFileSystem)
    val dir = Files.createTempDirectory("nochmod_spec")
    val file = dir.resolve("data.bin")
    Files.write(file, Array.fill[Byte](12345)(7))
    try {
      for (p <- Seq(new Path(file.toString), new Path(dir.toString))) {
        val a = stock.getFileStatus(p)
        val b = ours.getFileStatus(p)
        assert(b.getLen === a.getLen)
        assert(b.isDirectory === a.isDirectory)
        assert(b.getModificationTime === a.getModificationTime)
        assert(b.getPermission === a.getPermission)
        assert(b.getOwner === a.getOwner)
        assert(b.getGroup === a.getGroup)
        assert(b.getPath.toUri.getPath === a.getPath.toUri.getPath)
      }
      // listStatus goes through the overridden getFileStatus per entry
      val names = ours.listStatus(new Path(dir.toString)).map(_.getPath.getName)
      assert(names.toSeq === Seq("data.bin"))
    } finally {
      Files.deleteIfExists(file); Files.deleteIfExists(dir)
    }
  }

  test("missing paths raise FileNotFoundException like the stock FS") {
    val ours = freshRaw(new NoChmodRawLocalFileSystem)
    intercept[FileNotFoundException] {
      ours.getFileStatus(new Path("/definitely/not/a/real/path/xyz"))
    }
    assert(!ours.exists(new Path("/definitely/not/a/real/path/xyz")))
  }

  test("setPermission is a no-op, create/mkdirs/rename still work") {
    val ours = freshRaw(new NoChmodRawLocalFileSystem)
    val dir = Files.createTempDirectory("nochmod_spec_rw")
    try {
      val sub = new Path(s"$dir/a/b")
      assert(ours.mkdirs(sub))
      val f = new Path(s"$dir/a/b/x.txt")
      val out = ours.create(f)
      out.write(Array[Byte](1, 2, 3)); out.close()
      assert(ours.getFileStatus(f).getLen === 3)
      // the permission call must not fork nor throw — and must not break
      // a subsequent read of the same path
      ours.setPermission(f, new org.apache.hadoop.fs.permission.FsPermission("600"))
      val g = new Path(s"$dir/a/b/y.txt")
      assert(ours.rename(f, g))
      assert(ours.getFileStatus(g).getLen === 3)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("the shared Spark session resolves file:// through the no-chmod classes") {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf)
    assert(fs.getClass.getName === classOf[NoChmodLocalFileSystem].getName)
    // FileContext path (the streaming checkpoint manager's API)
    val afs = org.apache.hadoop.fs.AbstractFileSystem.get(
      java.net.URI.create("file:///"), conf)
    assert(afs.getClass.getName === classOf[NoChmodLocalFs].getName)
    // and a real write+read round-trip through the session keeps working
    val dir = Files.createTempDirectory("nochmod_spec_spark")
    try {
      val p = s"$dir/t.parquet"
      spark.range(0, 100).toDF("id").write.mode("overwrite").parquet(p)
      assert(spark.read.parquet(p).count() === 100)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(pp => Files.deleteIfExists(pp))
    }
  }
}
