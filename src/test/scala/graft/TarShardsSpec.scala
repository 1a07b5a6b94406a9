package graft

import org.apache.spark.sql.functions._
import graft.ops.TarShards

/** WebDataset-style tar shard reader/writer (VERDICT r13 missing #2). */
class TarShardsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-tar-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("key/ext split follows the WebDataset stem convention") {
    assert(TarShards.splitKeyExt("a/b/000123.seg.json") === ("000123", "seg.json"))
    assert(TarShards.splitKeyExt("000123.txt") === ("000123", "txt"))
    assert(TarShards.splitKeyExt("dir/plain") === ("plain", ""))
  }

  test("write -> members roundtrip: payload bytes, sizes, keys identical") {
    val dir = tmpDir("rt")
    val rows = Seq(
      ("s-0.tar", "00000001.txt", "hello world".getBytes("UTF-8")),
      ("s-0.tar", "00000001.cls", "en".getBytes("UTF-8")),
      ("s-0.tar", "00000003.txt", ("x" * 700).getBytes("UTF-8")), // >1 block
      ("s-1.tar", "00000002.txt", Array[Byte]()), // empty member
      ("s-1.tar", "00000002.cls", Array[Byte](0, 1, 2, -1, 127))) // binary
      .toDF("shard", "name", "payload")
    val paths = TarShards.write(rows, "shard", "name", "payload", dir)
    assert(paths === Seq(s"$dir/s-0.tar", s"$dir/s-1.tar"))
    val back = TarShards.members(spark, paths)
      .orderBy("shard", "name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getAs[Array[Byte]](5).toSeq))
    assert(back.length === 5)
    assert(back(0) === ("s-0.tar", "00000001.cls", "00000001", "cls", 2L,
      "en".getBytes("UTF-8").toSeq))
    assert(back(2)._5 === 700L)
    assert(back(3) === ("s-1.tar", "00000002.cls", "00000002", "cls", 5L,
      Seq[Byte](0, 1, 2, -1, 127)))
    assert(back(4)._5 === 0L)
  }

  test("written shards are valid ustar for the SYSTEM tar tool") {
    val dir = tmpDir("interop")
    val rows = Seq(("x.tar", "k1.txt", "abc".getBytes("UTF-8")),
        ("x.tar", "k2.bin", Array.fill[Byte](513)(7)))
      .toDF("shard", "name", "payload")
    TarShards.write(rows, "shard", "name", "payload", dir)
    val out = new java.io.ByteArrayOutputStream()
    val p = new ProcessBuilder("tar", "-tf", s"$dir/x.tar")
      .redirectErrorStream(true).start()
    p.getInputStream.transferTo(out)
    assert(p.waitFor() === 0, s"system tar rejected the shard:\n$out")
    assert(out.toString("UTF-8").linesIterator.toSeq.sorted ===
      Seq("k1.txt", "k2.bin"))
  }

  test("members reads shards produced by the SYSTEM tar tool (incl. dirs skipped)") {
    val dir = tmpDir("sysread")
    val sub = java.nio.file.Paths.get(dir, "d")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("a.txt"), "alpha".getBytes("UTF-8"))
    java.nio.file.Files.write(sub.resolve("b.json"), "{}".getBytes("UTF-8"))
    val p = new ProcessBuilder("tar", "-cf", s"$dir/sys.tar", "-C", dir, "d")
      .redirectErrorStream(true).start()
    assert(p.waitFor() === 0)
    val back = TarShards.members(spark, Seq(s"$dir/sys.tar"))
      .orderBy("name").collect()
    assert(back.map(_.getString(1)).toSeq === Seq("d/a.txt", "d/b.json"))
    assert(back.map(r => new String(r.getAs[Array[Byte]](5), "UTF-8")).toSeq ===
      Seq("alpha", "{}"))
    assert(back.map(_.getString(2)).toSeq === Seq("a", "b")) // keys
  }

  test("samples pivots members to one row per (shard, key)") {
    val dir = tmpDir("samples")
    val rows = Seq(
      ("s.tar", "k1.txt", "t1".getBytes("UTF-8")),
      ("s.tar", "k1.cls", "en".getBytes("UTF-8")),
      ("s.tar", "k2.txt", "t2".getBytes("UTF-8"))) // k2 lacks cls
      .toDF("shard", "name", "payload")
    val paths = TarShards.write(rows, "shard", "name", "payload", dir)
    val sm = TarShards.samples(spark, paths, Seq("txt", "cls"))
      .orderBy("key").collect()
    assert(sm.length === 2)
    assert(new String(sm(0).getAs[Array[Byte]]("txt"), "UTF-8") === "t1")
    assert(new String(sm(0).getAs[Array[Byte]]("cls"), "UTF-8") === "en")
    assert(new String(sm(1).getAs[Array[Byte]]("txt"), "UTF-8") === "t2")
    assert(sm(1).isNullAt(sm(1).fieldIndex("cls")))
  }

  test("write refuses member names beyond the plain ustar field") {
    val rows = Seq(("s.tar", "k" * 101 + ".txt", "x".getBytes("UTF-8")))
      .toDF("shard", "name", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.write(rows, "shard", "name", "payload", tmpDir("guard"))
    }
    assert(e.getMessage.contains("100") ||
      e.getCause.getMessage.contains("100 bytes"))
  }
}
