package graft

import graft.sources.Tar
import graft.queries.Media
import org.apache.spark.sql.functions._

class TarSpec extends SparkSpec {

  private val members = Seq(
    "a.txt" -> "hello tar".getBytes("US-ASCII"),
    "a.cls" -> "2".getBytes("US-ASCII"),
    // spans two data blocks
    "b.bin" -> Array.tabulate(900)(i => ((i * 13 + 5) & 0xff).toByte),
    // empty payload: header only, no data block
    "b.txt" -> Array.emptyByteArray)

  test("write -> parse is an exact member round-trip") {
    val bytes = Tar.write(members)
    // blocks: 4 headers + 1 + 1 + 2 + 0 data + 2 trailer = 10 * 512
    assert(bytes.length == 10 * 512)
    val got = Tar.parse(7L, bytes).toSeq
    assert(got.map(_.name) == members.map(_._1))
    assert(got.map(_.size) == members.map(_._2.length.toLong))
    got.zip(members).foreach { case (m, (_, payload)) =>
      assert(m.payload.toSeq == payload.toSeq, s"payload of ${m.name}")
      assert(m.shard_id == 7L)
    }
  }

  test("system GNU tar reads our archives and we read its archives") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec")
    try {
      // ours -> system tar -t
      val ours = dir.resolve("ours.tar")
      java.nio.file.Files.write(ours, Tar.write(members))
      val list = new ProcessBuilder("tar", "-tf", ours.toString)
        .redirectErrorStream(true).start()
      val out = new String(list.getInputStream.readAllBytes(), "US-ASCII")
      assert(list.waitFor() == 0, s"system tar rejected our archive:\n$out")
      assert(out.trim.linesIterator.toSeq == members.map(_._1))
      // system tar -c -> our parser
      members.foreach { case (name, payload) =>
        java.nio.file.Files.write(dir.resolve(name), payload)
      }
      val theirs = dir.resolve("theirs.tar")
      val create = new ProcessBuilder(
        ("tar" +: "--format=ustar" +: "-cf" +: theirs.toString +:
          "-C" +: dir.toString +: members.map(_._1)): _*)
        .redirectErrorStream(true).start()
      assert(create.waitFor() == 0)
      val parsed = Tar.parse(0L, java.nio.file.Files.readAllBytes(theirs))
        .map(m => m.name -> m.payload.toSeq).toMap
      members.foreach { case (name, payload) =>
        assert(parsed(name) == payload.toSeq, s"GNU-tar member $name")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("checksum corruption fails loudly instead of emitting members") {
    val bytes = Tar.write(members)
    bytes(130) = (bytes(130) ^ 0x01).toByte // flip a mode bit, not the chksum
    val e = intercept[IllegalArgumentException] {
      Tar.parse(1L, bytes).toSeq
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("truncated member data fails loudly instead of skipping the member") {
    val bytes = Tar.write(members)
    // keep the first (checksum-valid) header plus a partial data block:
    // the declared 9-byte payload now runs past the buffer
    val cut = java.util.Arrays.copyOfRange(bytes, 0, 512 + 4)
    val e = intercept[IllegalArgumentException] { Tar.parse(1L, cut).toSeq }
    assert(e.getMessage.contains("truncated"))
  }

  test("m17/m18 fixture: members distribute over shards, no payload past the hash") {
    val df = Tar.members(Media.tarShards(spark), col("shard_id"), col("tar"))
      .toDF()
    val got = df.select("shard_id", "name", "size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Media.tarFixtureData.flatMap { case (id, ms) =>
      ms.map { case (n, p) => (id, n, p.length.toLong) }
    }.toSet
    assert(got == want)
    // expected table (oracle side) carries the same digests the query
    // side computes with sha2 — writer->parser->sha2 == intent->MessageDigest
    val sparkSha = df.select(col("name"), sha2(col("payload"), 256).as("sha"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Media.tarExpected(spark).collect().foreach { r =>
      assert(sparkSha(r.getString(1)) == r.getString(3), s"sha of ${r.getString(1)}")
    }
  }
}
