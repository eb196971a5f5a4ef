package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard connector: a real ustar writer (fixture
  * side) and parser (query side) over opaque `binary` shard columns.
  *
  * Large multimodal training corpora ship as tar SHARDS — each shard a
  * tar archive whose members are named `<sample_key>.<part>` (e.g.
  * `000123.jpg`, `000123.txt`, `000123.cls`), consecutive members with
  * the same key forming one training sample (the WebDataset
  * convention). The scale contract mirrors the rest of the m-family:
  * one shard = one row = one task's unit of work, members are
  * extracted map-side via flatMap, and payload bytes never shuffle —
  * only the per-member metadata (name, size, digest) moves, so a
  * 1000-executor cluster streams shards from object storage with
  * nothing wider than a metadata aggregation downstream.
  *
  * Reference behavior analog: the reference walks directories of
  * binary financial files and loads each through a per-format reader
  * (mainTesting.py upload loop); the tar shard is the same
  * "container of heterogeneous members" problem in the packaging
  * used by training pipelines.
  *
  * Format notes: POSIX ustar, 512-byte blocks. Header fields used:
  * name (0,100, NUL-terminated), size (124,12, octal), chksum
  * (148,8, unsigned sum of the header with the chksum field read as
  * spaces), typeflag (156,1; only '0'/NUL regular files are emitted),
  * magic (257,6 "ustar"). Archive ends at the first all-zero block.
  * GNU long-name / pax extension headers ('L', 'x', 'g') are skipped
  * as non-file members — out of scope, documented.
  */
object Tar {

  /** One extracted member: shard id, member name, size, payload. */
  final case class Member(shard_id: Long, name: String, size: Long,
      payload: Array[Byte])

  // ---- writer (fixture side) ----------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminator — the common ustar layout
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** A real ustar archive from (name, payload) members, with correct
    * checksums and the closing two zero blocks. */
  def write(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      val h = new Array[Byte](512)
      val nameB = name.getBytes("US-ASCII")
      require(nameB.length < 100, s"ustar name field overflow: $name")
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
      System.arraycopy(octal(payload.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces
      h(156) = '0' // regular file
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      // "NNNNNN\0 ": six octal digits, NUL, space
      val ck = java.lang.Long.toOctalString(sum)
      val ckPad = "0" * (6 - ck.length) + ck
      System.arraycopy((ckPad + "\u0000 ").getBytes("US-ASCII"), 0, h, 148, 8)
      out.write(h)
      out.write(payload)
      val rem = payload.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  // ---- parser (query side) ------------------------------------------

  /** Parse one shard's bytes into members (regular files only). */
  def parse(shardId: Long, tar: Array[Byte]): Iterator[Member] = {
    val out = Vector.newBuilder[Member]
    var off = 0
    var done = false
    while (!done && off + 512 <= tar.length) {
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (tar(off + i) != 0) allZero = false; i += 1 }
      if (allZero) done = true
      else {
        var nameEnd = off
        while (nameEnd < off + 100 && tar(nameEnd) != 0) nameEnd += 1
        val name = new String(tar, off, nameEnd - off, "US-ASCII")
        // octal size: trim leading spaces, stop at space/NUL
        var p = off + 124
        val end = off + 136
        while (p < end && tar(p) == ' ') p += 1
        var size = 0L
        while (p < end && tar(p) >= '0' && tar(p) <= '7') {
          size = size * 8 + (tar(p) - '0'); p += 1
        }
        // verify the header checksum — a corrupt or misaligned block
        // must fail loudly, not emit garbage members
        var sum = 0L
        i = 0
        while (i < 512) {
          val b = if (i >= 148 && i < 156) ' '.toByte else tar(off + i)
          sum += b & 0xff
          i += 1
        }
        var cp = off + 148
        val cend = off + 156
        while (cp < cend && (tar(cp) == ' ')) cp += 1
        var stored = 0L
        while (cp < cend && tar(cp) >= '0' && tar(cp) <= '7') {
          stored = stored * 8 + (tar(cp) - '0'); cp += 1
        }
        require(stored == sum,
          s"tar checksum mismatch in shard $shardId at offset $off " +
            s"(stored $stored, computed $sum)")
        val typeflag = tar(off + 156)
        val dataOff = off.toLong + 512
        // a checksum-valid header whose declared size runs past the
        // buffer is a truncated/corrupt shard — fail loudly (same
        // contract as the checksum), never silently skip the member or
        // let the 512-rounding overflow Int into a garbage offset
        require(dataOff + size <= tar.length,
          s"tar member '$name' in shard $shardId declares $size bytes at " +
            s"offset $dataOff beyond the ${tar.length}-byte shard — truncated archive")
        if (typeflag == '0' || typeflag == 0)
          out += Member(shardId, name, size,
            java.util.Arrays.copyOfRange(tar, dataOff.toInt, (dataOff + size).toInt))
        // Long throughout; the require above bounds the result (≤ length
        // + 511), so the single toInt cannot overflow
        off = (dataOff + ((size + 511) / 512) * 512).toInt
      }
    }
    out.result().iterator
  }

  /** PUBLIC operator: explode tar shard rows into member rows. Input
    * columns: (shard id: long-castable, tar: binary); output one row
    * per regular-file member with the member payload — downstream
    * selects metadata/digests so the payload drops before any
    * exchange. */
  def members(shards: DataFrame, shardId: org.apache.spark.sql.Column,
      tar: org.apache.spark.sql.Column): Dataset[Member] = {
    val s = shards.sparkSession
    import s.implicits._
    shards.select(shardId.cast("long"), tar)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => parse(id, bytes) }
  }
}
