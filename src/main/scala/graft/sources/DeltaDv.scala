package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, File, RandomAccessFile}
import java.util.zip.CRC32

/** DELETION VECTORS — the Delta protocol's merge-on-read row-level
  * deletes (PROTOCOL.md "Deletion Vectors"): a still-live `add` action
  * carries a `deletionVector` descriptor naming a serialized
  * RoaringBitmapArray of DEAD row indexes in that file. This module is
  * the byte-level codec pair:
  *
  *  - Z85 (the ZeroMQ base85 variant the protocol prescribes) for inline
  *    DVs and for the UUID inside on-disk DV paths;
  *  - the "portable" RoaringBitmapArray serialization — magic
  *    `1681511377` (int32 LE), bitmap count (int64 LE), then each 32-bit
  *    bucket's standard portable RoaringBitmap bytes, bucket i covering
  *    row indexes [i·2³², (i+1)·2³²);
  *  - the DV FILE layout — a 1-byte format version, then per stored DV:
  *    `size` (int32 BE), `data` (size bytes), CRC-32 of data (int32 BE);
  *    a descriptor's `offset` addresses the size field of its entry.
  *
  * Storage types: `i` (inline — pathOrInlineDv IS the z85 data), `u`
  * (relative — pathOrInlineDv is `<prefix><z85(uuid)>`, the file is
  * `<table>/<prefix>/deletion_vector_<uuid>.bin`), `p` (absolute path).
  * Anything else refuses loudly. The bitmaps ride Spark's own
  * RoaringBitmap dependency; `DataOutput`/`DataInput` round-trips the
  * portable format exactly.
  */
object DeltaDv {

  /** The add action's deletionVector descriptor. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long)

  /** Executor-side dead-row test: carries each DV'd file's COMPRESSED
    * bitmap bytes in the task closure (keyed by uuid-unique data-file
    * basename) and rehydrates the RoaringBitmaps once per deserialized
    * task (transient-lazy) — O(DV bytes) setup, O(1) per-row membership,
    * never an enumerated row list anywhere.
    */
  final class RowFilter(dvs: Map[String, Array[Byte]]) extends Serializable {
    @transient private lazy val bitmaps
        : Map[String, IndexedSeq[org.roaringbitmap.RoaringBitmap]] =
      dvs.map { case (k, v) => k -> deserializeBitmaps(v) }
    def live(filePath: String, rowIndex: Long): Boolean = {
      val name = filePath.substring(filePath.lastIndexOf('/') + 1)
      bitmaps.get(name) match {
        case Some(bs) => !contains(bs, rowIndex)
        case None => true
      }
    }
  }

  // ---- Z85 ----------------------------------------------------------

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 encodes 4-byte groups, got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val chars = new Array[Char](5)
      var k = 4
      while (k >= 0) { chars(k) = Z85.charAt((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chars)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85 decodes 5-char groups, got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Inv(c) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
      o += 4
    }
    out
  }

  // ---- RoaringBitmapArray (portable) --------------------------------

  private val Magic = 1681511377

  /** Serialize sorted-or-not row indexes (64-bit, non-negative) into the
    * portable RoaringBitmapArray form.
    */
  def serializePositions(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative row index")
    val byBucket = positions.groupBy(_ >>> 32)
    val maxBucket = if (byBucket.isEmpty) -1L else byBucket.keys.max
    require(maxBucket < 64, s"implausible row index bucket $maxBucket")
    val bitmaps = (0L to maxBucket).map { b =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      byBucket.getOrElse(b, Seq.empty)
        .foreach(p => rb.add((p & 0xffffffffL).toInt))
      rb.runOptimize()
      val bos = new ByteArrayOutputStream()
      rb.serialize(new DataOutputStream(bos))
      bos.toByteArray
    }
    val total = 4 + 8 + bitmaps.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.foreach(buf.put)
    buf.array()
  }

  /** Deserialize the portable form into its per-bucket bitmaps (bucket i
    * covers row indexes [i·2³², (i+1)·2³²)) WITHOUT enumerating rows —
    * the executor-side shape: a scan filter tests membership against
    * these directly, O(DV bytes) to rehydrate regardless of cardinality.
    */
  def deserializeBitmaps(data: Array[Byte])
      : IndexedSeq[org.roaringbitmap.RoaringBitmap] = {
    val head = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(head.getInt() == Magic,
      "not a RoaringBitmapArray (bad magic number)")
    val n = head.getLong()
    require(n >= 0 && n < 64, s"implausible bitmap count $n")
    val in = new DataInputStream(
      new ByteArrayInputStream(data, 12, data.length - 12))
    (0L until n).map { _ =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(in) // DataInput form advances the stream exactly
      rb
    }.toIndexedSeq
  }

  /** Membership test against [[deserializeBitmaps]] output. */
  def contains(bitmaps: IndexedSeq[org.roaringbitmap.RoaringBitmap],
      rowIndex: Long): Boolean = {
    val bucket = (rowIndex >>> 32).toInt
    bucket < bitmaps.size && bitmaps(bucket).contains((rowIndex & 0xffffffffL).toInt)
  }

  /** Deserialize a portable RoaringBitmapArray into sorted row indexes. */
  def deserializePositions(data: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    deserializeBitmaps(data).zipWithIndex.foreach { case (rb, bucket) =>
      rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(v: Int): Unit =
          out += (bucket.toLong << 32) | (v & 0xffffffffL)
      })
    }
    out.result()
  }

  /** Union two portable RoaringBitmapArrays WITHOUT enumerating rows —
    * the merge step when a second MoR delete touches an already-DV'd
    * file: O(bitmap bytes), never O(deleted rows).
    */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ba = deserializeBitmaps(a)
    val bb = deserializeBitmaps(b)
    val merged = (0 until math.max(ba.size, bb.size)).map { i =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      if (i < ba.size) rb.or(ba(i))
      if (i < bb.size) rb.or(bb(i))
      rb.runOptimize()
      val bos = new ByteArrayOutputStream()
      rb.serialize(new DataOutputStream(bos))
      bos.toByteArray
    }
    val total = 4 + 8 + merged.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(merged.size.toLong)
    merged.foreach(buf.put)
    buf.array()
  }

  /** Exact live-dead count of a portable RoaringBitmapArray. */
  def cardinality(data: Array[Byte]): Long =
    deserializeBitmaps(data).map(_.getLongCardinality).sum

  // ---- DV file layout -----------------------------------------------

  private def uuidBytes(u: java.util.UUID): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    b.array()
  }

  private def uuidFromBytes(b: Array[Byte]): java.util.UUID = {
    require(b.length == 16, s"uuid needs 16 bytes, got ${b.length}")
    val bb = java.nio.ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  /** Write all of one commit's DVs into ONE on-disk DV file under the
    * table root. Returns (pathOrInlineDv for storageType `u`, per-DV
    * (offset, sizeInBytes) in input order).
    */
  def writeDvFile(tableRoot: File,
      dvs: Seq[Array[Byte]]): (String, Seq[(Long, Long)]) = {
    val uuid = java.util.UUID.randomUUID()
    val f = new File(tableRoot, s"deletion_vector_$uuid.bin")
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(f)))
    try {
      out.writeByte(1) // format version
      var pos = 1L
      val offs = dvs.map { d =>
        val off = pos
        out.writeInt(d.length) // big-endian
        out.write(d)
        val crc = new CRC32()
        crc.update(d)
        out.writeInt(crc.getValue.toInt) // big-endian
        pos += 4L + d.length + 4L
        (off, d.length.toLong)
      }
      (z85Encode(uuidBytes(uuid)), offs)
    } finally out.close()
  }

  /** The on-disk file NAME a descriptor resolves to (None for inline
    * DVs) — the liveness key VACUUM uses to protect a referenced DV file.
    */
  def dvFileName(d: Descriptor): Option[String] = d.storageType match {
    case "u" =>
      Some(s"deletion_vector_${uuidFromBytes(z85Decode(d.pathOrInlineDv.takeRight(20)))}.bin")
    case "p" =>
      val p = d.pathOrInlineDv
      Some(p.substring(p.lastIndexOf('/') + 1))
    case _ => None
  }

  /** Resolve + read + integrity-check a descriptor's bitmap, returning
    * the dead row indexes. Unknown storage types refuse loudly.
    */
  def readPositions(tableRoot: File, d: Descriptor): Seq[Long] = {
    val positions = deserializePositions(readBitmapBytes(tableRoot, d))
    require(d.cardinality < 0 || positions.size.toLong == d.cardinality,
      s"DV cardinality ${positions.size} != declared ${d.cardinality}")
    positions
  }

  /** Resolve + read + integrity-check a descriptor, returning the RAW
    * portable RoaringBitmapArray bytes (the executor-shippable form —
    * compressed bitmap, never an enumerated row list). Unknown storage
    * types refuse loudly.
    */
  def readBitmapBytes(tableRoot: File, d: Descriptor): Array[Byte] = {
    val data = d.storageType match {
      case "i" =>
        val bytes = z85Decode(d.pathOrInlineDv)
        require(d.sizeInBytes < 0 || bytes.length == d.sizeInBytes,
          s"inline DV size ${bytes.length} != declared ${d.sizeInBytes}")
        bytes
      case "u" | "p" =>
        val file = d.storageType match {
          case "u" =>
            require(d.pathOrInlineDv.length >= 20,
              s"relative DV path too short: ${d.pathOrInlineDv}")
            val prefix = d.pathOrInlineDv.dropRight(20)
            val uuid = uuidFromBytes(z85Decode(d.pathOrInlineDv.takeRight(20)))
            new File(new File(tableRoot, prefix), s"deletion_vector_$uuid.bin")
          case _ => new File(d.pathOrInlineDv)
        }
        require(file.isFile, s"DV file missing: $file")
        val raf = new RandomAccessFile(file, "r")
        try {
          val off = d.offset.getOrElse(
            throw new IllegalArgumentException(
              s"on-disk DV for $file lacks an offset"))
          raf.seek(off)
          val size = raf.readInt() // big-endian
          require(d.sizeInBytes < 0 || size == d.sizeInBytes,
            s"DV entry size $size != declared ${d.sizeInBytes} in $file")
          require(size >= 0 && size <= file.length(),
            s"implausible DV entry size $size in $file")
          val bytes = new Array[Byte](size)
          raf.readFully(bytes)
          val crc = new CRC32()
          crc.update(bytes)
          val stored = raf.readInt()
          require(crc.getValue.toInt == stored,
            s"DV checksum mismatch in $file at offset $off")
          bytes
        } finally raf.close()
      case other =>
        throw new IllegalArgumentException(
          s"unsupported deletionVector storageType '$other' — this reader " +
            "supports i (inline), u (relative), p (absolute)")
    }
    data
  }
}
