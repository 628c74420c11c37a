package graft.server.flight

import scala.collection.mutable.ArrayBuffer

import org.sparkproject.connect.protobuf.{ByteString, CodedInputStream, CodedOutputStream}

/** Minimal protobuf wire codec for the Arrow Flight / FlightSQL messages.
  *
  * The Flight protocol is protobuf-over-gRPC (public contract:
  * `arrow/format/Flight.proto` and `FlightSql.proto` in Apache Arrow).
  * This build runs offline with no protoc and no grpc/protobuf artifacts
  * beyond the relocated runtime Spark itself ships for Spark Connect
  * (`org.sparkproject.connect.protobuf`), so the handful of messages the
  * server needs are read/written directly at the wire level: a message is
  * a sequence of (field number, wire type, payload) and nothing more.
  * Field numbers are pinned to the public .proto definitions at each use
  * site. Package relocation is a compile-time concern only — the bytes on
  * the wire are standard protobuf, so stock Flight clients interoperate.
  */
object Proto {

  /** One decoded field. `bytes` for wire type 2, `num64` for 0/1/5. */
  final case class Field(num: Int, wire: Int, bytes: Array[Byte], num64: Long)

  def parse(data: Array[Byte]): Seq[Field] = {
    val in = CodedInputStream.newInstance(data)
    val out = ArrayBuffer.empty[Field]
    var tag = in.readTag()
    while (tag != 0) {
      val num = tag >>> 3
      (tag & 7) match {
        case 0 => out += Field(num, 0, null, in.readInt64())
        case 1 => out += Field(num, 1, null, in.readFixed64())
        case 2 => out += Field(num, 2, in.readByteArray(), 0L)
        case 5 => out += Field(num, 5, null, in.readFixed32().toLong)
        case w => throw new IllegalArgumentException(s"unsupported wire type $w")
      }
      tag = in.readTag()
    }
    out.toSeq
  }

  def bytesAt(fs: Seq[Field], num: Int): Option[Array[Byte]] =
    fs.find(f => f.num == num && f.wire == 2).map(_.bytes)
  def allBytesAt(fs: Seq[Field], num: Int): Seq[Array[Byte]] =
    fs.filter(f => f.num == num && f.wire == 2).map(_.bytes)
  def stringAt(fs: Seq[Field], num: Int): Option[String] =
    bytesAt(fs, num).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
  def varintAt(fs: Seq[Field], num: Int): Option[Long] =
    fs.find(f => f.num == num && f.wire == 0).map(_.num64)

  /** Append-only message writer. */
  final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    private val cos = CodedOutputStream.newInstance(buf)
    def bytes(num: Int, v: Array[Byte]): this.type = {
      cos.writeBytes(num, ByteString.copyFrom(v)); this
    }
    def string(num: Int, v: String): this.type = { cos.writeString(num, v); this }
    def varint(num: Int, v: Long): this.type = { cos.writeInt64(num, v); this }
    def bool(num: Int, v: Boolean): this.type = { cos.writeBool(num, v); this }
    def message(num: Int, v: Array[Byte]): this.type = bytes(num, v)
    def build(): Array[Byte] = { cos.flush(); buf.toByteArray }
  }

  def writer(): Writer = new Writer

  // ----- google.protobuf.Any (type_url=1, value=2) -------------------

  /** FlightSQL wraps every command/ticket/action payload in an Any. */
  def packAny(typeUrl: String, value: Array[Byte]): Array[Byte] =
    writer().string(1, typeUrl).bytes(2, value).build()

  /** (simple message name — text after the last '/' and '.', value bytes). */
  def unpackAny(any: Array[Byte]): (String, Array[Byte]) = {
    val fs = parse(any)
    val url = stringAt(fs, 1).getOrElse("")
    val full = url.substring(url.lastIndexOf('/') + 1)
    (full.substring(full.lastIndexOf('.') + 1),
      bytesAt(fs, 2).getOrElse(Array.emptyByteArray))
  }

  val SqlProtoPrefix = "type.googleapis.com/arrow.flight.protocol.sql."
}
