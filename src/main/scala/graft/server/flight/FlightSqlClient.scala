package graft.server.flight

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader

/** Minimal FlightSQL client over the same relocated gRPC runtime the
  * server uses: GetFlightInfo(CommandStatementQuery) → DoGet(ticket) →
  * decode the FlightData frames into column names + stringified rows.
  * This is what the TUI's FlightSQL tab executes through (the reference
  * tab drives its own `FlightSQLClient`,
  * `src/tui/state/tabs/flightsql.rs`), and doubles as a programmatic
  * client for any in-process or remote graft Flight endpoint.
  */
object FlightSqlClient {
  import FlightSqlServer._

  def statementDescriptor(sql: String): Array[Byte] = {
    val cmd = Proto.packAny(Proto.SqlProtoPrefix + "CommandStatementQuery",
      Proto.writer().string(1, sql).build())
    // FlightDescriptor{type=2 (CMD), cmd=2}
    Proto.writer().varint(1, 2L).bytes(2, cmd).build()
  }

  /** The endpoint Ticket inside a FlightInfo, verbatim for DoGet. */
  def ticketOfInfo(info: Array[Byte]): Array[Byte] = {
    val endpoint = Proto.bytesAt(Proto.parse(info), 3).getOrElse(
      sys.error("FlightInfo has no endpoint"))
    Proto.bytesAt(Proto.parse(endpoint), 1).getOrElse(
      sys.error("endpoint has no ticket"))
  }

  /** Execute `sql` against the Flight endpoint on `port` (loopback) and
    * return (column names, rows as strings, row count). `bearer` adds an
    * Authorization header.
    */
  def execute(port: Int, sql: String,
      bearer: Option[String] = None): (Seq[String], Seq[Seq[String]]) = {
    val base = channel(port)
    try {
      val ch = bearer match {
        case Some(tok) =>
          val md = new org.sparkproject.connect.grpc.Metadata()
          md.put(org.sparkproject.connect.grpc.Metadata.Key.of(
            "authorization",
            org.sparkproject.connect.grpc.Metadata.ASCII_STRING_MARSHALLER),
            s"Bearer $tok")
          org.sparkproject.connect.grpc.ClientInterceptors.intercept(base,
            org.sparkproject.connect.grpc.stub.MetadataUtils
              .newAttachHeadersInterceptor(md))
        case None => base
      }
      val info = unaryCall(ch, Methods.getFlightInfo, statementDescriptor(sql))
      val frames = streamingCall(ch, Methods.doGet, ticketOfInfo(info)).map { fd =>
        val fs = Proto.parse(fd)
        (Proto.bytesAt(fs, 2).getOrElse(Array.emptyByteArray),
          Proto.bytesAt(fs, 1000).getOrElse(Array.emptyByteArray))
      }.toSeq
      decodeFrames(frames)
    } finally { base.shutdownNow(); () }
  }

  /** Decode (header, body) FlightData frames into names + string rows. */
  def decodeFrames(frames: Seq[(Array[Byte], Array[Byte])]): (Seq[String], Seq[Seq[String]]) = {
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(joinIpcStream(frames)), allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val names = (0 until root.getSchema.getFields.size)
          .map(root.getSchema.getFields.get(_).getName)
        val rows = Seq.newBuilder[Seq[String]]
        while (reader.loadNextBatch()) {
          (0 until root.getRowCount).foreach { i =>
            rows += names.indices.map { c =>
              val v = root.getVector(c).getObject(i)
              if (v == null) "null"
              else v match {
                case b: Array[Byte] => new String(b, UTF_8)
                case other => String.valueOf(other)
              }
            }
          }
        }
        (names, rows.result())
      } finally reader.close()
    } finally allocator.close()
  }
}
