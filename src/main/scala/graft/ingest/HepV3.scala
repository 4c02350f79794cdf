package graft.ingest

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** HEPv3 (Homer Encapsulation Protocol) binary codec, per the public spec
  * (github.com/sipcapture/hep). The reference delegates decoding to the
  * hep-js library (reference hepop.js:1188 `hepjs.decapsulate`); this is a
  * from-spec Scala implementation with both directions so tests can
  * round-trip golden packets.
  *
  * Packet layout: "HEP3" | u16 total-length | chunks.
  * Chunk: u16 vendor | u16 type | u16 length (incl. 6-byte header) | body.
  * All integers big-endian.
  */
object HepV3 {

  /** Decoded protocol header. Field names match the reference's rcinfo JSON
    * (FIXTURES.md §1; reference reads payload_type/payloadType at
    * hepop.js:1194, timeSeconds/timeUseconds at hepop.js:1205–1208). */
  final case class RcInfo(
      protocolFamily: Option[Int] = None,
      protocol: Option[Int] = None,
      srcIp: Option[String] = None,
      dstIp: Option[String] = None,
      srcPort: Option[Int] = None,
      dstPort: Option[Int] = None,
      timeSeconds: Option[Long] = None,
      timeUseconds: Option[Long] = None,
      payloadType: Option[Int] = None,
      captureId: Option[Long] = None,
      capturePass: Option[String] = None,
      correlationId: Option[String] = None,
      vlan: Option[Int] = None) {

    /** Capture time in epoch ms — `timeSeconds*1000 + timeUseconds/1000`
      * floored, matching the reference's arithmetic (hepop.js:1204–1210;
      * its `(100000+us)/1000 - 100` is the same value in float math). */
    def timestampMs(nowMs: => Long): Long = timeSeconds match {
      case Some(s) => s * 1000L + timeUseconds.getOrElse(0L) / 1000L
      case None => nowMs
    }

    /** rcinfo as the JSON string stored in the parquet `rcinfo` column
      * (reference hepop.js:182 JSON.stringify of the protocol header). */
    def toJson: String = {
      val sb = new StringBuilder("{")
      def num(k: String, v: Option[Long]): Unit =
        v.foreach(x => sb.append(s""""$k":$x,"""))
      def str(k: String, v: Option[String]): Unit =
        v.foreach { x =>
          val esc = x.replace("\\", "\\\\").replace("\"", "\\\"")
          sb.append(s""""$k":"$esc",""")
        }
      num("protocolFamily", protocolFamily.map(_.toLong))
      num("protocol", protocol.map(_.toLong))
      str("srcIp", srcIp); str("dstIp", dstIp)
      num("srcPort", srcPort.map(_.toLong)); num("dstPort", dstPort.map(_.toLong))
      num("timeSeconds", timeSeconds); num("timeUseconds", timeUseconds)
      num("payloadType", payloadType.map(_.toLong))
      num("captureId", captureId)
      str("capturePass", capturePass)
      str("correlation_id", correlationId)
      num("vlan", vlan.map(_.toLong))
      if (sb.last == ',') sb.setLength(sb.length - 1)
      sb.append("}").result()
    }
  }

  final case class Packet(rcinfo: RcInfo, payload: Array[Byte]) {
    def payloadString: String = new String(payload, StandardCharsets.UTF_8)
  }

  // Chunk type ids from the HEPv3 spec (generic vendor 0x0000).
  private object T {
    val IpFamily = 1; val IpProto = 2
    val SrcIp4 = 3; val DstIp4 = 4; val SrcIp6 = 5; val DstIp6 = 6
    val SrcPort = 7; val DstPort = 8
    val TimeSec = 9; val TimeUsec = 10
    val PayloadType = 11; val CaptureId = 12
    val AuthKey = 14; val Payload = 15; val CorrelationId = 17; val Vlan = 18
  }

  val Magic: Array[Byte] = "HEP3".getBytes(StandardCharsets.US_ASCII)

  /** Total packet length if `buf` starts with a complete-enough HEP3 header;
    * used by the TCP framer for length-prefixed reassembly (fixing the
    * reference's chunk-equals-packet bug, hepop.js:996–1003 / SURVEY §7.4). */
  def frameLength(buf: Array[Byte], off: Int = 0): Option[Int] =
    if (buf.length - off < 6) None
    else if (buf(off) != 'H' || buf(off + 1) != 'E' || buf(off + 2) != 'P' || buf(off + 3) != '3') None
    else Some(((buf(off + 4) & 0xff) << 8) | (buf(off + 5) & 0xff))

  def decode(buf: Array[Byte]): Either[String, Packet] = {
    if (buf.length < 6) return Left(s"packet too short: ${buf.length}")
    val total = frameLength(buf).getOrElse(return Left("bad magic, expected HEP3"))
    if (total > buf.length) return Left(s"truncated: declared $total, have ${buf.length}")
    // Untrusted network input: a declared length under the 6-byte header
    // would make the ByteBuffer wrap below throw (ADVICE r1).
    if (total < 6) return Left(s"bad declared length $total")
    var rc = RcInfo()
    var payload = Array.emptyByteArray
    val bb = ByteBuffer.wrap(buf, 6, total - 6)
    while (bb.remaining() >= 6) {
      val vendor = bb.getShort & 0xffff
      val ctype = bb.getShort & 0xffff
      val clen = bb.getShort & 0xffff
      if (clen < 6 || clen - 6 > bb.remaining()) return Left(s"bad chunk length $clen (type $ctype)")
      val body = new Array[Byte](clen - 6)
      bb.get(body)
      if (vendor == 0) ctype match {
        case T.IpFamily => rc = rc.copy(protocolFamily = Some(u8(body)))
        case T.IpProto => rc = rc.copy(protocol = Some(u8(body)))
        case T.SrcIp4 => rc = rc.copy(srcIp = Some(ip4(body)))
        case T.DstIp4 => rc = rc.copy(dstIp = Some(ip4(body)))
        case T.SrcIp6 => rc = rc.copy(srcIp = Some(ip6(body)))
        case T.DstIp6 => rc = rc.copy(dstIp = Some(ip6(body)))
        case T.SrcPort => rc = rc.copy(srcPort = Some(u16(body)))
        case T.DstPort => rc = rc.copy(dstPort = Some(u16(body)))
        case T.TimeSec => rc = rc.copy(timeSeconds = Some(u32(body)))
        case T.TimeUsec => rc = rc.copy(timeUseconds = Some(u32(body)))
        case T.PayloadType => rc = rc.copy(payloadType = Some(u8(body)))
        case T.CaptureId => rc = rc.copy(captureId = Some(u32(body)))
        case T.AuthKey => rc = rc.copy(capturePass = Some(new String(body, StandardCharsets.UTF_8)))
        case T.Payload => payload = body
        case T.CorrelationId => rc = rc.copy(correlationId = Some(new String(body, StandardCharsets.UTF_8)))
        case T.Vlan => rc = rc.copy(vlan = Some(u16(body)))
        case _ => // unknown generic chunk: skip (spec-compliant)
      }
    }
    Right(Packet(rc, payload))
  }

  private def u8(b: Array[Byte]): Int = b(0) & 0xff
  private def u16(b: Array[Byte]): Int = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
  private def u32(b: Array[Byte]): Long =
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  private def ip4(b: Array[Byte]): String = b.map(_ & 0xff).mkString(".")

  /** RFC 5952 canonical text form (longest zero run compressed to `::`,
    * lowercase hex) — Java's getHostAddress expands instead, which would
    * make decoded rcinfo differ textually from canonical input. */
  private def ip6(b: Array[Byte]): String = {
    val groups = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        var j = i
        while (j < 8 && groups(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) groups.map(Integer.toHexString).mkString(":")
    else {
      val pre = groups.take(bestStart).map(Integer.toHexString).mkString(":")
      val post = groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      s"$pre::$post"
    }
  }

  /** Encoder (tests + loopback fixtures). */
  def encode(p: Packet): Array[Byte] = {
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def chunk(ctype: Int, body: Array[Byte]): Unit = {
      val h = ByteBuffer.allocate(6 + body.length)
      h.putShort(0).putShort(ctype.toShort).putShort((6 + body.length).toShort).put(body)
      chunks += h.array()
    }
    def b1(v: Int) = Array(v.toByte)
    def b2(v: Int) = Array((v >> 8).toByte, v.toByte)
    def b4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val rc = p.rcinfo
    rc.protocolFamily.foreach(v => chunk(T.IpFamily, b1(v)))
    rc.protocol.foreach(v => chunk(T.IpProto, b1(v)))
    rc.srcIp.foreach { ip =>
      val addr = java.net.InetAddress.getByName(ip).getAddress
      chunk(if (addr.length == 4) T.SrcIp4 else T.SrcIp6, addr)
    }
    rc.dstIp.foreach { ip =>
      val addr = java.net.InetAddress.getByName(ip).getAddress
      chunk(if (addr.length == 4) T.DstIp4 else T.DstIp6, addr)
    }
    rc.srcPort.foreach(v => chunk(T.SrcPort, b2(v)))
    rc.dstPort.foreach(v => chunk(T.DstPort, b2(v)))
    rc.timeSeconds.foreach(v => chunk(T.TimeSec, b4(v)))
    rc.timeUseconds.foreach(v => chunk(T.TimeUsec, b4(v)))
    rc.payloadType.foreach(v => chunk(T.PayloadType, b1(v)))
    rc.captureId.foreach(v => chunk(T.CaptureId, b4(v)))
    rc.capturePass.foreach(v => chunk(T.AuthKey, v.getBytes(StandardCharsets.UTF_8)))
    rc.correlationId.foreach(v => chunk(T.CorrelationId, v.getBytes(StandardCharsets.UTF_8)))
    rc.vlan.foreach(v => chunk(T.Vlan, b2(v)))
    chunk(T.Payload, p.payload)
    val bodyLen = chunks.map(_.length).sum
    val out = ByteBuffer.allocate(6 + bodyLen)
    out.put(Magic).putShort((6 + bodyLen).toShort)
    chunks.foreach(out.put)
    out.array()
  }
}
