package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.HepV3
import graft.ingest.HepV3.{Packet, RcInfo}

class HepV3Spec extends AnyFunSuite {

  // FIXTURES.md §1 representative header.
  val fixture: RcInfo = RcInfo(
    protocolFamily = Some(2), protocol = Some(17),
    srcIp = Some("192.168.1.10"), dstIp = Some("192.168.1.20"),
    srcPort = Some(5060), dstPort = Some(5060),
    timeSeconds = Some(1739043338L), timeUseconds = Some(978000L),
    payloadType = Some(1), captureId = Some(2001L),
    capturePass = Some("myHep"), correlationId = Some("abc123@host"))

  val sip = "INVITE sip:bob@example.com SIP/2.0\r\nCall-ID: abc123@host\r\n"

  test("encode/decode round-trip") {
    val pkt = Packet(fixture, sip.getBytes("UTF-8"))
    val decoded = HepV3.decode(HepV3.encode(pkt))
    assert(decoded.isRight, decoded)
    val d = decoded.toOption.get
    assert(d.rcinfo == fixture)
    assert(d.payloadString == sip)
  }

  test("ipv6 addresses round-trip") {
    // Decoder emits RFC 5952 canonical (compressed) text regardless of
    // the input spelling.
    val rc = fixture.copy(srcIp = Some("2001:db8:0:0:0:0:0:1"), dstIp = Some("0:0:0:0:0:0:0:1"))
    val d = HepV3.decode(HepV3.encode(Packet(rc, Array(1)))).toOption.get
    assert(d.rcinfo.srcIp == Some("2001:db8::1"))
    assert(d.rcinfo.dstIp == Some("::1"))
  }

  test("timestamp arithmetic matches reference (hepop.js:1204–1210)") {
    // timeSeconds*1000 + timeUseconds/1000 floored
    assert(fixture.timestampMs(0L) == 1739043338L * 1000 + 978)
    assert(RcInfo(timeSeconds = Some(10), timeUseconds = Some(999)).timestampMs(0L) == 10000)
    assert(RcInfo().timestampMs(42L) == 42L) // falls back to now (hepop.js:1209)
  }

  test("rcinfo JSON uses the documented field names") {
    val json = fixture.toJson
    for (k <- Seq("protocolFamily", "protocol", "srcIp", "dstIp", "srcPort",
        "dstPort", "timeSeconds", "timeUseconds", "payloadType", "captureId",
        "capturePass", "correlation_id"))
      assert(json.contains("\"" + k + "\""), s"missing $k in $json")
  }

  test("decode rejects garbage") {
    assert(HepV3.decode("not a hep packet".getBytes).isLeft)
    assert(HepV3.decode(Array[Byte](1, 2, 3)).isLeft)
    val truncated = HepV3.encode(Packet(fixture, sip.getBytes)).take(20)
    assert(HepV3.decode(truncated).isLeft)
  }

  test("frameLength supports TCP reassembly (fix for hepop.js:996–1003)") {
    val bytes = HepV3.encode(Packet(fixture, sip.getBytes))
    assert(HepV3.frameLength(bytes) == Some(bytes.length))
    // two packets coalesced into one chunk must be separable
    val two = bytes ++ bytes
    val len = HepV3.frameLength(two).get
    assert(HepV3.decode(two.take(len)).isRight)
    assert(HepV3.decode(two.drop(len)).isRight)
  }

  test("unknown chunk types are skipped per spec") {
    val pkt = HepV3.encode(Packet(fixture, sip.getBytes))
    // append an unknown generic chunk (type 99) before re-declaring length
    val extra = java.nio.ByteBuffer.allocate(8)
      .putShort(0).putShort(99).putShort(8).putShort(7).array()
    val patched = pkt ++ extra
    patched(4) = ((patched.length >> 8) & 0xff).toByte
    patched(5) = (patched.length & 0xff).toByte
    val d = HepV3.decode(patched)
    assert(d.isRight)
    assert(d.toOption.get.rcinfo == fixture)
  }

  test("splitFrames equals the TCP framer on segments, including torn tails and noise") {
    import graft.ingest.Listeners
    val frames = (0 until 50).map(i =>
      HepV3.encode(Packet(fixture, s"MSG $i body".getBytes)))
    val torn = frames.last.take(frames.last.length - 3)
    val noise = "junkHE".getBytes
    val segment = noise ++ frames.take(49).flatten.toArray ++ torn
    val viaSplit = Listeners.splitFrames(segment)
    val framer = new Listeners.HepFramer
    val viaFeed = framer.feed(segment, segment.length)
    assert(viaSplit.map(_.toSeq) == viaFeed.map(_.toSeq))
    assert(viaSplit.length == 49, "complete frames recovered, torn tail skipped")
  }
}
