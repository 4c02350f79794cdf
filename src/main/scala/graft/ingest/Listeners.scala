package graft.ingest

import java.net.{DatagramPacket, DatagramSocket, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** HEP network listeners feeding a BufferedAppender.
  *
  * UDP: one datagram = one HEP packet (reference hepop.js:1006–1014).
  * TCP: length-prefixed HEPv3 framing with reassembly across reads —
  * fixing, not replicating, the reference's chunk-equals-packet bug
  * (hepop.js:996–1003; SURVEY §7.4).
  *
  * Scale note: listeners are ingest-edge components — one lightweight
  * thread each, feeding the buffered WAL. The analytical path never
  * touches them; on a cluster this edge would be a fleet of receivers
  * ahead of the same storage layout.
  */
object Listeners {

  /** Accumulates TCP bytes and yields complete HEP frames (pure —
    * unit-testable without sockets). */
  final class HepFramer {
    private var buf = Array.emptyByteArray

    /** Feed a chunk; returns every complete frame now available. */
    def feed(chunk: Array[Byte], len: Int): Seq[Array[Byte]] = {
      val add = java.util.Arrays.copyOf(chunk, len)
      buf = if (buf.isEmpty) add else buf ++ add
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var continue = true
      while (continue) {
        HepV3.frameLength(buf) match {
          case Some(total) if total >= 6 && buf.length >= total =>
            out += java.util.Arrays.copyOfRange(buf, 0, total)
            buf = java.util.Arrays.copyOfRange(buf, total, buf.length)
          case Some(total) if total < 6 =>
            // Poisoned stream: skip the bogus header to resync.
            buf = java.util.Arrays.copyOfRange(buf, 4, buf.length)
          case Some(_) => continue = false // incomplete frame, wait
          case None =>
            // None means EITHER fewer than 6 buffered bytes OR a magic
            // mismatch. Resync (drop one byte) only when the buffered
            // prefix already CONTRADICTS 'HEP3' — a TCP read boundary can
            // leave 1–5 valid bytes of a real frame head, and dropping one
            // of those would corrupt the frame and lose the packet.
            val n = math.min(buf.length, HepV3.Magic.length)
            var i = 0
            while (i < n && buf(i) == HepV3.Magic(i)) i += 1
            if (i < n) buf = java.util.Arrays.copyOfRange(buf, 1, buf.length)
            else continue = false // plausible (possibly partial) head: wait
        }
      }
      out.toSeq
    }

    def pendingBytes: Int = buf.length
  }

  /** O(n) frame splitter for a COMPLETE spool segment (a concatenation of
    * frames): walks an offset instead of HepFramer's compact-after-every-
    * frame buffer, which is quadratic when fed a megabyte segment at once
    * (measured: 21 s of pure memcpy for a 60 MB micro-batch). Same resync
    * rules as the framer; an incomplete trailing frame (torn mid-write by
    * a crash) is skipped. */
  def splitFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var continue = true
    while (continue && pos < bytes.length) {
      HepV3.frameLength(bytes, pos) match {
        case Some(total) if total >= 6 && bytes.length - pos >= total =>
          out += java.util.Arrays.copyOfRange(bytes, pos, pos + total)
          pos += total
        case Some(total) if total < 6 =>
          pos += 4 // poisoned header: skip it to resync
        case Some(_) => continue = false // torn trailing frame: skip
        case None =>
          val n = math.min(bytes.length - pos, HepV3.Magic.length)
          var i = 0
          while (i < n && bytes(pos + i) == HepV3.Magic(i)) i += 1
          if (i < n) pos += 1 else continue = false
      }
    }
    out.toSeq
  }

  abstract class StoppableThread(name: String) {
    protected val running = new AtomicBoolean(true)
    protected def loop(): Unit
    private val t = new Thread(() => loop(), name)
    t.setDaemon(true)
    def start(): this.type = { t.start(); this }
    def stop(): Unit = { running.set(false); onStop(); t.interrupt() }
    protected def onStop(): Unit = {}
  }

  /** Default frame sink: decode + append to the WAL buffer (the
    * reference's driver-side path). The spooling/streaming ingest passes
    * a raw-frame sink instead (StreamingHepIngest). */
  def appenderSink(appender: BufferedAppender): Array[Byte] => Unit =
    frame => HepV3.decode(frame).foreach(appender.addHep(_))

  /** UDP HEP source (hepop.js:1006–1014): datagram = packet. */
  final class UdpHepListener(sink: Array[Byte] => Unit, port: Int)
      extends StoppableThread("graft-udp") {
    def this(appender: BufferedAppender, port: Int = 0) =
      this(appenderSink(appender), port)
    private val socket = new DatagramSocket(port)
    def boundPort: Int = socket.getLocalPort
    override protected def loop(): Unit = {
      val buf = new Array[Byte](65535)
      while (running.get) {
        try {
          val dgram = new DatagramPacket(buf, buf.length)
          socket.receive(dgram)
          sink(java.util.Arrays.copyOf(dgram.getData, dgram.getLength))
        } catch {
          case _: java.net.SocketException if !running.get => // closing
          case e: Exception => System.err.println(s"[udp] ${e.getMessage}")
        }
      }
    }
    override protected def onStop(): Unit = socket.close()
  }

  /** TCP HEP source with framing (fixes hepop.js:996–1003). */
  final class TcpHepListener(sink: Array[Byte] => Unit, port: Int)
      extends StoppableThread("graft-tcp") {
    def this(appender: BufferedAppender, port: Int = 0) =
      this(appenderSink(appender), port)
    private val server = new ServerSocket(port)
    def boundPort: Int = server.getLocalPort
    override protected def loop(): Unit = {
      while (running.get) {
        try {
          val conn = server.accept()
          new Thread(() => handle(conn), "graft-tcp-conn").start()
        } catch {
          case _: java.net.SocketException if !running.get =>
          case e: Exception => System.err.println(s"[tcp] ${e.getMessage}")
        }
      }
    }
    private def handle(conn: Socket): Unit = {
      val framer = new HepFramer
      val in = conn.getInputStream
      val chunk = new Array[Byte](65536)
      try {
        var n = in.read(chunk)
        while (n >= 0 && running.get) {
          if (n > 0) framer.feed(chunk, n).foreach(sink)
          n = in.read(chunk)
        }
      } catch {
        case e: Exception => System.err.println(s"[tcp-conn] ${e.getMessage}")
      } finally conn.close()
    }
    override protected def onStop(): Unit = server.close()
  }
}
