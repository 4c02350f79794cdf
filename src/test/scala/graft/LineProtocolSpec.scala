package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => PropTest}

import graft.ingest.LineProtocol._

class LineProtocolSpec extends AnyFunSuite {

  // Lexer table from the reference corpus (lineproto.js:27–48, FIXTURES §2).
  test("value lexing reference corpus") {
    assert(lexValue("12i") == Some(LpLong(12)))
    assert(lexValue("t") == Some(LpBool(true)))
    assert(lexValue("F") == Some(LpBool(false)))
    assert(lexValue("TRUE") == Some(LpBool(true)))
    assert(lexValue("\"x\"") == Some(LpString("x")))
    assert(lexValue("1.5") == Some(LpDouble(1.5)))
    assert(lexValue("-3e2") == Some(LpDouble(-300.0)))
    assert(lexValue("abc") == None)
    assert(lexValue("") == None)
  }

  test("parse README example") {
    val p = parse("cpu,host=server01,region=us-west usage_idle=92.6,usage_user=7.4").get
    assert(p.measurement == "cpu")
    assert(p.tags == Seq("host" -> "server01", "region" -> "us-west"))
    assert(p.fields == Seq("usage_idle" -> LpDouble(92.6), "usage_user" -> LpDouble(7.4)))
    assert(p.timestampNs.isEmpty)
  }

  test("parse loopback example with ns timestamp") {
    val p = parse("home,room=Garden temp=73 1739043338978000000").get
    assert(p.measurement == "home")
    assert(p.timestampNs.contains(1739043338978000000L))
  }

  test("quoted strings may contain spaces, commas, equals") {
    val p = parse("""m f="a b, c=d",g=1i""").get
    assert(p.fields == Seq("f" -> LpString("a b, c=d"), "g" -> LpLong(1)))
  }

  test("escaped spaces and commas in identifiers") {
    val p = parse("""my\ measure,ta\,g=va\ lue f=1""").get
    assert(p.measurement == "my measure")
    assert(p.tags == Seq("ta,g" -> "va lue"))
  }

  test("garbage lines are rejected, not crashed") {
    assert(parse("") == None)
    assert(parse("   ") == None)
    assert(parse("# comment") == None)
    assert(parse("onlymeasurement") == None)
    assert(parse("m bad=") == None)
  }

  test("parseBody splits lines and drops empties") {
    val pts = parseBody("cpu usage=1.0\n\nmem used=2.0\n")
    assert(pts.map(_.measurement) == Seq("cpu", "mem"))
  }

  // parse ∘ format = id (lineproto.js:62–114 defines both directions).
  private val ident: Gen[String] = for {
    n <- Gen.choose(1, 8)
    s <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield s.mkString

  private val fieldValue: Gen[FieldValue] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(LpLong(_)),
    Gen.choose(-1e6, 1e6).map(d => LpDouble(math.rint(d * 100) / 100)),
    Gen.oneOf(true, false).map(LpBool(_)),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '=', '"', '\\')))
      .map(cs => LpString(cs.mkString)))

  private val point: Gen[Point] = for {
    m <- ident
    nTags <- Gen.choose(0, 3)
    tags <- Gen.listOfN(nTags, Gen.zip(ident, ident))
    nFields <- Gen.choose(1, 4)
    fields <- Gen.listOfN(nFields, Gen.zip(ident, fieldValue))
    ts <- Gen.option(Gen.choose(0L, 2000000000000000000L))
  } yield Point(m,
    tags.distinctBy(_._1),
    fields.distinctBy(_._1),
    ts)

  test("property: parse(format(p)) == p") {
    val prop = Prop.forAll(point) { p => parse(format(p)).contains(p) }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
