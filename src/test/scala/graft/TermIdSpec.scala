package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class TermIdSpec extends AnyFunSuite {

  test("integer inline round-trip + order") {
    for (v <- Seq(0L, 1L, -1L, 42L, -99999L, (1L << 54), -(1L << 54))) {
      val id = TermId.tryInline(Term.int(v)).get
      assert(TermId.decodeInline(id) == Term.int(v))
    }
    val a = TermId.tryInline(Term.int(-5)).get
    val b = TermId.tryInline(Term.int(7)).get
    assert(a < b) // biased payload preserves numeric order
  }

  test("string inline round-trip, 0..7 bytes, order") {
    for (s <- Seq("", "A", "N", "MAIL", "abcdefg", "1996-01", "é!", "日本")) {
      val id = TermId.tryInlineString(s)
      assert(id.isDefined, s)
      assert(TermId.decodeInline(id.get) == Term.str(s), s)
    }
    assert(TermId.tryInlineString("abcdefgh").isEmpty) // 8 bytes
    assert(TermId.tryInlineString("日本語").isEmpty)     // 9 bytes
    val x = TermId.tryInlineString("AAA").get
    val y = TermId.tryInlineString("AAB").get
    val z = TermId.tryInlineString("AA").get
    assert(x < y && z < x) // id order == codepoint order
  }

  test("date/dateTime inline round-trip") {
    val d = Term.date(9497) // 1996-01-02
    assert(TermId.decodeInline(TermId.tryInline(d).get) == d)
    val ts = Lit("1996-01-02T03:04:05.123456Z", Term.xsdDateTime, null)
    val id = TermId.tryInline(ts).get
    assert(TermId.decodeInline(id) == ts)
    val tsWhole = Lit("1996-01-02T00:00:00Z", Term.xsdDateTime, null)
    assert(TermId.decodeInline(TermId.tryInline(tsWhole).get) == tsWhole)
  }

  test("boolean + double/decimal go where expected") {
    assert(TermId.tryInline(Term.bool(true)).isDefined)
    assert(TermId.tryInline(Term.dbl(13309.6)).isEmpty) // dictionary
    assert(TermId.dictTag(Term.dbl(1.5)) == TermId.TAG_DOUBLE)
    assert(TermId.dictTag(Term.str("a" * 20)) == TermId.TAG_STRING)
  }

  test("template + well-known IRIs") {
    val sc = IriScheme.default
    val id = sc.tryInlineIri("urn:t:customer:42").get
    assert(sc.decodeIri(id) == "urn:t:customer:42")
    val p = sc.tryInlineIri("urn:p:lineitem:l_quantity").get
    assert(sc.decodeIri(p) == "urn:p:lineitem:l_quantity")
    assert(sc.tryInlineIri("http://unknown.example/x").isEmpty)
    // composite lineitem key
    val li = sc.tryInlineIri(s"urn:t:lineitem:${7 * 8 + 3}").get
    assert(sc.decodeIri(li) == "urn:t:lineitem:59")
  }

  test("property: random short strings round-trip") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val alpha = "abzAZ09_-.Xé日€" // 1-, 2-, 3-byte UTF-8 chars
      val s = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      TermId.tryInlineString(s) match {
        case Some(id) => assert(TermId.decodeInline(id) == Term.str(s), s)
        case None => assert(s.getBytes("UTF-8").length > 7, s)
      }
    }
  }

  test("property: random longs in range round-trip") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val v = rnd.nextLong()
      val inRange = v > -TermId.BIAS && v < TermId.BIAS
      TermId.tryInline(Term.int(v)) match {
        case Some(id) =>
          assert(inRange && TermId.decodeInline(id) == Term.int(v), v.toString)
        case None => assert(!inRange, v.toString)
      }
    }
  }
}
