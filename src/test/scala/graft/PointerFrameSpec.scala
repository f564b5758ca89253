package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SinkFs

/** Property tests for the CRC pointer frame — the reader-side half of
  * the no-atomic-rename commit protocol: a COMPLETE framed payload
  * always unframes to its content, and NO truncation of one (the torn
  * states an overwrite-in-place reader can observe) ever passes strict
  * validation as a different payload.
  */
class PointerFrameSpec extends AnyFunSuite {

  test("roundtrip: frame then unframe returns the content (both modes)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val singleLine = Gen.asciiPrintableStr.map(_.take(200))
    val prop = Prop.forAll(singleLine) { s =>
      val framed = SinkFs.frame(s)
      SinkFs.unframe(framed, strict = true).map(_.trim) == Some(s.trim) &&
      SinkFs.unframe(framed, strict = false).map(_.trim) == Some(s.trim)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("no strict-mode truncation of a framed payload ever validates " +
      "as a DIFFERENT payload — a torn read is either rejected or " +
      "yields the exact committed content (a cut that loses only the " +
      "trailing newline is the one complete-content case)") {
    for (content <- Seq("v0", "v12345", "m7.manifest", "m999999.manifest")) {
      val framed = SinkFs.frame(content)
      for (cut <- 0 until framed.length) {
        val torn = framed.substring(0, cut)
        val un = SinkFs.unframe(torn, strict = true)
        assert(un.isEmpty || un.map(_.trim).contains(content),
          s"torn prefix of length $cut validated as a DIFFERENT " +
            s"payload: '$torn' -> $un")
      }
    }
  }

  test("lenient mode accepts legacy unframed payloads verbatim") {
    for (legacy <- Seq("v3", "m42.manifest"))
      assert(SinkFs.unframe(legacy, strict = false).contains(legacy))
  }

  test("any single-character corruption of a framed payload is rejected " +
      "in strict mode") {
    val framed = SinkFs.frame("v123")
    for (i <- 0 until framed.length) {
      val corrupted = framed.updated(i,
        if (framed(i) == 'x') 'y' else 'x')
      assert(SinkFs.unframe(corrupted, strict = true).isEmpty,
        s"single-char corruption at $i validated")
    }
  }
}
