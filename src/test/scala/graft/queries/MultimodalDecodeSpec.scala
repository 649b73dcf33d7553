package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The real image-header decoder (`mm_decode`, round-17 verdict task 4):
  * the contract entry's oracle proves encode→parse reaches the generator's
  * numbers; this spec pins the ADVERSARIAL paths the oracle never sees —
  * corrupted CRC, truncated streams, marker desync, and geometry the
  * fixtures don't produce — where a sloppy parser would return garbage
  * with valid=true instead of declining.
  */
class MultimodalDecodeSpec extends AnyFunSuite {

  import MultimodalQueries._

  test("png round trip: every color type, boundary geometry") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4);
         (w, h) <- Seq((1, 1), (16, 211), (65535, 3), (1 << 20, 1 << 20))) {
      val m = decodeImage(7L, pngBytes(w, h, ct))
      assert(m === ImageMeta(7L, "png", w, h, ch, valid = true), s"ct=$ct w=$w h=$h")
    }
  }

  test("jpeg round trip: component counts, big COM padding, 64k-1 edge") {
    for (nc <- Seq(1, 3, 4); pad <- Seq(0, 1, 28, 1000); (w, h) <- Seq((1, 1), (65535, 65535))) {
      val m = decodeImage(9L, jpegBytes(w, h, nc, pad))
      assert(m === ImageMeta(9L, "jpeg", w, h, nc, valid = true), s"nc=$nc pad=$pad")
    }
  }

  test("corruption declines, never garbage") {
    val png = pngBytes(100, 50, 2)
    // flip one width byte: CRC now mismatches → invalid, not width 356
    val flipped = png.clone(); flipped(17) = (flipped(17) ^ 0x01).toByte
    assert(!decodeImage(1L, flipped).valid)
    // truncations at every prefix parse without throwing, and whenever the
    // parser does accept (the cut fell after the SOF geometry bytes) the
    // geometry is the true one — never a partial read
    val jpeg = jpegBytes(320, 200, 3, 12)
    (0 until jpeg.length).foreach { cut =>
      val m = decodeImage(1L, jpeg.take(cut))
      if (m.valid)
        assert((m.width, m.height, m.channels) === ((320, 200, 3)), s"cut=$cut")
    }
    (0 until 40).foreach { cut =>
      assert(!decodeImage(1L, png.take(cut)).valid || cut >= 33)
    }
    // marker desync: a non-FF byte where a marker must start
    val desync = jpeg.clone(); desync(2) = 0x00
    assert(!decodeImage(1L, desync).valid)
    // plain text & empty payloads
    assert(!decodeImage(1L, "not an image at all".getBytes("UTF-8")).valid)
    assert(!decodeImage(1L, Array.emptyByteArray).valid)
  }

  test("a COM segment containing FF C0 bytes is skipped, not parsed as SOF") {
    // hand-build: SOI, COM whose PAYLOAD spells a fake SOF0 with w=h=1,
    // then the real SOF0 — a parser that scans for FF C0 instead of
    // walking segment lengths reports the decoy geometry
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xff, 0xd8)
    val decoy = Array(0xff, 0xc0, 0x00, 0x0b, 8, 0, 1, 0, 1, 1, 1, 0x11, 0)
    b(0xff, 0xfe, (2 + decoy.length) >> 8, (2 + decoy.length) & 0xff)
    decoy.foreach(v => b(v))
    b(0xff, 0xc0, 0, 11, 8, 1, 0x2c, 1, 0x90, 1, 1, 0x11, 0) // 300h x 400w, 1 comp
    val m = decodeImage(3L, out.toByteArray)
    assert(m === ImageMeta(3L, "jpeg", 400, 300, 1, valid = true))
  }

  test("fixture classes partition by doc_id and decode to the oracle arithmetic") {
    (0L until 99L).foreach { id =>
      val m = decodeImage(id, imageFixture(id, "fallback text payload"))
      (id % 3) match {
        case 0 =>
          assert(m.fmt === "png" && m.valid)
          assert(m.width === 16 + (id % 317).toInt && m.height === 16 + (id % 211).toInt)
          assert(m.channels === Seq(1, 3, 2, 4)((id % 4).toInt))
        case 1 =>
          assert(m.fmt === "jpeg" && m.valid)
          assert(m.width === 16 + (id % 253).toInt && m.height === 16 + (id % 199).toInt)
          assert(m.channels === 1 + (id % 2).toInt * 2)
        case _ =>
          assert(m === ImageMeta(id, "invalid", 0, 0, 0, valid = false))
      }
    }
  }
}
