package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the binary header parsers: for ANY structurally
  * valid PNG/JPEG/WAV built from random dimensions, segment layouts, and
  * pad lengths, the parser recovers the written values exactly; for ANY
  * byte junk, it returns None and never throws or loops. (Raw scalacheck
  * Gen sampling — same offline-cache pattern as PackingPropSpec.) */
class MediaHeaderPropSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], k: Int): A =
    g.apply(Gen.Parameters.default, Seed(k.toLong)).get

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Long) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String) = s.getBytes("US-ASCII")

  private val pngGen: Gen[(Array[Byte], Int, Int)] = for {
    w <- Gen.choose(1, 65000)
    h <- Gen.choose(1, 65000)
  } yield {
    val b = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ascii("IHDR") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    (b, w, h)
  }

  private val jpegGen: Gen[(Array[Byte], Int, Int)] = for {
    w <- Gen.choose(1, 65535)
    h <- Gen.choose(1, 65535)
    // 0-3 variable-length leading segments from the markers real files
    // carry (APPn, COM, DQT, DHT is C4 = non-SOF)
    nSeg <- Gen.choose(0, 3)
    segs <- Gen.listOfN(nSeg, for {
      marker <- Gen.oneOf(0xe0, 0xe1, 0xee, 0xfe, 0xdb, 0xc4)
      padLen <- Gen.choose(0, 40)
    } yield (marker, padLen))
    sof <- Gen.oneOf(0xc0, 0xc1, 0xc2)
  } yield {
    val head = Array[Byte](0xff.toByte, 0xd8.toByte)
    val mid = segs.flatMap { case (m, pad) =>
      Array[Byte](0xff.toByte, m.toByte) ++ be16(2 + pad) ++ Array.fill[Byte](pad)(0)
    }.toArray
    val sofSeg = Array[Byte](0xff.toByte, sof.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array.fill[Byte](10)(1)
    ((head ++ mid ++ sofSeg ++ Array[Byte](0xff.toByte, 0xd9.toByte)), w, h)
  }

  private val wavGen: Gen[(Array[Byte], Int, Int, Long)] = for {
    rate <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
    ch <- Gen.choose(1, 2)
    dataSz <- Gen.choose(0L, 10000000L)
    listPad <- Gen.option(Gen.choose(0, 30))
  } yield {
    val bRate = rate * ch * 2
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(bRate) ++ le16(ch * 2) ++ le16(16)
    val list = listPad.map { p =>
      val pay = ascii("INFO") ++ Array.fill[Byte](p)(0)
      ascii("LIST") ++ le32(pay.length.toLong) ++ pay ++
        (if (pay.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    }.getOrElse(Array.emptyByteArray)
    val body = ascii("WAVE") ++ fmt ++ list ++ ascii("data") ++ le32(dataSz)
    ((ascii("RIFF") ++ le32(body.length.toLong) ++ body), ch, rate, dataSz)
  }

  private val mp4Gen: Gen[(Array[Byte], Int, Long)] = for {
    tsc <- Gen.oneOf(600, 1000, 90000, 44100)
    dur <- Gen.choose(0L, 4000000000L) // u32 range incl. > Int.MaxValue
    nBrands <- Gen.choose(0, 4)
    freePad <- Gen.choose(0, 32)
    innerPad <- Gen.option(Gen.choose(0, 24))
  } yield {
    val ftyp = be32(16 + 4 * nBrands) ++ ascii("ftypisom") ++ be32(0) ++
      Array.fill(nBrands)(ascii("mp41")).flatten
    val free = be32(8 + freePad) ++ ascii("free") ++ Array.fill[Byte](freePad)(0)
    val mvhd = be32(28) ++ ascii("mvhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(tsc) ++ be32(dur.toInt) // be32 writes the low 32 bits
    val inner = innerPad.map(p =>
      be32(8 + p) ++ ascii("free") ++ Array.fill[Byte](p)(0))
      .getOrElse(Array.emptyByteArray)
    val moov = be32(8 + inner.length + 28) ++ ascii("moov") ++ inner ++ mvhd
    ((ftyp ++ free ++ moov), tsc, dur & 0xffffffffL)
  }

  test("MP4 round-trip: any box layout recovers timescale and duration") {
    for (k <- 1 to 200) {
      val (bytes, tsc, dur) = sample(mp4Gen, k)
      assert(MultimodalOps.parseMp4Meta(bytes)
        .contains(("isom", tsc, dur, dur * 1000L / tsc)), s"seed $k failed")
    }
  }

  test("PNG round-trip: any dimensions recover exactly") {
    for (k <- 1 to 200) {
      val (bytes, w, h) = sample(pngGen, k)
      assert(MultimodalOps.parseImageDims(bytes).contains(("png", w, h)))
    }
  }

  test("JPEG round-trip: any marker layout recovers the SOF dimensions") {
    for (k <- 1 to 200) {
      val (bytes, w, h) = sample(jpegGen, k)
      assert(MultimodalOps.parseImageDims(bytes).contains(("jpeg", w, h)),
        s"seed $k failed")
    }
  }

  test("WAV round-trip: any chunk layout recovers format and duration") {
    for (k <- 1 to 200) {
      val (bytes, ch, rate, dataSz) = sample(wavGen, k)
      val expectMs = dataSz * 1000L / (rate * ch * 2)
      assert(MultimodalOps.parseWavMeta(bytes)
        .contains((ch, rate, 16, dataSz, expectMs)), s"seed $k failed")
    }
  }

  test("junk bytes: None, no throw, no loop — including signature-prefixed junk") {
    val junk: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 64)
      bs <- Gen.listOfN(n, Gen.choose(0, 255))
      prefix <- Gen.oneOf(
        Array.emptyByteArray,
        Array[Byte](0xff.toByte, 0xd8.toByte),
        ascii("RIFF"),
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    } yield prefix ++ bs.map(_.toByte).toArray
    for (k <- 1 to 500) {
      val bytes = sample(junk, k)
      // must terminate and not throw; a random tail CAN parse only if it
      // happens to be structurally valid, which these lengths preclude
      // for png (needs IHDR at 12) — just require no exception
      MultimodalOps.parseImageDims(bytes)
      MultimodalOps.parseWavMeta(bytes)
      MultimodalOps.parseMp4Meta(bytes)
    }
  }
}
