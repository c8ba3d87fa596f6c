package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Pins [[MultimodalOps.parseImageDims]] on GOLDEN bytes — real-world
  * header structures the q93 builder does NOT emit (EXIF APP1, DQT
  * segments, progressive SOF2, the canonical 1×1 PNG) — so builder and
  * parser cannot be consistently wrong together, plus the malformed-input
  * contract (None, never a throw). */
class ImageMetaSpec extends AnyFunSuite with SharedSpark {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden PNG: the canonical 1x1 transparent PNG parses as 1x1") {
    // the ubiquitous real-world tracking-pixel PNG header (signature +
    // IHDR with its real CRC)
    val png = hx("89504e470d0a1a0a 0000000d 49484452 00000001 00000001" +
      " 08 06 00 00 00 1f15c489")
    assert(MultimodalOps.parseImageDims(png).contains(("png", 1, 1)))
  }

  test("golden PNG: 640x480 RGB header") {
    val png = hx("89504e470d0a1a0a 0000000d 49484452 00000280 000001e0" +
      " 08 02 00 00 00 00000000")
    assert(MultimodalOps.parseImageDims(png).contains(("png", 640, 480)))
  }

  test("golden JPEG: EXIF APP1 + DQT before a baseline SOF0 (camera-file shape)") {
    // ffd8, APP1 "Exif\0\0" (len 0x18), DQT (len 0x43), SOF0 240x320 —
    // markers the q93 builder never emits; only a real marker WALK finds
    // the SOF
    val jpg = hx("ffd8" +
      " ffe1 0018 457869660000" + "00" * 16 +
      " ffdb 0043" + "00" * 65 +
      " ffc0 0011 08 00f0 0140 03 011100 021101 031101" +
      " ffd9")
    assert(MultimodalOps.parseImageDims(jpg).contains(("jpeg", 320, 240)))
  }

  test("golden JPEG: progressive SOF2 parses too") {
    val jpg = hx("ffd8 ffe0 0010 4a46494600 0101 00 0001 0001 0000" +
      " ffc2 0011 08 0100 0180 03 011100 021101 031101 ffd9")
    assert(MultimodalOps.parseImageDims(jpg).contains(("jpeg", 384, 256)))
  }

  test("malformed inputs return None, never throw") {
    assert(MultimodalOps.parseImageDims(Array.emptyByteArray).isEmpty)
    assert(MultimodalOps.parseImageDims("not an image at all".getBytes).isEmpty)
    // PNG signature but truncated before IHDR dims
    assert(MultimodalOps.parseImageDims(hx("89504e470d0a1a0a 0000000d 4948")).isEmpty)
    // JPEG SOI but scan data (SOS) arrives before any SOF
    assert(MultimodalOps.parseImageDims(
      hx("ffd8 ffda 0008" + "00" * 6 + "ffd9")).isEmpty)
    // JPEG desynced stream (non-marker byte where a marker must be)
    assert(MultimodalOps.parseImageDims(hx("ffd8 0041414141414141414141")).isEmpty)
    // non-SOF segment whose declared length runs past the payload end
    assert(MultimodalOps.parseImageDims(hx("ffd8 ffe0 7fff 0000")).isEmpty)
  }

  test("golden WAV: the canonical 44-byte PCM header parses (22.05kHz mono 16-bit)") {
    // the textbook RIFF/WAVE example header: fmt alone, then data —
    // values every WAV tutorial ships (22050 Hz, 1 ch, 16 bit, byteRate
    // 44100, 2048 data bytes)
    val wav = hx("52494646 24080000 57415645 666d7420 10000000 0100 0100" +
      " 22560000 44ac0000 0200 1000 64617461 00080000")
    assert(MultimodalOps.parseWavMeta(wav)
      .contains((1, 22050, 16, 2048L, 2048L * 1000 / 44100)))
  }

  test("golden WAV: LIST/INFO chunk between fmt and data forces the walk") {
    val wav = hx("52494646 3c080000 57415645 666d7420 10000000 0100 0200" +
      " 44ac0000 10b10200 0400 1000" +
      " 4c495354 0a000000 494e464f 000000000000" + // 10-byte LIST payload
      " 64617461 00080000")
    // 44100 Hz stereo 16-bit: byteRate 0x2b110 = 176400
    assert(MultimodalOps.parseWavMeta(wav)
      .contains((2, 44100, 16, 2048L, 2048L * 1000 / 176400)))
  }

  test("malformed WAV inputs return None, never throw") {
    assert(MultimodalOps.parseWavMeta(Array.emptyByteArray).isEmpty)
    assert(MultimodalOps.parseWavMeta("RIFFnotawave".getBytes).isEmpty)
    // RIFF/WAVE but no data chunk
    assert(MultimodalOps.parseWavMeta(
      hx("52494646 14000000 57415645 666d7420 10000000 0100 0100" +
        " 22560000 44ac0000 0200 1000")).isEmpty)
    // chunk with a size field that would loop forever (size 0 → step 8 ok;
    // a negative-looking size must not wrap)
    assert(MultimodalOps.parseWavMeta(
      hx("52494646 10000000 57415645 6a756e6b ffffffff 00")).isEmpty)
  }

  test("q94 gate shape: every synthetic payload parses, total covers the corpus") {
    val out = MultimodalOps.q94AudioMeta(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(3)).sum
    val nDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(total == nDocs, s"aggregate covers $total of $nDocs documents")
    // bits is constant 16 in the builder; a parser offset slip shows here
    assert(out.forall(_.getInt(6) == 16))
  }

  test("golden MP4: ftyp + free + moov/mvhd v0 walk (smartphone-file shape)") {
    // isom brand with two compatible brands, 24-byte free box, moov whose
    // mvhd reports timescale 1000 / duration 60000 → exactly 60 s
    val mp4 = hx(
      "00000018 66747970 69736f6d 00000000 69736f32 6d703431" + // ftyp(24)
      " 00000018 66726565" + "00" * 16 + // free(24)
      " 00000024 6d6f6f76" + // moov(36)
      "  0000001c 6d766864 00000000 00000000 00000000 000003e8 0000ea60")
    assert(MultimodalOps.parseMp4Meta(mp4)
      .contains(("isom", 1000, 60000L, 60000L)))
  }

  test("malformed MP4 inputs return None, never throw") {
    assert(MultimodalOps.parseMp4Meta(Array.emptyByteArray).isEmpty)
    assert(MultimodalOps.parseMp4Meta("garbage not a box".getBytes).isEmpty)
    // valid ftyp but a box whose size overruns the payload
    assert(MultimodalOps.parseMp4Meta(
      hx("00000010 66747970 69736f6d 00000000 7fffffff 6d6f6f76")).isEmpty)
    // moov present but no mvhd inside
    assert(MultimodalOps.parseMp4Meta(
      hx("00000010 66747970 69736f6d 00000000" +
        " 00000010 6d6f6f76 00000008 66726565")).isEmpty)
    // size < 8 (would spin without the guard)
    assert(MultimodalOps.parseMp4Meta(
      hx("00000004 66747970 69736f6d")).isEmpty)
  }

  test("q96 gate shape: every synthetic payload parses, total covers the corpus") {
    val out = MultimodalOps.q96VideoMeta(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(2)).sum
    val nDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(total == nDocs, s"aggregate covers $total of $nDocs documents")
    assert(out.forall(_.getString(5) == "isom"))
  }

  test("q93 gate shape: every synthetic payload parses, aggregates stay int-exact") {
    val out = MultimodalOps.q93ImageMeta(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // the builder emits only valid payloads — a null fmt row means the
    // parser failed one
    assert(out.forall(r => r.getString(1) == "png" || r.getString(1) == "jpeg"))
    val total = out.map(_.getLong(3)).sum
    val nDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(total == nDocs, s"aggregate covers $total of $nDocs documents")
  }
}
