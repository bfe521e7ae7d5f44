package graft.engine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the two hand-rolled/JDK container codecs behind
  * q149/q150 — pure JVM, no Spark session. The example-based spec pins
  * the fixture docs; these pin the PARSERS over the whole input space:
  * the WAV chunk walk against an INDEPENDENT test-side encoder that
  * scatters junk chunks (odd sizes included — the RIFF pad-byte path)
  * anywhere around fmt/data, and the GIF sequence walk over arbitrary
  * dims/frame-counts (the space where the JDK writer's interlace and
  * palette-compaction traps live — both found by example, both held
  * closed here by generation). */
object WavParserProps extends Properties("WavParser") {

  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** Independent encoder: canonical fmt/data chunks with arbitrary junk
    * chunks (any fourcc, any small size, odd sizes padded per the RIFF
    * spec) interleaved at any of the three legal positions. */
  private def wavWithJunk(rate: Int, samples: List[Short],
      junks: List[(String, Int)], positions: List[Int]): Array[Byte] = {
    def junkChunk(id: String, size: Int): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(size) ++
        Array.fill[Byte](size)(0x5a) ++
        (if (size % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(1) ++ le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(2 * samples.length) ++
      samples.toArray.flatMap(s => le16(s & 0xffff))
    // positions: 0 = before fmt, 1 = between fmt and data (2+ clamps)
    val slots = Array(List.empty[Array[Byte]], List.empty[Array[Byte]])
    junks.zip(positions).foreach { case ((id, sz), p) =>
      val slot = math.min(math.abs(p) % 2, 1)
      slots(slot) = slots(slot) :+ junkChunk(id, sz)
    }
    val body = slots(0).flatten.toArray ++ fmt ++
      slots(1).flatten.toArray ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
  }

  private val genSamples: Gen[List[Short]] =
    Gen.resize(64, Gen.nonEmptyListOf(
      Gen.chooseNum(Short.MinValue, Short.MaxValue)))
  private val genRate: Gen[Int] = Gen.oneOf(8000, 16000, 44100, 1)
  // fourcc avoiding the two meaningful ids; includes 'LIST'/'fact'-like
  private val genJunk: Gen[(String, Int)] = for {
    id <- Gen.oneOf("LIST", "fact", "cue ", "bext", "junk")
    sz <- Gen.chooseNum(0, 9)
  } yield (id, sz)
  private val genJunks: Gen[List[(String, Int)]] =
    Gen.resize(4, Gen.listOf(genJunk))

  property("chunk walk recovers rate and every sample bit-exactly, " +
    "through arbitrary junk chunks at any legal position") =
    forAll(genSamples, genRate, genJunks, Gen.listOf(Gen.chooseNum(0, 3))) {
      (samples, rate, junks, positions) =>
        val padded = positions ++ List.fill(
          math.max(0, junks.length - positions.length))(0)
        val bytes = wavWithJunk(rate, samples, junks, padded)
        val (r, smp) = Multimodal.parseWav(1L, bytes)
        r == rate && smp.toList == samples
    }

  property("the production encoder is a fixed point of the parser " +
    "(parse ∘ encode = id on rate and the sample formula)") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.oneOf(8000, 16000),
      Gen.chooseNum(1, 80)) { (docId, rate, n) =>
      val (r, smp) = Multimodal.parseWav(docId,
        Multimodal.encodeWav(docId, rate, n))
      r == rate && smp.length == n &&
        (0 until n).forall(i => smp(i) == Multimodal.sampleVal(docId, i))
    }

  property("truncating the payload anywhere inside the data chunk fails " +
    "loudly, never returning short samples") =
    forAll(genSamples, Gen.chooseNum(1, 20)) { (samples, cut) =>
      val whole = wavWithJunk(8000, samples, Nil, Nil)
      val cutAt = whole.length - math.min(cut, 2 * samples.length)
      val e = try { Multimodal.parseWav(2L, whole.take(cutAt)); None }
      catch { case ex: IllegalArgumentException => Some(ex.getMessage) }
      e.exists(_.contains("audio decode failed for doc 2"))
    }
}

object GifContainerProps extends Properties("GifContainer") {

  property("encode→container-walk round-trips every frame's every gray " +
    "pixel over arbitrary dims and frame counts") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1, 17),
      Gen.chooseNum(1, 17), Gen.chooseNum(1, 5)) { (docId, w, h, frames) =>
      val bytes = Multimodal.encodeGif(docId, frames, w, h)
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        reader.getNumImages(true) == frames && (0 until frames).forall { f =>
          val img = reader.read(f)
          img.getWidth == w && img.getHeight == h &&
            (0 until h).forall(y => (0 until w).forall { x =>
              (img.getRGB(x, y) & 0xff) ==
                ((docId * 31 + f * 7 + y * 16 + x) % 256).toInt
            })
        }
      } finally reader.dispose()
    }
}
