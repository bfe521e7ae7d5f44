package graft.engine

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Typed rows for the mapPartitions encode/decode stages (top-level so
  * Spark's generated code can access their accessors). */
case class MmPayload(doc_id: Long, img: Array[Byte])
case class MmFeatures(doc_id: Long, f: Array[Double])
case class MmSpec(doc_id: Long, width: Int, height: Int, frames: Int,
  gray: Boolean)
case class MmDecoded(doc_id: Long, n_bytes: Int, width: Int, height: Int,
  frames: Int, fmt: String, resized_w: Int, resized_h: Int)
case class MmFrame(doc_id: Long, frame_idx: Int, px_sum: Long)
case class GifPayload(doc_id: Long, frames: Int, gif: Array[Byte])
case class GifFrame(doc_id: Long, frame_idx: Int, n_frames: Int,
  px_sum: Long)
case class AuSpec(doc_id: Long, rate: Int, n: Int)
case class AuPayload(doc_id: Long, wav: Array[Byte])
case class AuWindow(doc_id: Long, win_idx: Int, n_in_win: Int,
  abs_sum: Long, peak: Int, rate: Int, dur_ms: Long)

/** North-star multimodal-column operators: image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / resize /
  * frame-sample / feature-extract stages.
  *
  * The codec is REAL: payloads are genuine PNG files encoded and decoded
  * with the JDK's `javax.imageio` (zero extra dependencies). The synthetic
  * corpus carries no media bytes, so each binding MANUFACTURES its input
  * images deterministically from document fields (dimension/format/pixel
  * formulas below), encodes them to PNG, and then runs the honest decode
  * path on those bytes — PNG is lossless, so every DECODED fact the
  * queries emit (dimensions, raster size, component count, pixel sums) is
  * a closed-form function of the document that the DuckDB oracle
  * reproduces without any image library. Undecodable payloads fail
  * LOUDLY, naming the document (corrupt-bytes spec).
  *
  * Spark-side shape (what a production pipeline reuses unchanged):
  *  - payloads travel as BinaryType columns in typed Datasets;
  *  - encode/decode/feature-extract run in `mapPartitions` (the slot
  *    where a native codec batch-processes one partition's payloads —
  *    amortizing codec init per partition, the property that matters at
  *    100 TB);
  *  - frame sampling iterates the clip's frame indices inside the same
  *    partition pass — shuffle-free, scales linearly.
  */
object Multimodal {

  /** ImageIO's default stream cache is a DISK temp file per image — a
    * hidden per-payload filesystem tax, and under 32 concurrent codec
    * threads it intermittently dies with "Can't create cache file!"
    * (observed at the 150k-clip video probe). Payloads here are small
    * in-memory byte arrays; the memory cache is strictly better. Called
    * at the head of every codec partition pass (idempotent, per-JVM —
    * so each EXECUTOR gets it on a real cluster, not just the driver). */
  private[engine] def useMemoryCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic pixel value at (x, y) of a given doc's frame — the
    * formula both the encoder and the DuckDB oracle compute. Y strides
    * by 16 (the max width) so the formula is width-independent. */
  private def pxVal(docId: Long, frame: Int, x: Int, y: Int): Int =
    ((docId * 31 + frame * 7 + y * 16 + x) % 256).toInt

  /** RGB frame: red carries pxVal exactly (what q71/q72 read back);
    * green/blue are shifted copies so the image is genuinely 3-band. */
  private def rgbFrame(docId: Long, frame: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pxVal(docId, frame, x, y)
      img.setRGB(x, y, (v << 16) | (((v + 85) % 256) << 8) | ((v + 170) % 256))
    }
    img
  }

  /** Single-band gray frame (raster samples set directly — no colorspace
    * conversion on the write path). */
  private def grayFrame(docId: Long, frame: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pxVal(docId, frame, x, y))
    img
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The decode gate: ImageIO signals undecodable bytes by returning
    * null (or throwing) — either way the pipeline fails LOUDLY with the
    * offending doc id, never emitting a silent zero-row. */
  private[engine] def decodeImage(docId: Long, bytes: Array[Byte]): BufferedImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"multimodal decode failed for doc $docId: ${e.getMessage}")
      }
    if (img == null) throw new IllegalArgumentException(
      s"multimodal decode failed for doc $docId: payload is not a decodable image")
    img
  }

  /** Real half-resize of a decoded image (Graphics2D scale onto a fresh
    * raster — the stand-in for a production resampler). */
  private def resizeHalf(img: BufferedImage): BufferedImage = {
    val rw = math.max(img.getWidth / 2, 1)
    val rh = math.max(img.getHeight / 2, 1)
    val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, rw, rh, null)
    g.dispose()
    out
  }

  /** Byte i (0-based) of md5(text) as an int, via the hex pair — the form
    * both engines compute identically (drives image width/height/format). */
  private def digestByte(i: Int) =
    conv(substring(md5(col("text")), 2 * i + 1, 2), 16, 10).cast("int")

  /** Per-doc image spec: dims 1..16 from the text digest, 1 + doc_id % 4
    * frames, gray ↔ odd third digest byte. */
  private def specDs(s: SparkSession, d: String): Dataset[MmSpec] = {
    import s.implicits._
    graft.api.GraftOps.fanOutForCpu(documents(s, d)).select(col("doc_id"),
        (digestByte(0) % 16 + 1).as("width"),
        (digestByte(1) % 16 + 1).as("height"),
        (col("doc_id") % 4 + 1).cast("int").as("frames"),
        (digestByte(2) % 2 === 1).as("gray"))
      .as[MmSpec]
  }

  /** q70: encode → DECODE → inspect → resize, all against real PNG bytes.
    * Every emitted column is read off the DECODED image (dims, raster
    * size = w·h·bands, band count → fmt) or the genuinely resized one —
    * and equals its closed form because PNG round-trips losslessly. */
  def q70(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specDs(s, d).mapPartitions { it =>
      useMemoryCache()
      it.map { m =>
        val png = encodePng(
          if (m.gray) grayFrame(m.doc_id, 0, m.width, m.height)
          else rgbFrame(m.doc_id, 0, m.width, m.height))
        val img = decodeImage(m.doc_id, png)
        val bands = img.getRaster.getNumBands
        val resized = resizeHalf(img)
        MmDecoded(m.doc_id,
          img.getWidth * img.getHeight * bands,
          img.getWidth, img.getHeight, m.frames,
          if (bands == 1) "gray" else "rgb",
          resized.getWidth, resized.getHeight)
      }
    }.toDF().orderBy("doc_id")
  }

  /** q71: frame sampling — every 2nd frame of the clip is encoded,
    * DECODED, and summarized by its red-channel pixel sum (read back via
    * getRGB from the real decoded raster). */
  def q71(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    specDs(s, d).mapPartitions { it =>
      useMemoryCache()
      it.flatMap { m =>
        (0 until m.frames).filter(_ % 2 == 0).map { f =>
          val img = decodeImage(m.doc_id,
            encodePng(rgbFrame(m.doc_id, f, m.width, m.height)))
          var sum = 0L
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            sum += (img.getRGB(x, y) >> 16) & 0xff
          MmFrame(m.doc_id, f, sum)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  /** Decode stage behind q72, exposed for the corrupt-payload spec:
    * ImageIO-decode each payload, emit the first 8 red-channel values
    * (wrapping past the raster end) normalized to [0, 1]. */
  private[engine] def decodeFeatures(
      payloads: Dataset[MmPayload]): Dataset[MmFeatures] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      useMemoryCache()
      it.map { p =>
        val img = decodeImage(p.doc_id, p.img)
        val w = img.getWidth
        val n = w * img.getHeight
        MmFeatures(p.doc_id, (0 until 8).map { i =>
          val j = i % n
          ((img.getRGB(j % w, j / w) >> 16) & 0xff).toDouble / 255.0
        }.toArray)
      }
    }
  }

  /** q72: the two-stage payload plumbing — frame 0 encoded to PNG bytes
    * in one typed pass (the payload a feed would carry as a binary
    * column), then [[decodeFeatures]] decodes and extracts in another.
    * Flattened per §7.3.5. */
  def q72(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = specDs(s, d).mapPartitions { it =>
      useMemoryCache()
      it.map(m => MmPayload(m.doc_id,
        encodePng(rgbFrame(m.doc_id, 0, m.width, m.height))))
    }
    decodeFeatures(payloads)
      .select(col("doc_id") +:
        (0 until 8).map(i => col("f")(i).as(s"f$i")): _*)
      .orderBy("doc_id")
  }

  // ---------------------- video container (q150) ----------------------
  // q71 treats a clip as per-frame PNG payloads; q150 makes the VIDEO
  // member honest at the container level: ONE animated-GIF payload per
  // doc (a real multi-frame container, written and read back with the
  // JDK's ImageIO GIF plugin — zero extra dependencies), frame count
  // taken from the CONTAINER's own directory (getNumImages(true)), every
  // frame decoded and summarized. Gray rasters round-trip losslessly
  // through GIF's 8-bit palette, so the per-frame pixel sums stay
  // closed-form — the oracle needs no codec, and a wrong container walk
  // cannot hash-match.

  /** One clip → one animated GIF: every frame appended to a real image
    * sequence (prepareWriteSequence/writeToSequence/endWriteSequence). */
  private[engine] def encodeGif(docId: Long, frames: Int, w: Int,
      h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = grayFrame(docId, f, w, h)
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img),
        writer.getDefaultWriteParam)
      // interlace OFF, explicitly: the JDK writer's default interlaced
      // path scrambles/zeroes rows when height isn't an interlace-pass
      // multiple (observed: h=4 frames come back row-shuffled with the
      // last row zeroed) — progressive frames round-trip exactly
      val fmtName = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmtName)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      for (i <- 0 until kids.getLength) {
        val nd = kids.item(i)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        if (nd.getNodeName == "ImageDescriptor")
          nd.setAttribute("interlaceFlag", "FALSE")
      }
      meta.setFromTree(fmtName, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
        null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Container decode stage behind q150, exposed for the corrupt-payload
    * spec: open the payload as an image SEQUENCE, take the frame count
    * from the container directory, decode every frame, and emit its
    * gray-sample sum. An unreadable container or an empty sequence fails
    * LOUDLY naming the doc; a frame count that contradicts the carried
    * spec fails too (a truncated tail would otherwise pass silently). */
  private[engine] def videoFrames(
      payloads: Dataset[GifPayload]): Dataset[GifFrame] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      useMemoryCache()
      it.flatMap { p =>
        val reader =
          javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        try {
          try {
            reader.setInput(javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(p.gif)))
          } catch {
            case e: Exception => throw new IllegalArgumentException(
              s"video decode failed for doc ${p.doc_id}: ${e.getMessage}")
          }
          val n =
            try reader.getNumImages(true)
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"video decode failed for doc ${p.doc_id}: ${e.getMessage}")
            }
          if (n <= 0) throw new IllegalArgumentException(
            s"video decode failed for doc ${p.doc_id}: no frames in container")
          if (n != p.frames) throw new IllegalArgumentException(
            s"video decode failed for doc ${p.doc_id}: container has $n " +
              s"frames, spec says ${p.frames}")
          (0 until n).map { f =>
            val img =
              try reader.read(f)
              catch {
                case e: java.io.IOException =>
                  throw new IllegalArgumentException(
                    s"video decode failed for doc ${p.doc_id}: frame $f: " +
                      e.getMessage)
              }
            // through the COLOR MODEL, not the raw raster: GIF palettes
            // are compacted to the values present, so the raster sample
            // is a palette index — getRGB reconstructs the true gray
            var sum = 0L
            for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
              sum += img.getRGB(x, y) & 0xff
            GifFrame(p.doc_id, f, n, sum)
          }
        } finally reader.dispose()
      }
    }
  }

  /** q150: the container-level video member — each doc's whole clip
    * encoded as ONE real animated GIF in a typed pass (the payload a
    * video feed would carry), then [[videoFrames]] walks the container
    * in another. Distinct from q71, which carries per-frame still
    * payloads and samples them; here frame discovery itself comes from
    * the container directory. */
  def q150(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = specDs(s, d).mapPartitions { it =>
      useMemoryCache()
      it.map(m => GifPayload(m.doc_id, m.frames,
        encodeGif(m.doc_id, m.frames, m.width, m.height)))
    }
    videoFrames(payloads).toDF().orderBy("doc_id", "frame_idx")
  }

  // ------------------------- audio (q149) -------------------------
  // The AUDIO member of the modality triad (images q70/q72, video-as-
  // frames q71): payloads are genuine RIFF/WAVE PCM files written and
  // re-parsed byte-for-byte (a hand-rolled chunk walker — zero extra
  // dependencies, and unlike a container library the parser's behavior
  // on malformed input is OURS to pin: loud, naming the doc). Same
  // oracle-exactness trick as the image family: samples are a closed
  // form of (doc_id, i), WAV PCM is lossless, so every emitted fact
  // (rate and duration off the PARSED header, per-window abs-sum/peak
  // off the PARSED samples) equals what DuckDB computes from the
  // formula alone — a wrong parse cannot hash-match.

  /** Deterministic 16-bit PCM sample i of a doc's clip — the formula both
    * the encoder and the DuckDB oracle compute. Spans the full int16
    * range (the -32768 edge included). */
  private[engine] def sampleVal(docId: Long, i: Int): Int =
    (((docId * 31 + i.toLong * 7) % 65536) - 32768).toInt

  /** Canonical 44-byte-header mono PCM16LE WAV. */
  private[engine] def encodeWav(docId: Long, rate: Int, n: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * n)
    var i = 0
    while (i < n) { bb.putShort(sampleVal(docId, i).toShort); i += 1 }
    bb.array()
  }

  /** The decode gate, audio edition: a REAL RIFF chunk walk (unknown
    * chunks skipped with the spec's odd-size pad byte; fmt validated
    * PCM/mono/16-bit before data is trusted). Malformed payloads fail
    * LOUDLY naming the doc — bad magic, truncated chunk, data-before-fmt,
    * unsupported codec/layout — never a silent empty clip. */
  private[engine] def parseWav(docId: Long,
      bytes: Array[Byte]): (Int, Array[Short]) = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"audio decode failed for doc $docId: $why")
    if (bytes.length < 12) fail("shorter than a RIFF header")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("not a RIFF container")
    bb.getInt() // declared size; the chunk walk below is the truth
    if (fourcc() != "WAVE") fail("not a WAVE form")
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val sz = bb.getInt()
      if (sz < 0 || sz > bb.remaining()) fail(s"truncated '$id' chunk")
      val body = bb.position()
      id match {
        case "fmt " =>
          if (sz < 16) fail("fmt chunk too short")
          val codec = bb.getShort(); val ch = bb.getShort()
          val r = bb.getInt(); bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          if (codec != 1) fail(s"unsupported codec $codec (PCM only)")
          if (ch != 1) fail(s"unsupported channel count $ch (mono only)")
          if (bits != 16) fail(s"unsupported sample width $bits")
          if (r <= 0) fail(s"nonpositive sample rate $r")
          rate = r
        case "data" =>
          if (rate < 0) fail("data chunk before fmt")
          if (sz % 2 != 0) fail("odd data size for 16-bit samples")
          val out = new Array[Short](sz / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort(); i += 1 }
          samples = out
        case _ => // skip
      }
      if (samples == null) {
        // RIFF pads odd-sized chunks to even; a missing pad at EOF is fine
        val end = body + sz
        val pad = if (sz % 2 == 1 && end < bb.limit()) 1 else 0
        bb.position(end + pad)
      }
    }
    if (samples == null) fail("no data chunk")
    (rate, samples)
  }

  /** Per-doc clip spec: rate 8/16 kHz and 200..999 samples (1–4 windows
    * of 256), both off the text digest (bytes 3–5 — disjoint from the
    * image spec's 0–2, so the two specs stay independently testable). */
  private def audioSpecDs(s: SparkSession, d: String): Dataset[AuSpec] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"),
        when(digestByte(3) % 2 === 0, 8000).otherwise(16000).as("rate"),
        ((digestByte(4) * 3 + digestByte(5)) % 800 + 200).as("n"))
      .as[AuSpec]
  }

  /** Parse stage behind q149, exposed for the malformed-payload spec:
    * parse each WAV and emit one row per 256-sample window (partial tail
    * window included with its true width) — abs-amplitude sum and peak
    * per window, rate and integer-ms duration off the parsed header. */
  private[engine] def audioWindows(
      payloads: Dataset[AuPayload]): Dataset[AuWindow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      useMemoryCache()
      it.flatMap { p =>
        val (rate, smp) = parseWav(p.doc_id, p.wav)
        val n = smp.length
        val durMs = n.toLong * 1000 / rate
        (0 until (n + 255) / 256).map { w =>
          val lo = w * 256
          val hi = math.min(lo + 256, n)
          var sum = 0L; var peak = 0; var i = lo
          while (i < hi) {
            val a = math.abs(smp(i).toInt)
            sum += a; if (a > peak) peak = a; i += 1
          }
          AuWindow(p.doc_id, w, hi - lo, sum, peak, rate, durMs)
        }
      }
    }
  }

  /** q149: the audio member — encode each doc's clip to real WAV bytes in
    * one typed pass (the binary column a feed would carry), then parse +
    * window-feature in another ([[audioWindows]]), mirroring q72's
    * two-stage payload plumbing. mapPartitions is the sanctioned codec
    * slot (amortizes codec state per partition; no expression form
    * exists for a byte-level container parse). */
  def q149(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = audioSpecDs(s, d).mapPartitions { it =>
      useMemoryCache()
      it.map(a => AuPayload(a.doc_id, encodeWav(a.doc_id, a.rate, a.n)))
    }
    audioWindows(payloads).toDF().orderBy("doc_id", "win_idx")
  }

  /** Scale-probe hook (tools/ScaleProbe's video family): encode `n`
    * synthetic clips as animated GIFs (hash-derived dims 1..16 and 1..4
    * frames — no table) and container-walk every frame; returns total
    * frames decoded. Same two typed passes as q150; decade shape should
    * be LINEAR in total encoded pixels. */
  def videoProbe(s: SparkSession, n: Long): Long = {
    import s.implicits._
    val specs = s.range(n).select(col("id").as("doc_id"),
        (pmod(xxhash64(col("id"), lit("w")), lit(16)) + 1)
          .cast("int").as("width"),
        (pmod(xxhash64(col("id"), lit("h")), lit(16)) + 1)
          .cast("int").as("height"),
        (pmod(col("id"), lit(4)) + 1).cast("int").as("frames"),
        lit(true).as("gray"))
      .as[MmSpec]
    videoFrames(specs.mapPartitions(it => it.map(m =>
      GifPayload(m.doc_id, m.frames,
        encodeGif(m.doc_id, m.frames, m.width, m.height))))).count()
  }

  /** Scale-probe hook (tools/ScaleProbe's audio family): encode + parse
    * `n` synthetic clips — specs hash-derived so the decade needs no
    * table — and count the emitted windows. Same two typed passes as
    * q149; expected decade shape is LINEAR (shuffle-free mapPartitions;
    * the cost is the codec work itself). */
  def audioProbe(s: SparkSession, n: Long): Long = {
    import s.implicits._
    val specs = s.range(n).select(col("id").as("doc_id"),
        when(pmod(xxhash64(col("id"), lit("r")), lit(2)) === 0, 8000)
          .otherwise(16000).as("rate"),
        (pmod(xxhash64(col("id"), lit("n")), lit(800)) + 200)
          .cast("int").as("n"))
      .as[AuSpec]
    audioWindows(specs.mapPartitions(it => it.map(a =>
      AuPayload(a.doc_id, encodeWav(a.doc_id, a.rate, a.n))))).count()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_decode" -> q70,
    "q71_frame_sample" -> q71,
    "q72_binary_features" -> q72,
    "q149_audio_features" -> q149,
    "q150_video_container" -> q150)

  private val byteSql = (i: Int) =>
    s"CAST(CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS INT) AS INT)"
  /** The doc → image-spec closed forms, shared by all three oracles. */
  private val specSql =
    s"""SELECT doc_id, ${byteSql(0)} % 16 + 1 AS w,
       |  ${byteSql(1)} % 16 + 1 AS h,
       |  CAST(doc_id % 4 + 1 AS INT) AS frames,
       |  ${byteSql(2)} % 2 = 1 AS gray
       |FROM documents""".stripMargin

  /** The doc → clip-spec closed forms (digest bytes 3–5). */
  private val audioSpecSql =
    s"""SELECT doc_id,
       |  CASE WHEN ${byteSql(3)} % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
       |  (${byteSql(4)} * 3 + ${byteSql(5)}) % 800 + 200 AS n
       |FROM documents""".stripMargin

  /** The per-window sample index range of window wi, shared by the two
    * aggregate subqueries of the q149 oracle. */
  private val auWinRange =
    "range(256 * w.wi, 256 * w.wi + LEAST(256, n - 256 * w.wi))"

  val oracle: Map[String, String] = Map(
    "q150_video_container" ->
      s"""SELECT doc_id, CAST(f.fi AS INT) AS frame_idx,
        |  frames AS n_frames,
        |  CAST((SELECT SUM((doc_id * 31 + f.fi * 7 + y.y * 16 + x.x) % 256)
        |        FROM unnest(range(w)) AS x(x), unnest(range(h)) AS y(y))
        |    AS BIGINT) AS px_sum
        |FROM ($specSql) s, LATERAL (SELECT unnest(range(frames)) AS fi) f
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q149_audio_features" ->
      s"""SELECT doc_id, CAST(w.wi AS INT) AS win_idx,
        |  CAST(LEAST(256, n - 256 * w.wi) AS INT) AS n_in_win,
        |  CAST((SELECT SUM(ABS((doc_id * 31 + i.i * 7) % 65536 - 32768))
        |        FROM unnest($auWinRange) AS i(i)) AS BIGINT) AS abs_sum,
        |  CAST((SELECT MAX(ABS((doc_id * 31 + i.i * 7) % 65536 - 32768))
        |        FROM unnest($auWinRange) AS i(i)) AS INT) AS peak,
        |  rate, CAST(n * 1000 // rate AS BIGINT) AS dur_ms
        |FROM ($audioSpecSql) s,
        |  LATERAL (SELECT unnest(range((n + 255) // 256)) AS wi) w
        |ORDER BY doc_id, win_idx""".stripMargin,
    "q70_multimodal_decode" ->
      s"""SELECT doc_id,
        |  CAST(w * h * (CASE WHEN gray THEN 1 ELSE 3 END) AS INT) AS n_bytes,
        |  w AS width, h AS height, frames,
        |  CASE WHEN gray THEN 'gray' ELSE 'rgb' END AS fmt,
        |  CAST(GREATEST(w // 2, 1) AS INT) AS resized_w,
        |  CAST(GREATEST(h // 2, 1) AS INT) AS resized_h
        |FROM ($specSql) ORDER BY doc_id""".stripMargin,
    "q71_frame_sample" ->
      s"""SELECT doc_id, CAST(f.fi AS INT) AS frame_idx,
        |  CAST((SELECT SUM((doc_id * 31 + f.fi * 7 + y.y * 16 + x.x) % 256)
        |        FROM unnest(range(w)) AS x(x), unnest(range(h)) AS y(y))
        |    AS BIGINT) AS px_sum
        |FROM ($specSql) s, LATERAL (SELECT unnest(range(frames)) AS fi) f
        |WHERE f.fi % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q72_binary_features" ->
      (s"SELECT doc_id, " +
        (0 until 8).map { i =>
          val j = s"($i % (w * h))"
          s"CAST((doc_id * 31 + ($j // w) * 16 + ($j % w)) % 256 AS DOUBLE)" +
            s" / 255.0 AS f$i"
        }.mkString(", ") +
        s" FROM ($specSql) ORDER BY doc_id"))
}
