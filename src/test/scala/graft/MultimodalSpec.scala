package graft

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    pcm.indices.foreach(i => pcm(i) = ((i * 7) & 0xff).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("media table schema: binary payload + typed metadata struct") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))
    val f = media.schema("payload")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("media_type", "source", "declared_len"))
  }

  test("REAL codecs: ImageIO decodes PNG dims, javax.sound decodes WAV params") {
    val media = Seq(
      (1L, pngBytes(32, 16), "image/png"),
      (2L, pngBytes(7, 9), "image/png"),
      (3L, wavBytes(16000, 1, 1600), "audio/wav"),
      (4L, wavBytes(44100, 2, 441), "audio/wav"),
      (5L, "just some text".getBytes("UTF-8"), "text/plain"),
      (6L, Array[Byte](1, 2, 3), "image/png")) // corrupt: not a PNG
      .toDF("media_id", "payload", "mt")
      .select($"media_id", $"payload",
        struct($"mt".as("media_type"), lit("test").as("source"),
          lit(0L).as("declared_len")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media)
      .select($"media_id", $"features.*").orderBy($"media_id").collect()

    val img1 = out(0)
    assert(img1.getAs[String]("kind") == "image")
    assert(img1.getAs[Int]("width") == 32 && img1.getAs[Int]("height") == 16)
    assert(img1.getAs[String]("format") == "png")
    val img2 = out(1)
    assert(img2.getAs[Int]("width") == 7 && img2.getAs[Int]("height") == 9)

    val wav1 = out(2)
    assert(wav1.getAs[String]("kind") == "audio")
    assert(wav1.getAs[Int]("sample_rate") == 16000)
    assert(wav1.getAs[Int]("channels") == 1)
    assert(wav1.getAs[Long]("frames") == 1600L)
    val wav2 = out(3)
    assert(wav2.getAs[Int]("sample_rate") == 44100 && wav2.getAs[Int]("channels") == 2)

    assert(out(4).getAs[String]("kind") == "text")
    assert(out(4).getAs[Long]("n_bytes") == 14L)
    // corrupt bytes degrade, never throw (PERMISSIVE / X6)
    assert(out(5).getAs[String]("kind") == "unknown")
    assert(out(5).getAs[String]("format") == "corrupt")
  }

  test("feature extraction is 1:1, deterministic, and prunes the payload") {
    val docs = Tables.documents(spark, sf0001)
    val feats = Multimodal.mediaFeatures(spark, docs)
    assert(feats.count() == docs.count())
    assert(!feats.columns.contains("payload"))
    // deterministic across runs and partitionings
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.mediaFeatures(spark, docs.repartition(7)).orderBy("media_id").collect()
    assert(a.sameElements(b))
    // the synthetic corpus is text: the text branch is the honest one
    val one = docs.where($"doc_id" === 0).select($"text").as[String].head()
    val f0 = feats.where($"media_id" === 0).head()
    assert(f0.getAs[String]("kind") == "text")
    assert(f0.getAs[Long]("n_bytes") == one.getBytes("UTF-8").length.toLong)
  }

  test("decode is partition-local (no shuffle in the plan)") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  private def pcm16(nFrames: Int, bigEndian: Boolean): Array[Byte] = {
    val out = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = ((i * 773) % 65536 - 32768).toShort
      if (bigEndian) { out(2 * i) = (v >> 8).toByte; out(2 * i + 1) = (v & 0xff).toByte }
      else { out(2 * i) = (v & 0xff).toByte; out(2 * i + 1) = (v >> 8).toByte }
    }
    out
  }

  private def audioBytes(tpe: AudioFileFormat.Type, bigEndian: Boolean,
      nFrames: Int): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm16(nFrames, bigEndian)), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  test("frame-sample canonicalizes endianness: WAV (LE) and AIFF (BE) of the " +
      "same PCM yield identical samples") {
    val n = 500
    val wav = Multimodal.sampleAudioFrames(
      audioBytes(AudioFileFormat.Type.WAVE, bigEndian = false, n), 16).get
    val aiff = Multimodal.sampleAudioFrames(
      audioBytes(AudioFileFormat.Type.AIFF, bigEndian = true, n), 16).get
    assert(wav.length == 16 && wav.sameElements(aiff),
      s"byte-order must not leak into samples: ${wav.toSeq} vs ${aiff.toSeq}")
    // and the values are the true signed samples, not swapped bytes
    val truth = (0 until 16).map { i =>
      val f = (i.toLong * n / 16).min(n - 1L).toInt
      ((f * 773) % 65536 - 32768).toLong
    }
    assert(wav.toSeq == truth)
  }

  // ---- video fixtures: generated MJPEG + Y4M ----

  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def mjpegBytes(w: Int, h: Int, grays: Seq[Int]): Array[Byte] =
    grays.toArray.flatMap(g => jpegBytes(w, h, g))

  private def y4mBytes(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val cs = ((w + 1) / 2) * ((h + 1) / 2)
    lumas.foreach { v =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(Array.fill[Byte](w * h)(v.toByte))   // constant Y plane
      bos.write(Array.fill[Byte](2 * cs)(128.toByte)) // neutral chroma
    }
    bos.toByteArray
  }

  test("REAL video: Y4M parses header/planes; frame count, dims, exact mean luma") {
    val clip = y4mBytes(20, 10, Seq(5, 15, 25, 35, 45, 55, 65, 75))
    assert(Multimodal.probeVideo(clip).contains((20, 10, 8L, "y4m")))
    // 4 evenly-spaced of 8 frames = frames 0,2,4,6; constant planes make
    // the integer mean luma exact
    assert(Multimodal.sampleVideoFrames(clip, 4).get.toSeq == Seq(5L, 25L, 45L, 65L))
    // n > frame count: duplicate indices reuse the computed value
    val over = Multimodal.sampleVideoFrames(y4mBytes(4, 4, Seq(10, 20)), 4).get
    assert(over.toSeq == Seq(10L, 10L, 20L, 20L))
  }

  test("REAL video: MJPEG splits frames by segment parse and decodes via ImageIO") {
    val clip = mjpegBytes(16, 8, Seq(40, 120, 200))
    assert(Multimodal.probeVideo(clip).contains((16, 8, 3L, "mjpeg")))
    val s = Multimodal.sampleVideoFrames(clip, 3).get
    assert(s.length == 3)
    // solid-gray JPEG round-trips within codec error; order must hold
    for ((v, truth) <- s.zip(Seq(40L, 120L, 200L)))
      assert(math.abs(v - truth) <= 3, s"${s.toSeq} vs 40/120/200")
    // deterministic across calls
    assert(Multimodal.sampleVideoFrames(clip, 3).get.sameElements(s))
  }

  test("video corrupt-degrade: truncated containers yield None, never throw") {
    val mj = mjpegBytes(8, 8, Seq(50, 60))
    assert(Multimodal.sampleVideoFrames(mj.dropRight(10), 2).isEmpty)
    assert(Multimodal.probeVideo(mj.dropRight(10)).isEmpty)
    val y4 = y4mBytes(4, 4, Seq(10, 20))
    assert(Multimodal.sampleVideoFrames(y4.dropRight(3), 2).isEmpty)
    // bad header dims
    assert(Multimodal.y4mFrames("YUV4MPEG2 W0 H4\nFRAME\n".getBytes).isEmpty)
    // unrecognized container (codec formats) is None from the REAL path
    assert(Multimodal.sampleVideoFrames(Array.tabulate[Byte](64)(_.toByte), 2).isEmpty)
  }

  test("video adversarial headers: overflow dims degrade, never hang or throw") {
    // W65536 x H65536 overflows Int (w*h = 2^32 -> 0): the old frame
    // cursor stepped backward into an infinite loop (review finding)
    val huge = "YUV4MPEG2 W65536 H65536 C420jpeg\nFRAMEcrafted-params\nFRAME\n"
      .getBytes("US-ASCII")
    assert(Multimodal.y4mFrames(huge).isEmpty)
    assert(Multimodal.probeVideo(huge).isEmpty)
    // dims whose frame cannot fit the payload are malformed, not a crash
    val toobig = "YUV4MPEG2 W1000 H1000\nFRAME\nxx".getBytes("US-ASCII")
    assert(Multimodal.y4mFrames(toobig).isEmpty)
  }

  test("MJPEG: 0xFF fill bytes before a marker are legal padding") {
    // splice a fill byte before each frame's EOI: FF FF D9 (cameras pad
    // this way); the old parser read the second FF as a marker id with a
    // bogus length and rejected the clip (review finding)
    val clip = mjpegBytes(8, 8, Seq(70, 140))
    val padded = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < clip.length) {
      if (i + 1 < clip.length && (clip(i) & 0xff) == 0xff &&
          (clip(i + 1) & 0xff) == 0xd9) padded.write(0xff)
      padded.write(clip(i) & 0xff)
      i += 1
    }
    val p = padded.toByteArray
    assert(p.length == clip.length + 2)
    assert(Multimodal.probeVideo(p).exists(_._4 == "mjpeg"))
    val s = Multimodal.sampleVideoFrames(p, 2).get
    for ((v, truth) <- s.zip(Seq(70L, 140L)))
      assert(math.abs(v - truth) <= 3, s"${s.toSeq} vs 70/140")
  }

  // ---- MP4 container metadata (pure box-structure parse) ----

  private def mp4Box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(typ.getBytes("US-ASCII"))
    bb.put(body)
    bb.array()
  }
  private def be32(v: Long) =
    java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def be16(v: Int) =
    java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()

  /** Minimal conformant MP4: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd,
    * hdlr, minf(stbl(stsd(avc1), stsz))))) + mdat. */
  private def mp4Bytes(w: Int, h: Int, frames: Long, timescale: Long,
      duration: Long, handler: String = "vide",
      withStsd: Boolean = true): Array[Byte] = {
    val avc1 = mp4Box("avc1", new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(w), be16(h), new Array[Byte](50))
    val stsd = mp4Box("stsd", be32(0), be32(1), avc1)
    val stsz = mp4Box("stsz", be32(0), be32(0), be32(frames))
    val stbl =
      if (withStsd) mp4Box("stbl", stsd, stsz) else mp4Box("stbl", stsz)
    val minf = mp4Box("minf", stbl)
    val hdlr = mp4Box("hdlr", be32(0), be32(0),
      handler.getBytes("US-ASCII"), new Array[Byte](13))
    val mdhd = mp4Box("mdhd", be32(0), be32(0), be32(0), be32(timescale),
      be32(duration), be16(0x55c4), be16(0))
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val tkhd = mp4Box("tkhd", be32(7), be32(0), be32(0), be32(1), be32(0),
      be32(duration), new Array[Byte](8), new Array[Byte](8),
      new Array[Byte](36), be32(w.toLong << 16), be32(h.toLong << 16))
    val trak = mp4Box("trak", tkhd, mdia)
    val mvhd = mp4Box("mvhd", be32(0), be32(0), be32(0), be32(600),
      be32(1800), new Array[Byte](80))
    val moov = mp4Box("moov", mvhd, trak)
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(512),
      "isom".getBytes("US-ASCII"))
    ftyp ++ moov ++ mp4Box("mdat", Array.fill[Byte](32)(0x42))
  }

  test("MP4: box-structure parse yields real dims, frame count, duration") {
    val clip = mp4Bytes(640, 360, 90L, 30L, 90L)
    assert(Multimodal.probeVideo(clip).contains((640, 360, 90L, "mp4")))
    // duration = 90 media units at timescale 30 = 3000 ms
    assert(Multimodal.mp4Meta(clip).contains((640, 360, 90L, 3000L)))
  }

  test("MP4: tkhd presentation dims are the fallback when stsd is absent") {
    val clip = mp4Bytes(320, 240, 12L, 24L, 48L, withStsd = false)
    assert(Multimodal.probeVideo(clip).contains((320, 240, 12L, "mp4")))
    assert(Multimodal.mp4Meta(clip).contains((320, 240, 12L, 2000L)))
  }

  test("MP4: audio-only and malformed containers degrade to None") {
    // a soun track is not a video track
    assert(Multimodal.probeVideo(mp4Bytes(640, 360, 90L, 30L, 90L,
      handler = "soun")).isEmpty)
    // truncated moov: box sizes overrun the payload
    val clip = mp4Bytes(640, 360, 90L, 30L, 90L)
    assert(Multimodal.probeVideo(clip.take(clip.length / 2)).isEmpty)
    // a size-0 first box claiming to-end with no moov inside
    assert(Multimodal.mp4Meta("    ftypxxxx"
      .getBytes("US-ASCII")).isEmpty)
  }

  test("q42 feature dispatch: video kind carries dims + frame count") {
    val media = Seq(
      (1L, mjpegBytes(12, 6, Seq(30, 90)), "video/x-motion-jpeg"),
      (2L, y4mBytes(6, 4, Seq(7, 8, 9)), "video/x-yuv4mpeg"),
      (3L, Array[Byte](9, 9, 9), "video/mp4")) // no JRE codec: corrupt kind
      .toDF("media_id", "payload", "mt")
      .select($"media_id", $"payload",
        struct($"mt".as("media_type"), lit("t").as("source"),
          lit(0L).as("declared_len")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media)
      .select($"media_id", $"features.*").orderBy($"media_id").collect()
    assert(out(0).getAs[String]("kind") == "video")
    assert(out(0).getAs[Int]("width") == 12 && out(0).getAs[Int]("height") == 6)
    assert(out(0).getAs[Long]("frames") == 2L)
    assert(out(0).getAs[String]("format") == "mjpeg")
    assert(out(1).getAs[String]("kind") == "video")
    assert(out(1).getAs[Long]("frames") == 3L)
    assert(out(1).getAs[String]("format") == "y4m")
    assert(out(2).getAs[String]("kind") == "unknown")
    assert(out(2).getAs[String]("format") == "corrupt")
  }

  test("preprocess: REAL resize + frame-sample, corrupt degrades, payload pruned") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      Row(1L, pngBytes(16, 12), Row("image/png", "s", 0L)),
      Row(2L, wavBytes(8000, 1, 1000), Row("audio/wav", "s", 0L)),
      Row(3L, Array.tabulate[Byte](100)(_.toByte), Row("video/mp4", "s", 0L)),
      Row(4L, "not media".getBytes, Row("image/png", "s", 0L)), // corrupt
      Row(5L, null, Row("video/mp4", "s", 0L)),                 // null payload
      Row(6L, "x".getBytes, null),                              // null meta
      Row(7L, y4mBytes(4, 4, Seq(11, 22, 33)), Row("video/x-yuv4mpeg", "s", 0L)),
      Row(8L, mjpegBytes(8, 8, Seq(77)).dropRight(6), Row("video/x-motion-jpeg", "s", 0L)))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("media_type", StringType),
        StructField("source", StringType),
        StructField("declared_len", LongType))))))
    val media = spark.createDataFrame(rows, schema)
    val out = Multimodal.preprocess(spark, media, 4, 4, 8)
    assert(!out.columns.contains("payload"), "binary input pruned from output")
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    // image: resized bytes re-decode to exactly the target dims
    val png = byId(1L).getAs[Array[Byte]]("resized_png")
    val dims = Multimodal.decodeImage(png).get
    assert((dims._1, dims._2) == (4, 4))
    // audio: n real PCM samples, deterministic across runs
    val s1 = byId(2L).getSeq[Long](2)
    assert(s1.length == 8)
    val again = Multimodal.preprocess(spark, media, 4, 4, 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(again(2L).getSeq[Long](2) == s1)
    // video, no JRE codec (mp4 bytes): stub strides the payload
    assert(byId(3L).getSeq[Long](2).length == 8)
    // video, REAL container: Y4M decodes — constant planes, exact lumas
    assert(byId(7L).getSeq[Long](2) == Seq(11L, 11L, 11L, 22L, 22L, 22L, 33L, 33L))
    // video, recognized container but truncated: degrades to null, not stub
    assert(byId(8L).isNullAt(2))
    // corrupt image: null outputs, row survives (PERMISSIVE)
    assert(byId(4L).isNullAt(1) && byId(4L).isNullAt(2))
    // null payload / null meta: the never-throws contract holds on every
    // branch (a video-stub NPE here would kill a 100 TB scan)
    assert(byId(5L).isNullAt(1) && byId(5L).isNullAt(2))
    assert(byId(6L).isNullAt(1) && byId(6L).isNullAt(2))
    // partition-local: no shuffle
    val plan = Multimodal.preprocess(spark, media, 4, 4, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("perceptual hash (q170): re-encoded and resized duplicates hash " +
      "together, distinct images do not, corrupt bytes degrade") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val png = Multimodal.phashFixturePng(0L)
    val h0 = Multimodal.aHash64(png).get
    // words are 32-bit (the SQL-oracle-safe two-word form)
    assert(h0._1 >= 0 && h0._1 < (1L << 32) && h0._2 >= 0 && h0._2 < (1L << 32))
    // RE-ENCODED duplicate: same pixels, different container (PNG→BMP),
    // different bytes — identical hash (q24's md5 misses exactly this)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(!java.util.Arrays.equals(png, bmp))
    assert(Multimodal.aHash64(bmp).contains(h0),
      "a lossless re-encode must hash identically")
    // RESIZED duplicate: scale-invariance within the pairing threshold
    val up = Multimodal.resizeImage(png, 32, 32).get
    val hUp = Multimodal.aHash64(up).get
    assert(hamming(h0, hUp) <= graft.queries.DedupQueries.PhHamMax,
      s"a 2x resize must stay within the pairing threshold, got ${hamming(h0, hUp)}")
    // DISTINCT image (another fixture group, not a corrupt id): far in
    // Hamming space
    val hOther = Multimodal.aHash64(Multimodal.phashFixturePng(40L)).get
    assert(hamming(h0, hOther) > graft.queries.DedupQueries.PhHamMax,
      s"distinct images must not pair, got ${hamming(h0, hOther)}")
    // CORRUPT bytes: degrade to None, never throw (X6)
    assert(Multimodal.aHash64(Multimodal.phashFixturePng(3L)).isEmpty)
    assert(Multimodal.aHash64(Array.empty[Byte]).isEmpty)
    // the full query survives corrupt rows and pairs only within the
    // fixture's duplicate groups (cross-group distances are ~32)
    val pairs = graft.queries.DedupQueries.q170PhashNeardup(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty, "the fixture groups must yield near-dup pairs")
    assert(pairs.forall(r => r.getLong(0) / 10 == r.getLong(1) / 10),
      "every emitted pair must come from one duplicate group")
    assert(pairs.forall(r => r.getLong(0) % 17 != 3 && r.getLong(1) % 17 != 3),
      "corrupt rows must be excluded, not fatal")
  }

  test("audio fingerprint (q171): re-containered and resampled duplicates " +
      "hash together, distinct audio does not, corrupt bytes degrade") {
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val wav = Multimodal.afpFixtureWav(0L)
    val h0 = Multimodal.afp64(wav).get
    // words are 32-bit (the SQL-oracle-safe two-word form)
    assert(h0._1 >= 0 && h0._1 < (1L << 32) && h0._2 >= 0 && h0._2 < (1L << 32))
    // RE-CONTAINERED duplicate: same PCM, AIFF (big-endian) container,
    // different bytes — identical fingerprint (q24's md5 misses this)
    val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val be = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f,
        /*bigEndian=*/ true), raw)
    val bosA = new ByteArrayOutputStream()
    AudioSystem.write(be, AudioFileFormat.Type.AIFF, bosA)
    val aiff = bosA.toByteArray
    assert(!java.util.Arrays.equals(wav, aiff))
    assert(Multimodal.afp64(aiff).contains(h0),
      "a lossless re-container (WAV→AIFF, endianness swap) must " +
        "fingerprint identically")
    // RESAMPLED duplicate: 2× sample rate by frame duplication — the
    // relative segment boundaries keep the fingerprint inside the
    // pairing threshold (here: exactly equal)
    val mono = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val pcm = mono.readAllBytes()
    val up = new Array[Byte](pcm.length * 2)
    var f = 0
    while (f < pcm.length / 2) {
      up(4 * f) = pcm(2 * f); up(4 * f + 1) = pcm(2 * f + 1)
      up(4 * f + 2) = pcm(2 * f); up(4 * f + 3) = pcm(2 * f + 1)
      f += 1
    }
    val upFmt = new AudioFormat(16000f, 16, 1, true, false)
    val upAis = new AudioInputStream(
      new java.io.ByteArrayInputStream(up), upFmt, (pcm.length / 2) * 2L)
    val bosU = new ByteArrayOutputStream()
    AudioSystem.write(upAis, AudioFileFormat.Type.WAVE, bosU)
    val hUp = Multimodal.afp64(bosU.toByteArray).get
    assert(hamming(h0, hUp) <= graft.queries.DedupQueries.AfpHamMax,
      s"a 2x resample must stay within the pairing threshold, " +
        s"got ${hamming(h0, hUp)}")
    // DISTINCT audio (another fixture group, not a corrupt id): far in
    // Hamming space
    val hOther = Multimodal.afp64(Multimodal.afpFixtureWav(40L)).get
    assert(hamming(h0, hOther) > graft.queries.DedupQueries.AfpHamMax,
      s"distinct audio must not pair, got ${hamming(h0, hOther)}")
    // CORRUPT bytes: degrade to None, never throw (X6)
    assert(Multimodal.afp64(Multimodal.afpFixtureWav(5L)).isEmpty)
    assert(Multimodal.afp64(Array.empty[Byte]).isEmpty)
    // too short for 64 segments: degrade, never divide by zero
    assert(Multimodal.afp64(wavBytes(8000, 1, 63)).isEmpty)
    // the full query survives corrupt rows and pairs only within the
    // fixture's duplicate groups (cross-group distances are ~32)
    val pairs = graft.queries.DedupQueries.q171AudioFpNeardup(spark, sf0001)
      .collect()
    assert(pairs.nonEmpty, "the fixture groups must yield near-dup pairs")
    assert(pairs.forall(r => r.getLong(0) / 10 == r.getLong(1) / 10),
      "every emitted pair must come from one duplicate group")
    assert(pairs.forall(r => r.getLong(0) % 19 != 5 && r.getLong(1) % 19 != 5),
      "corrupt rows must be excluded, not fatal")
  }
}
