package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-item decode / feature-extraction runs as partition-local batch
  * functions (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`: one JVM call per batch, vectorizable inside, no
  * per-row driver involvement, schema declared up front).
  *
  * The actual codec step is a STUB — image/audio libraries are not in this
  * environment — implemented as a deterministic fake derived from the
  * payload bytes, so the Spark-side contract (schemas, batch shape,
  * partitioning, null handling) is real and tested while the codec is
  * swappable.
  */
object Multimodal {

  /** A media item: opaque payload + typed envelope. */
  final case class MediaItem(media_id: Long, kind: String,
      payload: Array[Byte])

  final case class DecodedMeta(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, sampleRate: Int, nFrames: Int,
      sizeBytes: Long)

  final case class MediaFeature(media_id: Long, embedding: Array[Float])

  final case class Frame(media_id: Long, frameIndex: Int,
      payload: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  // ------------------------------------------------------ codec: real + STUB

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG, JPEG,
    * GIF, BMP — no external library): width/height from the decoded
    * raster, channels = raster band count. Returns null when the payload
    * is not a parseable image, so [[decode]] can fall back to the stub.
    */
  def decodeImage(item: MediaItem): DecodedMeta = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) null
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) null
      else DecodedMeta(item.media_id, item.kind, img.getWidth, img.getHeight,
        channels = img.getRaster.getNumBands, sampleRate = 0, nFrames = 1,
        sizeBytes = bytes.length.toLong)
    }
  }

  /** Deterministic PNG encoder (the test/gate-side payload source — a
    * stand-in for dereferencing an object-store pointer): a `w`×`h`
    * 3-band image whose pixel (x, y) is a pure function of (x, y, seed).
    * PNG is lossless, so decode returns these exact pixels.
    */
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"encodePng needs positive dims, got ${w}x$h")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (x * 31 + y * 17 + seed).toInt & 0xffffff
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled` (WAV/
    * AIFF/AU PCM — no external library): channels and sample rate from the
    * container format, nFrames = PCM frame count. width/height are 0 for
    * audio (the stub fakes nonzero ones, so 0 also marks "really
    * decoded"). Returns null when the payload is not a parseable audio
    * container, so [[decode]] can fall back to the stub.
    */
  def decodeAudio(item: MediaItem): DecodedMeta = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) null
    else {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          // frame length can be NOT_SPECIFIED (-1) for streamed
          // containers (e.g. AU with the 0xFFFFFFFF unknown-size
          // header) — count the PCM bytes instead of shipping -1
          val fl = in.getFrameLength
          val nFrames =
            if (fl >= 0) fl.toInt
            else if (fmt.getFrameSize > 0) in.readAllBytes().length / fmt.getFrameSize
            else -1
          if (nFrames < 0) null
          else DecodedMeta(item.media_id, item.kind, width = 0, height = 0,
            channels = fmt.getChannels,
            sampleRate = math.round(fmt.getSampleRate),
            nFrames = nFrames,
            sizeBytes = bytes.length.toLong)
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    }
  }

  /** Decoded PCM16 samples, interleaved by channel — the input a real
    * feature front-end (fbank/wav2vec) consumes. PCM in a WAV container
    * is lossless, so [[encodeWav]]'s samples round-trip bit-exactly.
    */
  /** One PCM16 sample from its two container bytes (the first byte is
    * high in big-endian containers) — the ONE copy of the assembly both
    * [[decodeAudioSamples]] and [[decimateWav]] read through.
    */
  private def pcm16(bytes: Array[Byte], off: Int,
      bigEndian: Boolean): Short = {
    val b0 = bytes(off) & 0xff
    val b1 = bytes(off + 1) & 0xff
    (if (bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
  }

  def decodeAudioSamples(item: MediaItem): Array[Short] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(item.payload))
    try {
      require(in.getFormat.getSampleSizeInBits == 16,
        s"decodeAudioSamples expects PCM16, got ${in.getFormat}")
      val bytes = in.readAllBytes()
      val bigEndian = in.getFormat.isBigEndian
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = pcm16(bytes, 2 * i, bigEndian)
        i += 1
      }
      out
    } finally in.close()
  }

  /** Deterministic WAV (PCM16 little-endian) encoder — the audio twin of
    * [[encodePng]]: `nSamples` frames of `channels` interleaved samples,
    * each a pure function of (frame, channel, seed).
    */
  def encodeWav(nSamples: Int, sampleRate: Int, channels: Int,
      seed: Long): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0 && channels > 0,
      s"encodeWav needs positive dims, got n=$nSamples sr=$sampleRate ch=$channels")
    val data = new Array[Byte](nSamples * channels * 2)
    var i = 0
    var off = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) {
        val v = (((i.toLong * 2654435761L + c * 40503L + seed) >>> 16) & 0xffffL).toShort
        data(off) = (v & 0xff).toByte
        data(off + 1) = ((v >> 8) & 0xff).toByte
        off += 2
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16,
      channels, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL video CONTAINER decode: a hand-rolled RIFF-AVI parser (pure
    * JVM — walking the chunk tree needs no codec) reads the MainAVIHeader
    * (`avih`): width, height, total frames, and the frame rate recovered
    * from dwMicroSecPerFrame (reported in the sampleRate slot — frames
    * per second — when 10⁶ divides evenly, else 0). This is the honest
    * scope without codec libraries: the container metadata a pipeline
    * catalogs is real; PIXEL decode of the frames stays out of scope.
    * Returns null for payloads that aren't a well-formed AVI, so
    * [[decode]] can fall back to the stub.
    */
  def decodeVideo(item: MediaItem): DecodedMeta = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.length < 24) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    val riffEnd = math.min(bytes.length.toLong, 8L + (bb.getInt(4) & 0xffffffffL))
    // walk top-level chunks; descend into LIST hdrl for avih
    def findAvih(start: Long, end: Long): Int = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off.toInt)
        val size = bb.getInt(off.toInt + 4) & 0xffffffffL
        if (id == "avih") return off.toInt + 8
        if (id == "LIST" && off + 12 <= end &&
            fourcc(off.toInt + 8) == "hdrl") {
          val inner = findAvih(off + 12, math.min(end, off + 8 + size))
          if (inner >= 0) return inner
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      -1
    }
    val avih = findAvih(12L, riffEnd)
    if (avih < 0 || avih + 40 > bytes.length) return null
    val usPerFrame = bb.getInt(avih) & 0xffffffffL
    val nFrames = bb.getInt(avih + 16)
    val width = bb.getInt(avih + 32)
    val height = bb.getInt(avih + 36)
    if (width <= 0 || height <= 0 || nFrames < 0) return null
    val fps =
      if (usPerFrame > 0 && 1000000L % usPerFrame == 0L)
        (1000000L / usPerFrame).toInt
      else 0
    DecodedMeta(item.media_id, item.kind, width = width, height = height,
      channels = 3, sampleRate = fps, nFrames = nFrames,
      sizeBytes = bytes.length.toLong)
  }

  /** Deterministic minimal-AVI encoder — the video twin of [[encodePng]]/
    * [[encodeWav]]: RIFF("AVI ") → LIST(hdrl){avih} → LIST(movi){nFrames ×
    * 00dc chunks of `frameBytes` seed-derived bytes}. [[decodeVideo]]
    * recovers (w, h, nFrames, fps) exactly.
    */
  def encodeAvi(w: Int, h: Int, nFrames: Int, fps: Int, seed: Long,
      frameBytes: Int = 16): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames >= 0 && fps > 0 && 1000000 % fps == 0,
      s"encodeAvi needs positive dims and fps dividing 1e6, got " +
        s"${w}x$h n=$nFrames fps=$fps")
    val avihData = new Array[Int](14)
    avihData(0) = 1000000 / fps // dwMicroSecPerFrame
    avihData(4) = nFrames // dwTotalFrames
    avihData(6) = 1 // dwStreams
    avihData(8) = w // dwWidth
    avihData(9) = h // dwHeight
    val hdrlSize = 4 + 8 + 56 // "hdrl" + avih chunk
    val frame = frameBytes + (frameBytes & 1)
    val moviSize = 4 + nFrames * (8 + frame)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) =
      out.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); out.putInt(riffSize); cc("AVI ")
    cc("LIST"); out.putInt(hdrlSize); cc("hdrl")
    cc("avih"); out.putInt(56); avihData.foreach(out.putInt)
    cc("LIST"); out.putInt(moviSize); cc("movi")
    var i = 0
    while (i < nFrames) {
      cc("00dc"); out.putInt(frame)
      var b = 0
      while (b < frame) {
        out.put((((i.toLong * 31 + b) * 2654435761L + seed) >>> 24).toByte)
        b += 1
      }
      i += 1
    }
    out.array()
  }

  /** Full decode dispatch: real `javax.imageio` for images, real
    * `javax.sound.sampled` for audio, real RIFF-AVI container parsing
    * for video; honest STUB for bytes that aren't a decodable container
    * (and for video pixel data, which needs codecs this environment
    * doesn't have).
    */
  private[ops] def decode(item: MediaItem): DecodedMeta =
    if (item.kind == "image") {
      val real = decodeImage(item)
      if (real != null) real else stubDecode(item)
    } else if (item.kind == "audio") {
      val real = decodeAudio(item)
      if (real != null) real else stubDecode(item)
    } else if (item.kind == "video") {
      val real = decodeVideo(item)
      if (real != null) real else stubDecode(item)
    } else stubDecode(item)

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * Stands in for the audio/video codecs (not in this environment) and
    * for undecodable image bytes; everything downstream only sees the
    * schema.
    */
  private[ops] def stubDecode(item: MediaItem): DecodedMeta = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    var h = 1125899906842597L
    bytes.foreach(b => h = h * 31 + b)
    val pos = (h & Long.MaxValue)
    DecodedMeta(item.media_id, item.kind,
      width = (pos % 640L).toInt + 1,
      height = ((pos / 640L) % 480L).toInt + 1,
      channels = if (item.kind == "audio") 2 else 3,
      sampleRate = if (item.kind == "audio") 16000 else 0,
      nFrames = if (item.kind == "video") (pos % 240L).toInt + 1 else 1,
      sizeBytes = bytes.length.toLong)
  }

  /** STUB feature extractor: fixed-size embedding from byte histogram —
    * stands in for a vision/audio encoder with the same batched calling
    * convention and output schema.
    */
  private[ops] def stubFeatures(item: MediaItem, dims: Int): MediaFeature = {
    val acc = new Array[Float](dims)
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    var i = 0
    while (i < bytes.length) {
      acc((bytes(i) & 0xff) % dims) += 1.0f
      i += 1
    }
    val n = math.max(1, bytes.length).toFloat
    MediaFeature(item.media_id, acc.map(_ / n))
  }

  // --------------------------------------------------------- Spark plumbing

  /** Attach payloads to any table: `payloadFrom` is typically a storage
    * pointer dereference; here, a column expression producing binary.
    */
  def asMedia(df: DataFrame, idCol: String, kindCol: Column,
      payloadCol: Column): Dataset[MediaItem] = {
    implicit val enc = Encoders.product[MediaItem]
    df.select(col(idCol).cast("long").as("media_id"),
      kindCol.as("kind"), payloadCol.as("payload")).as[MediaItem]
  }

  /** Media kind from the payload's magic bytes, falling back to the file
    * extension for container-less formats, else "binary". Magic wins over
    * extension — a mislabeled file routes to the decoder that can
    * actually parse it.
    */
  def sniffKind(bytes: Array[Byte], path: String): String = {
    val b = Option(bytes).getOrElse(Array.emptyByteArray)
    def at(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(i => (b(off + i) & 0xff) == s.charAt(i).toInt)
    if ((b.length >= 4 && (b(0) & 0xff) == 0x89 && at(1, "PNG")) ||
        (b.length >= 3 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) ||
        at(0, "GIF8") || at(0, "BM")) "image"
    else if (at(0, "RIFF") && at(8, "WAVE")) "audio"
    else if (at(0, "RIFF") && at(8, "AVI ")) "video"
    else if (at(0, "FORM") && at(8, "AIFF")) "audio"
    else if (at(0, ".snd")) "audio"
    else {
      val dot = path.lastIndexOf('.')
      val ext = if (dot < 0) "" else
        path.substring(dot + 1).toLowerCase(java.util.Locale.ROOT)
      ext match {
        case "png" | "jpg" | "jpeg" | "gif" | "bmp" => "image"
        case "wav" | "aiff" | "au" => "audio"
        case "avi" => "video"
        case _ => "binary"
      }
    }
  }

  /** Stable media_id for a file path: the trailing digit run of the
    * basename (the `img_000123.png` curation-catalog convention), else a
    * non-negative polynomial hash of the basename — deterministic across
    * runs and listing orders, unlike monotonically_increasing_id.
    */
  def mediaIdFor(path: String): Long = {
    val slash = path.lastIndexOf('/')
    val dot = path.lastIndexOf('.')
    val base = path.substring(slash + 1,
      if (dot > slash) dot else path.length)
    var end = base.length
    var start = end
    while (start > 0 && base.charAt(start - 1).isDigit) start -= 1
    // ≤ 18 digits can't overflow a Long
    if (start < end && end - start <= 18) base.substring(start, end).toLong
    else base.foldLeft(1125899906842597L)((h, c) => 31 * h + c) &
      Long.MaxValue
  }

  /** Real-file ingestion: a directory of on-disk media files →
    * `Dataset[MediaItem]` through Spark's distributed `binaryFile`
    * source (one task per file group, partition pruning via
    * `pathGlobFilter`, no driver-side listing of contents). kind comes
    * from [[sniffKind]] (magic bytes first), media_id from
    * [[mediaIdFor]]. At 100 TB this is the entry point: payloads stay in
    * executor memory per-partition, and everything downstream
    * ([[decodeMeta]], [[extractFeatures]], [[demuxFrames]]) is already
    * partition-local.
    */
  def fromFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaItem] = {
    implicit val enc = Encoders.product[MediaItem]
    spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .mapPartitions(_.map { case (p, bytes) =>
        MediaItem(mediaIdFor(p), sniffKind(bytes, p), bytes)
      })
  }

  /** Decode metadata partition-locally (batch per partition, codec called
    * once per item inside the JVM — no shuffle, linear scan). Image
    * payloads go through the REAL `javax.imageio` decoder; audio/video
    * and unparseable bytes through the stub.
    */
  def decodeMeta(items: Dataset[MediaItem]): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    items.mapPartitions(_.map(decode))
  }

  /** Feature extraction with the same batch shape; `dims` fixed up front
    * so the output schema is static.
    */
  def extractFeatures(items: Dataset[MediaItem], dims: Int = 64)
      : Dataset[MediaFeature] = {
    require(dims > 0, s"extractFeatures needs dims >= 1, got $dims")
    implicit val enc = Encoders.product[MediaFeature]
    items.mapPartitions(_.map(stubFeatures(_, dims)))
  }

  /** Frame sampling for video payloads: every `stride`-th frame becomes a
    * row (1→N explode, partition-local). STUB frame splitter: fixed-size
    * byte windows standing in for real demuxed frames.
    */
  def sampleFrames(items: Dataset[MediaItem], stride: Int,
      frameBytes: Int = 256): Dataset[Frame] = {
    // fail at plan build, not per-row in executors: stride 0 would throw
    // from the range step, a negative one silently emits nothing
    require(stride > 0, s"sampleFrames needs stride >= 1, got $stride")
    require(frameBytes > 0, s"sampleFrames needs frameBytes >= 1, got $frameBytes")
    implicit val enc = Encoders.product[Frame]
    items.filter(_.kind == "video").mapPartitions(_.flatMap { item =>
      val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
      val nFrames = math.max(1, bytes.length / frameBytes)
      (0 until nFrames by stride).iterator.map { f =>
        Frame(item.media_id, f,
          bytes.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    })
  }

  /** REAL frame demux for AVI payloads: walk the `movi` LIST and emit
    * every `stride`-th video-data chunk (`??dc`/`??db`) as a Frame row —
    * the payload bytes are the ACTUAL stored frame data, byte for byte
    * (spec round-trips them against [[encodeAvi]]'s generator). Non-AVI
    * payloads fall back to the byte-window stub splitter, so the 1→N
    * contract is total. Partition-local like [[sampleFrames]].
    */
  def demuxFrames(items: Dataset[MediaItem], stride: Int): Dataset[Frame] = {
    require(stride > 0, s"demuxFrames needs stride >= 1, got $stride")
    implicit val enc = Encoders.product[Frame]
    items.filter(_.kind == "video").mapPartitions(_.flatMap { item =>
      val frames = aviFrames(item)
      if (frames != null)
        frames.zipWithIndex.collect {
          case (f, i) if i % stride == 0 => Frame(item.media_id, i, f)
        }.iterator
      else {
        val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
        val nFrames = math.max(1, bytes.length / 256)
        (0 until nFrames by stride).iterator.map { f =>
          Frame(item.media_id, f, bytes.slice(f * 256, (f + 1) * 256))
        }
      }
    })
  }

  /** The stored frame chunks of an AVI payload in stream order, or null
    * when the payload is not a well-formed AVI with a movi list.
    */
  private[ops] def aviFrames(item: MediaItem): Seq[Array[Byte]] = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.length < 24) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    val riffEnd = math.min(bytes.length.toLong, 8L + (bb.getInt(4) & 0xffffffffL))
    var off = 12L
    while (off + 8 <= riffEnd) {
      val id = fourcc(off.toInt)
      val size = bb.getInt(off.toInt + 4) & 0xffffffffL
      if (id == "LIST" && off + 12 <= riffEnd && fourcc(off.toInt + 8) == "movi") {
        val end = math.min(riffEnd, off + 8 + size)
        var f = off + 12
        val out = Seq.newBuilder[Array[Byte]]
        while (f + 8 <= end) {
          val fid = fourcc(f.toInt)
          val fsize = bb.getInt(f.toInt + 4) & 0xffffffffL
          if ((fid.endsWith("dc") || fid.endsWith("db")) &&
              f + 8 + fsize <= end)
            out += java.util.Arrays.copyOfRange(bytes, f.toInt + 8,
              (f + 8 + fsize).toInt)
          f += 8 + fsize + (fsize & 1)
        }
        return out.result()
      }
      off += 8 + size + (size & 1)
    }
    null
  }

  /** Deterministic UNCOMPRESSED AVI encoder — the full-fidelity video
    * fixture: a proper stream header pair (strh 'vids'/'DIB ', strf =
    * 40-byte BITMAPINFOHEADER with biCompression=0 BI_RGB, 24bpp) and
    * every frame a raw bottom-up BGR bitmap with 4-byte-aligned row
    * stride, pixel (x, y, frame) a pure function of the seed. BI_RGB
    * frames need NO codec, so [[decodeVideoFrame]] recovers these exact
    * pixels.
    */
  def encodeAviRgb(w: Int, h: Int, nFrames: Int, fps: Int,
      seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames >= 0 && fps > 0 && 1000000 % fps == 0,
      s"encodeAviRgb needs positive dims and fps dividing 1e6, got " +
        s"${w}x$h n=$nFrames fps=$fps")
    val stride = ((w * 3 + 3) / 4) * 4
    val frameSize = stride * h
    val strhSize = 56
    val strfSize = 40
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) =
      out.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); out.putInt(riffSize); cc("AVI ")
    cc("LIST"); out.putInt(hdrlSize); cc("hdrl")
    cc("avih"); out.putInt(56)
    val avih = new Array[Int](14)
    avih(0) = 1000000 / fps; avih(4) = nFrames; avih(6) = 1
    avih(7) = frameSize; avih(8) = w; avih(9) = h
    avih.foreach(out.putInt)
    cc("LIST"); out.putInt(strlSize); cc("strl")
    cc("strh"); out.putInt(strhSize)
    cc("vids"); cc("DIB ")
    out.putInt(0); out.putInt(0); out.putInt(0) // flags, prio+lang, initial
    out.putInt(1); out.putInt(fps) // dwScale, dwRate → fps
    out.putInt(0); out.putInt(nFrames) // start, length
    out.putInt(frameSize); out.putInt(-1) // bufSize, quality
    out.putInt(frameSize) // sampleSize
    out.putShort(0); out.putShort(0); out.putShort(w.toShort); out.putShort(h.toShort)
    cc("strf"); out.putInt(strfSize)
    out.putInt(40); out.putInt(w); out.putInt(h) // biSize, biWidth, biHeight
    out.putShort(1); out.putShort(24) // biPlanes, biBitCount
    out.putInt(0); out.putInt(frameSize) // biCompression=BI_RGB, biSizeImage
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    cc("LIST"); out.putInt(moviSize); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); out.putInt(frameSize)
      var y = h - 1 // bottom-up row order
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val v = pixelValue(x, y, f, seed)
          out.put((v & 0xff).toByte) // B
          out.put(((v >> 8) & 0xff).toByte) // G
          out.put(((v >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = w * 3
        while (pad < stride) { out.put(0.toByte); pad += 1 }
        y -= 1
      }
      f += 1
    }
    out.array()
  }

  /** The generator behind [[encodeAviRgb]]'s pixels: 24-bit RGB of
    * (x, y, frame, seed).
    */
  def pixelValue(x: Int, y: Int, frame: Int, seed: Long): Int =
    (((x * 31L + y * 17L + frame * 7001L + seed) * 2654435761L) >>> 24).toInt & 0xffffff

  /** REAL pixel decode of one stored frame — valid for uncompressed
    * (BI_RGB 24bpp) AVI payloads, where a frame IS a raw bottom-up BGR
    * bitmap: returns the row-major top-down 0xRRGGBB pixel array, or
    * null when the payload isn't such an AVI (compressed formats need
    * codec libraries — that boundary is the remaining honest stub).
    */
  def decodeVideoFrame(item: MediaItem, frameIndex: Int): Array[Int] = {
    val meta = decodeVideo(item)
    if (meta == null) return null
    val fmt = aviBitmapInfo(item)
    if (fmt == null) return null
    val (w, h, bpp, compression) = fmt
    if (bpp != 24 || compression != 0) return null
    val frames = aviFrames(item)
    if (frames == null || frameIndex < 0 || frameIndex >= frames.length)
      return null
    val stride = ((w * 3 + 3) / 4) * 4
    val data = frames(frameIndex)
    if (data.length < stride * h) return null
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // stored bottom-up
      var x = 0
      while (x < w) {
        val b = data(row + x * 3) & 0xff
        val g = data(row + x * 3 + 1) & 0xff
        val r = data(row + x * 3 + 2) & 0xff
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    out
  }

  /** (biWidth, biHeight, biBitCount, biCompression) from the first
    * video stream's BITMAPINFOHEADER (strf inside LIST strl inside LIST
    * hdrl), or null when absent.
    */
  private[ops] def aviBitmapInfo(item: MediaItem): (Int, Int, Int, Int) = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.length < 24) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    val riffEnd = math.min(bytes.length.toLong, 8L + (bb.getInt(4) & 0xffffffffL))
    def findStrf(start: Long, end: Long): Int = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off.toInt)
        val size = bb.getInt(off.toInt + 4) & 0xffffffffL
        if (id == "strf") return off.toInt + 8
        if (id == "LIST" && off + 12 <= end) {
          val lt = fourcc(off.toInt + 8)
          if (lt == "hdrl" || lt == "strl") {
            val inner = findStrf(off + 12, math.min(end, off + 8 + size))
            if (inner >= 0) return inner
          }
        }
        off += 8 + size + (size & 1)
      }
      -1
    }
    val strf = findStrf(12L, riffEnd)
    if (strf < 0 || strf + 20 > bytes.length) return null
    (bb.getInt(strf + 4), bb.getInt(strf + 8),
      bb.getShort(strf + 14).toInt, bb.getInt(strf + 16))
  }

  /** REAL payload-rewriting resize for uncompressed AVI video: clamp the
    * long side to `maxSide` (aspect floor-preserved, ≥1 — the same rule
    * as [[resizeMeta]]) and re-encode every frame by integer
    * nearest-neighbor sampling — target pixel (x, y) reads source pixel
    * (x·w÷w2, y·h÷h2), integer division, so the transform is exactly
    * replayable with no float scale anywhere. Already-small or
    * non-BI_RGB payloads pass through untouched (a codec-bearing impl
    * would transcode; this engine declines rather than guesses).
    * Partition-local map, like every codec step here.
    */
  def resizeVideo(items: Dataset[MediaItem], maxSide: Int): Dataset[MediaItem] = {
    require(maxSide > 0, s"resizeVideo needs maxSide >= 1, got $maxSide")
    implicit val enc = Encoders.product[MediaItem]
    items.map { item =>
      if (item.kind != "video") item
      else {
        val resized = resizeAviRgb(item, maxSide)
        if (resized == null) item else item.copy(payload = resized)
      }
    }
  }

  /** One payload's resize, or null when not applicable (not BI_RGB,
    * malformed, or already within `maxSide`).
    */
  private[ops] def resizeAviRgb(item: MediaItem, maxSide: Int): Array[Byte] = {
    val meta = decodeVideo(item)
    if (meta == null) return null
    val fmt = aviBitmapInfo(item)
    if (fmt == null || fmt._3 != 24 || fmt._4 != 0) return null
    val (w, h) = (meta.width, meta.height)
    val s = math.max(w, h)
    if (s <= maxSide) return null
    // the resizeMeta rule: scale both sides by maxSide/s, floor, >= 1 —
    // in Long, as in resizeDecodedPng (w*maxSide can pass 2^31)
    val w2 = math.max(1L, w.toLong * maxSide / s).toInt
    val h2 = math.max(1L, h.toLong * maxSide / s).toInt
    val frames = aviFrames(item)
    if (frames == null) return null
    val srcStride = ((w * 3 + 3) / 4) * 4
    val dstStride = ((w2 * 3 + 3) / 4) * 4
    val frameSize = dstStride * h2
    val out = new Array[Array[Byte]](frames.length)
    var f = 0
    while (f < frames.length) {
      val src = frames(f)
      if (src.length < srcStride * h) return null
      val dst = new Array[Byte](frameSize)
      var y = 0
      while (y < h2) {
        val sy = (y.toLong * h / h2).toInt
        var x = 0
        while (x < w2) {
          val sx = (x.toLong * w / w2).toInt
          // rows are stored bottom-up in both source and target
          val so = (h - 1 - sy) * srcStride + sx * 3
          val do_ = (h2 - 1 - y) * dstStride + x * 3
          dst(do_) = src(so); dst(do_ + 1) = src(so + 1); dst(do_ + 2) = src(so + 2)
          x += 1
        }
        y += 1
      }
      out(f) = dst
      f += 1
    }
    rebuildAviRgb(w2, h2, meta.sampleRate, out)
  }

  /** Assemble an uncompressed AVI from decoded-frame byte planes (the
    * writer half shared by [[encodeAviRgb]]'s fixture and
    * [[resizeAviRgb]]'s transform).
    */
  private def rebuildAviRgb(w: Int, h: Int, fps: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameSize = stride * h
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames.length * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) =
      out.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val usPerFrame = if (fps > 0) 1000000 / fps else 0
    cc("RIFF"); out.putInt(riffSize); cc("AVI ")
    cc("LIST"); out.putInt(hdrlSize); cc("hdrl")
    cc("avih"); out.putInt(56)
    val avih = new Array[Int](14)
    avih(0) = usPerFrame; avih(4) = frames.length; avih(6) = 1
    avih(7) = frameSize; avih(8) = w; avih(9) = h
    avih.foreach(out.putInt)
    cc("LIST"); out.putInt(strlSize); cc("strl")
    cc("strh"); out.putInt(56)
    cc("vids"); cc("DIB ")
    out.putInt(0); out.putInt(0); out.putInt(0)
    out.putInt(1); out.putInt(math.max(1, fps))
    out.putInt(0); out.putInt(frames.length)
    out.putInt(frameSize); out.putInt(-1)
    out.putInt(frameSize)
    out.putShort(0); out.putShort(0); out.putShort(w.toShort); out.putShort(h.toShort)
    cc("strf"); out.putInt(40)
    out.putInt(40); out.putInt(w); out.putInt(h)
    out.putShort(1); out.putShort(24)
    out.putInt(0); out.putInt(frameSize)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    cc("LIST"); out.putInt(moviSize); cc("movi")
    frames.foreach { fr => cc("00db"); out.putInt(frameSize); out.put(fr, 0, frameSize) }
    out.array()
  }

  /** Row-major top-down 0xRRGGBB pixel array of an image payload
    * decoded through `javax.imageio`, or null when the payload isn't a
    * decodable image — the image twin of [[decodeVideoFrame]].
    */
  def decodeImagePixels(item: MediaItem): Array[Int] = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = img.getRGB(x, y) & 0xffffff
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL payload-rewriting resize for image payloads — the image twin
    * of [[resizeVideo]]: clamp the long side to `maxSide` with the same
    * integer rule (w·maxSide÷s, floor, ≥1) and re-encode through
    * lossless PNG by integer nearest-neighbor sampling — target pixel
    * (x, y) reads source pixel (x·w÷w2, y·h÷h2), integer division, no
    * float scale anywhere, so the transform is exactly replayable.
    * Undecodable or already-small payloads pass through untouched.
    * Partition-local map, like every codec step here.
    */
  def resizeImage(items: Dataset[MediaItem], maxSide: Int): Dataset[MediaItem] = {
    require(maxSide > 0, s"resizeImage needs maxSide >= 1, got $maxSide")
    implicit val enc = Encoders.product[MediaItem]
    items.map { item =>
      if (item.kind != "image") item
      else {
        val resized = resizePng(item, maxSide)
        if (resized == null) item else item.copy(payload = resized)
      }
    }
  }

  /** One image payload's resize, or null when not applicable
    * (undecodable, carrying an alpha channel — the RGB re-encode would
    * silently destroy transparency, so decline rather than guess — or
    * already within `maxSide`).
    */
  private[ops] def resizePng(item: MediaItem, maxSide: Int): Array[Byte] = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    resizeDecodedPng(img, maxSide)
  }

  /** The resize over an ALREADY-DECODED raster (shared by [[resizePng]]
    * and the single-decode [[curateMedia]] path), or null when not
    * applicable.
    */
  private[ops] def resizeDecodedPng(img: java.awt.image.BufferedImage,
      maxSide: Int): Array[Byte] = {
    if (img.getColorModel.hasAlpha) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val s = math.max(w, h)
    if (s <= maxSide) return null
    // Long arithmetic: for a huge raster a large maxSide makes w*maxSide
    // overflow Int and the max(1, ...) clamp would silently collapse the
    // output to 1 px; the quotient itself always fits (≤ maxSide)
    val w2 = math.max(1L, w.toLong * maxSide / s).toInt
    val h2 = math.max(1L, h.toLong * maxSide / s).toInt
    val dst = new java.awt.image.BufferedImage(w2, h2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        dst.setRGB(x, y, img.getRGB((x.toLong * w / w2).toInt, sy))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** REAL payload-rewriting sample-rate reduction for audio payloads:
    * keep every `factor`-th PCM frame (all channels — plain decimation,
    * the integer-exact end of a resampler) and re-encode as PCM16
    * little-endian WAV at rate÷factor. The kept samples are the SOURCE
    * samples bit for bit, so the transform is exactly replayable.
    * Non-PCM16 or undecodable payloads pass through untouched.
    * Partition-local map, like every codec step here.
    */
  def decimateAudio(items: Dataset[MediaItem], factor: Int): Dataset[MediaItem] = {
    require(factor > 0, s"decimateAudio needs factor >= 1, got $factor")
    implicit val enc = Encoders.product[MediaItem]
    items.map { item =>
      if (item.kind != "audio") item
      else {
        val decimated = decimateWav(item, factor)
        if (decimated == null) item else item.copy(payload = decimated)
      }
    }
  }

  /** One audio payload's decimation, or null when not applicable
    * (undecodable, not PCM16, or empty).
    */
  private[ops] def decimateWav(item: MediaItem, factor: Int): Array[Byte] = {
    val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        // SIGNED PCM16 only: an unsigned-PCM container has the same
        // bits/frameSize but every sample offset by 32768 — reinterpret
        // as signed and the audio corrupts. Decline, don't guess.
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getFrameSize != ch * 2)
          return null
        val pcm = in.readAllBytes()
        val big = fmt.isBigEndian
        val nFrames = pcm.length / (2 * ch)
        if (nFrames == 0) return null
        val nKept = (nFrames + factor - 1) / factor
        val data = new Array[Byte](nKept * ch * 2)
        var k = 0
        var i = 0
        while (i < nFrames) {
          var c = 0
          while (c < ch) {
            val v = pcm16(pcm, (i * ch + c) * 2, big)
            data(k) = (v & 0xff).toByte
            data(k + 1) = ((v >> 8) & 0xff).toByte
            k += 2
            c += 1
          }
          i += factor
        }
        val sr2 = math.max(1, math.round(fmt.getSampleRate) / factor)
        val outFmt = new javax.sound.sampled.AudioFormat(sr2.toFloat, 16,
          ch, true, false)
        val stream = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), outFmt, nKept.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(stream,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        out.toByteArray
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
      case _: java.io.IOException => null
    }
  }

  final case class MediaCurationConfig(
      minSide: Int = 1, // image/video: decoded long side at least this
      maxSide: Int = Int.MaxValue, // ...and at most this
      resizeTo: Option[Int] = None, // payload-rewriting clamp afterwards
      minAudioFrames: Int = 0,
      maxAudioFrames: Int = Int.MaxValue,
      dropUndecodable: Boolean = false) // drop items only the stub fakes

  /** One-call media curation — the multimodal twin of
    * `TextPipeline.curate`: gate every item on its REAL decoded
    * properties (raster dims for images, container dims for video, PCM
    * frame count for audio — never the stub's pseudo-metadata),
    * optionally drop whatever no real decoder accepts, then rewrite
    * surviving payloads to the target size through the lossless
    * PNG / uncompressed-AVI resize paths. Every stage is
    * partition-local (decode happens where the bytes already are —
    * at 100 TB the payload column never shuffles).
    */
  def curateMedia(items: Dataset[MediaItem],
      cfg: MediaCurationConfig): Dataset[MediaItem] = {
    require(cfg.minSide >= 1 && cfg.maxSide >= cfg.minSide,
      s"bad side gate ${cfg.minSide}..${cfg.maxSide}")
    implicit val enc = Encoders.product[MediaItem]
    // ONE flatMap: each payload decodes exactly once and the decoded
    // raster feeds both the gate and the resize (images are where the
    // decode dominates; video gates on the cheap header parse and only
    // the survivors pay the frame walk)
    items.mapPartitions(_.flatMap { item =>
      item.kind match {
        case "image" =>
          val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
          val img =
            if (bytes.isEmpty) null
            else try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) {
            if (cfg.dropUndecodable) None else Some(item)
          } else {
            val s = math.max(img.getWidth, img.getHeight)
            if (s < cfg.minSide || s > cfg.maxSide) None
            else cfg.resizeTo match {
              case Some(t) =>
                val resized = resizeDecodedPng(img, t)
                Some(if (resized == null) item
                else item.copy(payload = resized))
              case None => Some(item)
            }
          }
        case "video" =>
          val m = decodeVideo(item)
          if (m == null) {
            if (cfg.dropUndecodable) None else Some(item)
          } else {
            val s = math.max(m.width, m.height)
            if (s < cfg.minSide || s > cfg.maxSide) None
            else cfg.resizeTo match {
              case Some(t) =>
                val resized = resizeAviRgb(item, t)
                Some(if (resized == null) item
                else item.copy(payload = resized))
              case None => Some(item)
            }
          }
        case "audio" =>
          val m = decodeAudio(item)
          if (m == null) {
            if (cfg.dropUndecodable) None else Some(item)
          } else if (m.nFrames < cfg.minAudioFrames ||
              m.nFrames > cfg.maxAudioFrames) None
          else Some(item)
        case _ => if (cfg.dropUndecodable) None else Some(item)
      }
    })
  }

  final case class ChannelStats(media_id: Long, n_px: Long, sum_r: Long,
      sum_g: Long, sum_b: Long)

  /** REAL image feature extraction — the exact-integer core of
    * mean-channel features (the first block of any vision front-end):
    * per-channel pixel sums + pixel count from the ACTUAL decoded
    * raster. Only decodable image payloads emit a row (1→0/1
    * partition-local flatMap); undecodable or non-image items are the
    * caller's stub path. Integer sums, so the oracle replays the pixel
    * generator arithmetic exactly.
    */
  def channelStats(items: Dataset[MediaItem]): Dataset[ChannelStats] = {
    implicit val enc = Encoders.product[ChannelStats]
    items.mapPartitions(_.flatMap { item =>
      if (item.kind != "image") None
      else {
        val px = decodeImagePixels(item)
        if (px == null) None
        else {
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i < px.length) {
            r += (px(i) >> 16) & 0xff
            g += (px(i) >> 8) & 0xff
            b += px(i) & 0xff
            i += 1
          }
          Some(ChannelStats(item.media_id, px.length.toLong, r, g, b))
        }
      }
    })
  }

  /** Resize stub: metadata-only transform (a real impl rewrites payload
    * bytes; the pipeline contract — pure function of (payload, target
    * size) — is identical).
    */
  def resizeMeta(meta: Dataset[DecodedMeta], maxSide: Int): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    meta.map { m =>
      val s = math.max(m.width, m.height)
      if (s <= maxSide) m
      else {
        val scale = maxSide.toDouble / s
        m.copy(width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt))
      }
    }
  }

  final case class SampleWindow(media_id: Long, window_index: Int,
      start_byte: Int, payload: Array[Byte])

  /** Overlapping sample windows (the STFT / feature-frame shape for
    * audio): a window of `windowBytes` every `hopBytes`, last windows
    * truncated at the payload end. Partition-local 1→N explode like
    * [[sampleFrames]], but windows OVERLAP when hop < window — each byte
    * lands in up to ceil(window/hop) rows, which is the fan-out a real
    * fbank/wav2vec front-end produces. Empty payloads emit no rows.
    */
  def windowSamples(items: Dataset[MediaItem], windowBytes: Int,
      hopBytes: Int): Dataset[SampleWindow] = {
    require(windowBytes > 0, s"windowSamples needs windowBytes >= 1, got $windowBytes")
    require(hopBytes > 0, s"windowSamples needs hopBytes >= 1, got $hopBytes")
    implicit val enc = Encoders.product[SampleWindow]
    items.mapPartitions(_.flatMap { item =>
      val bytes = Option(item.payload).getOrElse(Array.emptyByteArray)
      (0 until bytes.length by hopBytes).iterator.zipWithIndex.map {
        case (start, idx) =>
          SampleWindow(item.media_id, idx, start,
            bytes.slice(start, math.min(bytes.length, start + windowBytes)))
      }
    })
  }

  final case class FeatureSummary(media_id: Long, top_dim: Long, nnz: Long)

  /** Collapse an extracted embedding to its dominant dimension (ties →
    * lowest index) and nonzero-dimension count — the integer shape the
    * oracle can pin while the float vector itself feeds ANN downstream.
    */
  def featureSummary(features: Dataset[MediaFeature]): Dataset[FeatureSummary] = {
    implicit val enc = Encoders.product[FeatureSummary]
    features.map { f =>
      var top = 0
      var i = 1
      while (i < f.embedding.length) {
        if (f.embedding(i) > f.embedding(top)) top = i
        i += 1
      }
      FeatureSummary(f.media_id, top.toLong,
        f.embedding.count(_ != 0.0f).toLong)
    }
  }
}
