package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    val rows = Seq(
      (1L, "image", "img-payload-one".getBytes("UTF-8")),
      (2L, "audio", "audio-bytes".getBytes("UTF-8")),
      (3L, "video", ("frame" * 400).getBytes("UTF-8")), // 2000 bytes
      (4L, "image", Array.emptyByteArray))
    Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
  }

  test("decodeMeta: schema, determinism, null/empty safety") {
    val meta = Multimodal.decodeMeta(corpus()).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta.size == 4)
    assert(meta(1L).width >= 1 && meta(1L).width <= 640)
    assert(meta(1L).height >= 1 && meta(1L).height <= 480)
    assert(meta(2L).channels == 2 && meta(2L).sampleRate == 16000)
    assert(meta(3L).nFrames >= 1)
    assert(meta(4L).sizeBytes == 0L)
    // deterministic across runs
    val again = Multimodal.decodeMeta(corpus()).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta == again)
  }

  test("extractFeatures: fixed dims, normalized histogram") {
    val feats = Multimodal.extractFeatures(corpus(), dims = 16).collect()
      .map(f => f.media_id -> f.embedding).toMap
    assert(feats.values.forall(_.length == 16))
    val s = feats(1L).sum
    assert(math.abs(s - 1.0f) < 1e-5, s"histogram sums to 1, got $s")
    assert(feats(4L).forall(_ == 0.0f), "empty payload -> zero vector")
  }

  test("sampleFrames: only video, stride respected, windows correct") {
    val frames = Multimodal.sampleFrames(corpus(), stride = 3,
      frameBytes = 256).collect()
    assert(frames.forall(_.media_id == 3L))
    val idx = frames.map(_.frameIndex).sorted.toSeq
    assert(idx == (0 until (2000 / 256) by 3).toSeq)
    assert(frames.forall(_.payload.length <= 256))
  }

  test("resizeMeta caps the long side and keeps aspect") {
    val meta = Seq(DecodedMeta(1L, "image", 640, 480, 3, 0, 1, 10L),
      DecodedMeta(2L, "image", 100, 50, 3, 0, 1, 10L)).toDS()
    val resized = Multimodal.resizeMeta(meta, 320).collect()
      .map(m => m.media_id -> m).toMap
    assert(resized(1L).width == 320 && resized(1L).height == 240)
    assert(resized(2L).width == 100 && resized(2L).height == 50, "no upscale")
  }

  test("windowSamples: overlapping hop < window covers every byte in " +
      "ceil(window/hop) rows; truncated tail; empty payload emits none") {
    val ws = Multimodal.windowSamples(corpus(), windowBytes = 400,
      hopBytes = 160).collect()
    // empty payload (id 4) emits nothing
    assert(!ws.exists(_.media_id == 4L))
    // id 3 is 2000 bytes: starts at 0,160,...,1920 → 13 windows
    val v = ws.filter(_.media_id == 3L).sortBy(_.window_index)
    assert(v.length == 13)
    assert(v.map(_.start_byte).toSeq == (0 until 2000 by 160).toSeq)
    // full windows are 400 bytes; the last two truncate at the end
    assert(v.dropRight(2).forall(_.payload.length == 400))
    assert(v(11).payload.length == 2000 - 1760)
    assert(v(12).payload.length == 2000 - 1920)
    // reassembling hop-strided prefixes reproduces the payload bytes
    val rebuilt = v.flatMap(_.payload.take(160)).toSeq ++
      v.last.payload.drop(160).toSeq
    assert(rebuilt == ("frame" * 400).getBytes("UTF-8").toSeq)
    // short payloads still produce their partial head window
    val a = ws.filter(_.media_id == 2L)
    assert(a.length == 1 && a.head.payload.length == "audio-bytes".length)
  }

  test("fromFiles: real on-disk files ingest with sniffed kinds, stable " +
      "ids, and byte-exact payload round-trips") {
    val dir = "src/test/resources/media"
    val items = Multimodal.fromFiles(spark, dir).collect()
      .map(i => i.media_id -> i).toMap
    assert(items.size == 8, s"fixture dir should yield 8 items, got " +
      s"${items.keySet.toSeq.sorted}")
    // ids parsed from the basename digits; kinds from magic bytes —
    // including the PNG hidden behind a .dat extension
    assert(items(4001L).kind == "image", "magic sniff must beat extension")
    assert(items(2002L).kind == "audio" && items(3001L).kind == "video")
    // payloads are the exact on-disk bytes: the deterministic encoders
    // regenerate them bit-for-bit
    assert(java.util.Arrays.equals(items(1001L).payload,
      Multimodal.encodePng(37, 23, 1001L)))
    assert(java.util.Arrays.equals(items(3002L).payload,
      Multimodal.encodeAvi(12, 10, 4, 20, 3002L)))
    // and the decoded PCM of the ingested WAV matches the generator's
    // sample function (full codec round-trip through the file system)
    val pcm = Multimodal.decodeAudioSamples(items(2001L))
    assert(pcm.length == 400)
    assert(pcm.zipWithIndex.forall { case (v, i) =>
      v == (((i.toLong * 2654435761L + 2001L) >>> 16) & 0xffffL).toShort
    })
    // glob filter prunes at the source (partition pruning, not a scan)
    val pngOnly = Multimodal.fromFiles(spark, dir, glob = "*.png").collect()
    assert(pngOnly.map(_.media_id).sorted.toSeq == Seq(1001L, 1002L))
    // id fallback for digit-less names: stable non-negative hash
    assert(Multimodal.mediaIdFor("/x/cover-art.png") ==
      Multimodal.mediaIdFor("/y/cover-art.jpg"))
    assert(Multimodal.mediaIdFor("/x/cover-art.png") >= 0L)
  }

  test("real image decode: generated PNGs round-trip bit-exactly " +
      "through javax.imageio; non-image bytes fall back to the stub") {
    // pixel-level losslessness of the encode/decode pair itself
    val png = Multimodal.encodePng(37, 23, seed = 42L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 37 && img.getHeight == 23)
    assert(img.getRaster.getNumBands == 3)
    for (y <- 0 until 23; x <- 0 until 37) {
      val want = (x * 31 + y * 17 + 42L).toInt & 0xffffff
      assert((img.getRGB(x, y) & 0xffffff) == want, s"pixel ($x,$y)")
    }
    // the Dataset decode path reports the real raster dims for PNGs...
    val rows = Seq(
      (50L, "image", Multimodal.encodePng(64, 48, 7L)),
      (51L, "image", Multimodal.encodePng(1, 1, 9L)),
      (52L, "image", "not-a-png".getBytes("UTF-8")), // stub fallback
      (53L, "audio", Multimodal.encodePng(8, 8, 1L))) // kind wins: stub
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(50L).width == 64 && meta(50L).height == 48 &&
      meta(50L).channels == 3)
    assert(meta(51L).width == 1 && meta(51L).height == 1)
    // ...while undecodable bytes and non-image kinds keep stub semantics
    assert(meta(52L).channels == 3 && meta(52L).width <= 640)
    assert(meta(53L).channels == 2 && meta(53L).sampleRate == 16000)
  }

  test("real audio decode: generated WAVs round-trip bit-exactly " +
      "through javax.sound.sampled; non-audio bytes fall back to the stub") {
    // sample-level losslessness of the encode/decode pair itself
    val wav = Multimodal.encodeWav(nSamples = 101, sampleRate = 22050,
      channels = 2, seed = 42L)
    val item = MediaItem(1L, "audio", wav)
    val samples = Multimodal.decodeAudioSamples(item)
    assert(samples.length == 101 * 2)
    for (i <- 0 until 101; c <- 0 until 2) {
      val want = (((i.toLong * 2654435761L + c * 40503L + 42L) >>> 16) & 0xffffL).toShort
      assert(samples(i * 2 + c) == want, s"sample ($i,$c)")
    }
    // the Dataset decode path reports the real container format for WAVs...
    val rows = Seq(
      (60L, "audio", Multimodal.encodeWav(300, 16000, 1, 7L)),
      (61L, "audio", Multimodal.encodeWav(1, 8000, 2, 9L)),
      (62L, "audio", "not-a-wav".getBytes("UTF-8")), // stub fallback
      (63L, "video", Multimodal.encodeWav(10, 44100, 1, 1L))) // kind wins: stub
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(60L).sampleRate == 16000 && meta(60L).channels == 1 &&
      meta(60L).nFrames == 300 && meta(60L).width == 0)
    assert(meta(61L).sampleRate == 8000 && meta(61L).channels == 2 &&
      meta(61L).nFrames == 1)
    // ...while undecodable bytes and non-audio kinds keep stub semantics
    assert(meta(62L).channels == 2 && meta(62L).sampleRate == 16000 &&
      meta(62L).width > 0)
    assert(meta(63L).kind == "video" && meta(63L).sampleRate == 0)
  }

  test("real video container decode: generated AVIs round-trip exactly " +
      "through the RIFF parser; non-AVI bytes fall back to the stub") {
    // container-level losslessness of the encode/decode pair
    val avi = Multimodal.encodeAvi(w = 320, h = 240, nFrames = 123,
      fps = 25, seed = 42L)
    val meta0 = Multimodal.decodeVideo(MediaItem(1L, "video", avi))
    assert(meta0.width == 320 && meta0.height == 240 &&
      meta0.nFrames == 123 && meta0.sampleRate == 25)
    // zero-frame AVI is well-formed too
    val empty = Multimodal.decodeVideo(MediaItem(2L, "video",
      Multimodal.encodeAvi(16, 16, 0, 50, 7L)))
    assert(empty.nFrames == 0 && empty.width == 16)
    // the Dataset decode path reports the real container header...
    val rows = Seq(
      (70L, "video", Multimodal.encodeAvi(64, 48, 9, 10, 3L)),
      (71L, "video", "RIFFnope".getBytes("UTF-8")), // stub fallback
      (72L, "image", Multimodal.encodeAvi(8, 8, 1, 25, 1L))) // kind wins
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(70L).width == 64 && meta(70L).height == 48 &&
      meta(70L).nFrames == 9 && meta(70L).sampleRate == 10)
    // ...while undecodable bytes and non-video kinds keep stub semantics
    assert(meta(71L).sampleRate == 0 && meta(71L).nFrames >= 1 &&
      meta(71L).width <= 640)
    assert(meta(72L).kind == "image" && meta(72L).channels == 3)
  }

  test("demuxFrames: stored AVI frame chunks round-trip bit-exactly; " +
      "stride filters; non-AVI video falls back to the byte-window stub") {
    val avi = Multimodal.encodeAvi(w = 8, h = 8, nFrames = 7, fps = 25,
      seed = 5L, frameBytes = 16)
    val rows = Seq(
      (80L, "video", avi),
      (81L, "video", ("x" * 800).getBytes("UTF-8")), // stub: 3 windows
      (82L, "audio", avi)) // kind filter: no rows
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val frames = Multimodal.demuxFrames(media, stride = 2).collect()
      .groupBy(_.media_id)
    // every 2nd of 7 frames: indexes 0,2,4,6 — with the EXACT stored bytes
    assert(frames(80L).map(_.frameIndex).sorted.toSeq == Seq(0, 2, 4, 6))
    frames(80L).foreach { f =>
      val want = Array.tabulate[Byte](16)(b =>
        (((f.frameIndex.toLong * 31 + b) * 2654435761L + 5L) >>> 24).toByte)
      assert(java.util.Arrays.equals(f.payload, want),
        s"frame ${f.frameIndex} bytes must equal the generator's")
    }
    // stub fallback: 800 bytes / 256 → 3 windows at stride 2 → index 0 and 2
    assert(frames(81L).map(_.frameIndex).sorted.toSeq == Seq(0, 2))
    assert(!frames.contains(82L), "non-video kinds emit nothing")
  }

  test("real pixel decode for uncompressed (BI_RGB) AVI frames: every " +
      "pixel of every frame round-trips; format guards return null") {
    // w=13 → row stride pads 39 → 40 bytes: the alignment edge
    val avi = Multimodal.encodeAviRgb(w = 13, h = 9, nFrames = 3, fps = 25,
      seed = 11L)
    val item = MediaItem(1L, "video", avi)
    val meta = Multimodal.decodeVideo(item)
    assert(meta.width == 13 && meta.height == 9 && meta.nFrames == 3 &&
      meta.sampleRate == 25)
    for (f <- 0 until 3) {
      val px = Multimodal.decodeVideoFrame(item, f)
      assert(px.length == 13 * 9)
      for (y <- 0 until 9; x <- 0 until 13)
        assert(px(y * 13 + x) == Multimodal.pixelValue(x, y, f, 11L),
          s"pixel ($x,$y) frame $f")
    }
    // guards: out-of-range frame; header-only AVI carries no strf, so no
    // pixel claim is made for it
    assert(Multimodal.decodeVideoFrame(item, 3) == null)
    val minimal = MediaItem(2L, "video", Multimodal.encodeAvi(8, 8, 2, 25, 1L))
    assert(Multimodal.decodeVideo(minimal) != null, "container metadata ok")
    assert(Multimodal.decodeVideoFrame(minimal, 0) == null,
      "no BITMAPINFOHEADER -> pixel decode declines")
  }

  test("real video resize: frames re-encoded by integer nearest-neighbor; " +
      "pass-through for small, non-RGB, and non-video items") {
    val avi = Multimodal.encodeAviRgb(w = 20, h = 10, nFrames = 3, fps = 25,
      seed = 9L)
    val rows = Seq(
      (90L, "video", avi),
      (91L, "video", Multimodal.encodeAvi(8, 8, 2, 25, 1L)), // no strf
      (92L, "audio", avi))
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val resized = Multimodal.resizeVideo(media, maxSide = 5).collect()
      .map(m => m.media_id -> m).toMap
    val m90 = Multimodal.decodeVideo(resized(90L))
    assert(m90.width == 5 && m90.height == 2 && m90.nFrames == 3 &&
      m90.sampleRate == 25, s"$m90")
    // every target pixel is the exact source pixel at (x*w/w2, y*h/h2)
    for (f <- 0 until 3) {
      val px = Multimodal.decodeVideoFrame(resized(90L), f)
      for (y <- 0 until 2; x <- 0 until 5)
        assert(px(y * 5 + x) ==
          Multimodal.pixelValue(x * 20 / 5, y * 10 / 2, f, 9L),
          s"pixel ($x,$y) frame $f")
    }
    // header-only AVI (no BITMAPINFOHEADER) and non-video kinds pass
    // through byte-identical; an already-small payload would too
    assert(java.util.Arrays.equals(resized(91L).payload,
      rows(1)._3), "non-RGB passes through")
    assert(java.util.Arrays.equals(resized(92L).payload, avi),
      "non-video kind untouched")
  }

  test("real image resize: lossless PNG re-encode by integer " +
      "nearest-neighbor; pass-through for small, undecodable, non-image") {
    val png = Multimodal.encodePng(20, 10, seed = 9L)
    val rows = Seq(
      (80L, "image", png),
      (81L, "image", Multimodal.encodePng(4, 3, 2L)), // already small
      (82L, "image", "not-a-png".getBytes("UTF-8")),
      (83L, "video", png))
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val resized = Multimodal.resizeImage(media, maxSide = 5).collect()
      .map(m => m.media_id -> m).toMap
    val m80 = Multimodal.decodeImage(resized(80L))
    assert(m80.width == 5 && m80.height == 2, s"$m80")
    // every target pixel is the exact source pixel at (x*w/w2, y*h/h2)
    val px = Multimodal.decodeImagePixels(resized(80L))
    for (y <- 0 until 2; x <- 0 until 5)
      assert(px(y * 5 + x) ==
        ((x * 20 / 5 * 31 + y * 10 / 2 * 17 + 9L).toInt & 0xffffff),
        s"pixel ($x,$y)")
    assert(java.util.Arrays.equals(resized(81L).payload, rows(1)._3),
      "already-small passes through")
    assert(java.util.Arrays.equals(resized(82L).payload, rows(2)._3),
      "undecodable passes through")
    assert(java.util.Arrays.equals(resized(83L).payload, png),
      "non-image kind untouched")
  }

  test("real audio decimation: kept frames are the source samples bit " +
      "for bit, rate divided; pass-through for non-PCM and non-audio") {
    val wav = Multimodal.encodeWav(nSamples = 10, sampleRate = 16000,
      channels = 2, seed = 5L)
    val rows = Seq(
      (85L, "audio", wav),
      (86L, "audio", "not-a-wav".getBytes("UTF-8")),
      (87L, "video", wav))
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val out = Multimodal.decimateAudio(media, factor = 4).collect()
      .map(m => m.media_id -> m).toMap
    val meta = Multimodal.decodeAudio(out(85L))
    assert(meta.sampleRate == 4000 && meta.channels == 2 &&
      meta.nFrames == 3, s"$meta") // frames 0, 4, 8
    val got = Multimodal.decodeAudioSamples(out(85L))
    val want = Seq(0, 4, 8).flatMap { i =>
      Seq(0, 1).map { c =>
        (((i.toLong * 2654435761L + c * 40503L + 5L) >>> 16) & 0xffffL).toShort
      }
    }
    assert(got.toSeq == want, s"${got.toSeq} vs $want")
    assert(java.util.Arrays.equals(out(86L).payload, rows(1)._3),
      "undecodable passes through")
    assert(java.util.Arrays.equals(out(87L).payload, wav),
      "non-audio kind untouched")
  }

  test("channelStats: per-channel sums from the decoded raster; " +
      "undecodable and non-image items emit nothing") {
    val rows = Seq(
      (70L, "image", Multimodal.encodePng(3, 2, seed = 11L)),
      (71L, "image", "junk".getBytes("UTF-8")),
      (72L, "video", Multimodal.encodePng(3, 2, 11L)))
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val got = Multimodal.channelStats(media).collect()
    assert(got.map(_.media_id).toSeq == Seq(70L))
    var (r, g, b) = (0L, 0L, 0L)
    for (y <- 0 until 2; x <- 0 until 3) {
      val v = (x * 31 + y * 17 + 11L).toInt & 0xffffff
      r += (v >> 16) & 0xff; g += (v >> 8) & 0xff; b += v & 0xff
    }
    val cs = got.head
    assert(cs.n_px == 6L && cs.sum_r == r && cs.sum_g == g &&
      cs.sum_b == b, cs)
  }

  test("curateMedia: gates on REAL decoded properties, drops what only " +
      "the stub fakes, resizes survivors payload-level") {
    val rows = Seq(
      (1L, "image", Multimodal.encodePng(40, 20, 1L)), // big → resized
      (2L, "image", Multimodal.encodePng(2, 2, 2L)), // below minSide
      (3L, "image", "junk".getBytes("UTF-8")), // undecodable
      (4L, "audio", Multimodal.encodeWav(100, 16000, 1, 4L)), // kept
      (5L, "audio", Multimodal.encodeWav(3, 16000, 1, 5L)), // too short
      (6L, "video", Multimodal.encodeAviRgb(30, 10, 2, 25, 6L))) // resized
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val cfg = Multimodal.MediaCurationConfig(minSide = 5,
      resizeTo = Some(10), minAudioFrames = 50, dropUndecodable = true)
    val out = Multimodal.curateMedia(media, cfg).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.keySet == Set(1L, 4L, 6L), out.keySet)
    val img = Multimodal.decodeImage(out(1L))
    assert(img.width == 10 && img.height == 5, s"$img")
    val vid = Multimodal.decodeVideo(out(6L))
    assert(vid.width == 10 && vid.height == 3, s"$vid")
    // without the drop flag, undecodables ride through untouched
    val lax = Multimodal.curateMedia(media,
      cfg.copy(dropUndecodable = false)).collect().map(_.media_id).toSet
    assert(lax == Set(1L, 3L, 4L, 6L), lax)
  }

  test("featureSummary: dominant dimension with lowest-index ties, " +
      "nonzero count") {
    // craft payloads with known byte histograms mod 4
    val rows = Seq(
      // bytes 'a'(97%4=1) x3, 'b'(98%4=2) x1 → top_dim 1, nnz 2
      (10L, "image", "aaab".getBytes("UTF-8")),
      // tie: 'a' x2, 'b' x2 → lowest dim wins → 1
      (11L, "image", "abab".getBytes("UTF-8")),
      (12L, "image", Array.emptyByteArray)) // zero vector → top 0, nnz 0
    val media = Multimodal.asMedia(rows.toDF("id", "kind", "payload"),
      "id", $"kind", $"payload")
    val got = Multimodal.featureSummary(
      Multimodal.extractFeatures(media, dims = 4)).collect()
      .map(f => f.media_id -> ((f.top_dim, f.nnz))).toMap
    assert(got(10L) == ((1L, 2L)))
    assert(got(11L) == ((1L, 2L)))
    assert(got(12L) == ((0L, 0L)))
  }
}
