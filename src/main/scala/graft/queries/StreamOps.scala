package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.streaming.EventStreams

/** Batch-mode gate entries for the streaming/incremental operators (the
  * identical logical plans run under readStream — see
  * graft.streaming.EventStreams and StreamingSpec) and the multimodal
  * metadata path.
  */
object StreamOps {

  type Q = (SparkSession, String) => DataFrame

  /** Committed media-fixture directory, resolved independently of the
    * launcher's cwd: env override first, then a walk up from cwd (the
    * driver may run sbt from the repo root or a parent). The returned
    * path is absolute so Spark's binaryFile source never re-resolves it
    * against a different working directory.
    */
  private[queries] def mediaFixtureDir: String =
    sys.env.get("SPARK_GRAFT_MEDIA_DIR").getOrElse {
      val rel = java.nio.file.Paths.get("src", "test", "resources", "media")
      Iterator.iterate(java.nio.file.Paths.get("").toAbsolutePath)(_.getParent)
        .takeWhile(_ != null).take(6)
        .map(_.resolve(rel))
        .find(java.nio.file.Files.isDirectory(_))
        .map(_.toString)
        .getOrElse(rel.toAbsolutePath.toString)
    }

  val queries: Map[String, Q] = Map(
    // T1-analog: tumbling event-time window aggregate (runs identically
    // under readStream with a watermark)
    "st1_window_agg" -> ((s, d) => EventStreams.windowedCounts(events(s, d))),

    // hopping windows (10 min duration, 5 min slide): each event counts
    // in 2 overlapping windows; Expand runs before partial aggregation
    "st8_hopping" -> ((s, d) =>
      EventStreams.windowedCountsHopping(events(s, d))),

    // per-window p50/p95 from a mergeable KLL sketch — the percentile
    // dashboard. Exact regime: per-hour distinct value-cents ≪ k=1024
    // at gate scale, so err = 0 and quantiles match quantile_disc;
    // the same shape runs as an append-mode STREAM with the sketch as
    // watermark-bounded state (StreamingSpec)
    "st9_window_quantile" -> ((s, d) =>
      EventStreams.windowedQuantiles(events(s, d))),

    // sessionization (gap = 30 min) — lag + running-sum islands
    "st2_sessionize" -> ((s, d) =>
      EventStreams.sessionize(events(s, d), gapUs = 1800L * 1000000L)),

    // purchase attribution: per purchase, every same-user event inside
    // the 30 min window after it — the time-RANGE-bounded equi-join
    // whose streaming twin is the watermarked stream-stream join
    // (StreamingSpec asserts batch==stream parity on this exact plan)
    "st10_attribution" -> ((s, d) =>
      EventStreams.attributionJoin(events(s, d))),

    // trailing 7-day per-user rolling sum: a RANGE window frame over
    // event-time micros (peers at the same instant aggregate
    // identically — the frame a ROWS window gets wrong on ties)
    "w9_rolling_range" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-604800000000L, 0L)
      events(s, d).select($"event_id", $"user_id",
        unix_micros($"ts").as("ts_us"),
        round($"value" * 100).cast("long").as("cents"))
        .select($"event_id", $"user_id", $"ts_us",
          sum($"cents").over(w).as("roll_cents"))
    }),

    // gaps-and-islands: maximal consecutive-day activity runs per user
    "st3_gaps_islands" -> ((s, d) =>
      graft.ops.EventAnalytics.activityIslands(events(s, d))),

    // ordered conversion funnel (view → click → purchase), strictly
    // sequential timestamps, one row of per-stage user counts
    "st4_funnel" -> ((s, d) =>
      graft.ops.EventAnalytics.funnel(events(s, d),
        Seq("view", "click", "purchase"))),

    // conversion funnel with a 12 h completion horizon (chain anchored at
    // ANY view; the stateful stream twin is funnelWindowedStateful)
    "st7_funnel_windowed" -> ((s, d) =>
      graft.ops.EventAnalytics.funnelWindowed(events(s, d),
        Seq("view", "click", "purchase"), horizonUs = 12L * 3600L * 1000000L)),

    // weekly cohort retention (cohort = first active week)
    "st5_retention" -> ((s, d) =>
      graft.ops.EventAnalytics.weeklyRetention(events(s, d))),

    // linear-interpolation resample: gap days take the straight line
    // between their surrounding observations, exact integer floor
    // arithmetic — the numeric twin of st6's LOCF
    "st11_interpolate" -> ((s, d) =>
      graft.ops.EventAnalytics.interpolateDaily(events(s, d))),

    // daily grid resample + LOCF forward-fill (regular series from an
    // irregular event log)
    "st6_forward_fill" -> ((s, d) =>
      graft.ops.EventAnalytics.forwardFillDaily(events(s, d))),

    // per-window heavy hitters: the space-saving sketch under a tumbling
    // event-time window (runs identically under readStream, where the
    // sketch buffer is the state-store payload and the watermark drives
    // append-mode emit — StreamingSpec). Exact regime here: max distinct
    // users per hour window is ~170 at sf0.1, well under capacity 512
    "a9_windowed_topk" -> ((s, d) => EventStreams.windowedTopK(events(s, d))),

    // per-window distinct users (exact batch form; the streaming twin
    // runs the same plan with HLL++ sketch state — StreamingSpec)
    "a11_windowed_distinct" -> ((s, d) =>
      EventStreams.windowedDistinct(events(s, d))),

    // multimodal metadata: documents as binary payloads with arithmetic
    // pseudo-decode (the mapPartitions codec path is spec-tested; this
    // entry checks the schema/derivation plumbing against the oracle)
    "mm1_media_meta" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      documents(s, d).select(
        $"doc_id",
        octet_length($"text".cast("binary")).as("n_bytes"),
        (pmod(h, lit(640L)) + 1L).as("fake_width"),
        // h < 1e9+7 so double division stays exact; floor == integer div
        (pmod(floor(h / 640.0).cast("long"), lit(480L)) + 1L).as("fake_height"))
    }),

    // multimodal frame sampling: the 1→N partition-local explode through
    // the real Dataset[MediaItem] plumbing (stub demuxer: fixed-size byte
    // windows), every 4th frame kept
    "mm2_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = graft.ops.Multimodal.asMedia(
        documents(s, d), "doc_id", lit("video"), $"text".cast("binary"))
      graft.ops.Multimodal.sampleFrames(media, stride = 4)
        .select($"media_id", $"frameIndex".cast("long").as("frame_index"),
          octet_length($"payload").cast("long").as("frame_bytes"))
    }),

    // multimodal resize: the typed Dataset[DecodedMeta] map through the
    // real resizeMeta transform (aspect-preserving clamp to a 256 max
    // side, floor + ≥1 guard), over arithmetic pseudo-decoded dimensions
    // so the oracle can replay the exact IEEE sequence
    "mm3_resize" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      implicit val enc =
        org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.DecodedMeta]
      val meta = documents(s, d).select(
        $"doc_id".as("media_id"),
        lit("image").as("kind"),
        (pmod(h, lit(640L)) + 1L).cast("int").as("width"),
        (pmod(floor(h / 640.0).cast("long"), lit(480L)) + 1L).cast("int")
          .as("height"),
        lit(3).as("channels"), lit(0).as("sampleRate"), lit(1).as("nFrames"),
        octet_length($"text".cast("binary")).cast("long").as("sizeBytes"))
        .as[graft.ops.Multimodal.DecodedMeta]
      graft.ops.Multimodal.resizeMeta(meta, maxSide = 256)
        .select($"media_id", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"))
    }),

    // multimodal audio windowing: OVERLAPPING sample windows (400-byte
    // window, 160-byte hop — the fbank/wav2vec front-end fan-out where
    // each byte lands in up to 3 rows), partition-local 1→N explode
    "mm4_audio_windows" -> ((s, d) => {
      import s.implicits._
      val media = graft.ops.Multimodal.asMedia(
        documents(s, d), "doc_id", lit("audio"), $"text".cast("binary"))
      graft.ops.Multimodal.windowSamples(media,
        windowBytes = 400, hopBytes = 160)
        .select($"media_id", $"window_index".cast("long").as("window_index"),
          $"start_byte".cast("long").as("start_byte"),
          octet_length($"payload").cast("long").as("window_bytes"))
    }),

    // REAL image decode: render a PNG per document in the executor
    // (dims derived from the text, the payload-pointer-dereference
    // stand-in), then decode it back through javax.imageio — the
    // decoded raster dims and band count must round-trip exactly
    "mm6_image_decode" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(h, lit(64L)) + 1L).cast("int").as("w"),
        (pmod(floor(h / 64.0).cast("long"), lit(48L)) + 1L).cast("int")
          .as("h")).as[(Long, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, w, hh) =>
        graft.ops.Multimodal.MediaItem(id, "image",
          graft.ops.Multimodal.encodePng(w, hh, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.decodeMeta(media)
        .select($"media_id", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"channels".cast("long").as("channels"))
    }),

    // REAL audio decode: synthesize a PCM16 WAV per document in the
    // executor (rate/channels/length derived from the text — the
    // payload-pointer-dereference stand-in), then decode it back through
    // javax.sound.sampled — container format and frame count must
    // round-trip exactly
    "mm7_audio_decode" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        // 4 common rates; mono/stereo; 50..549 frames
        element_at(array(lit(8000), lit(16000), lit(22050), lit(44100)),
          (pmod(h, lit(4L)) + 1L).cast("int")).as("sr"),
        (pmod(floor(h / 4.0).cast("long"), lit(2L)) + 1L).cast("int").as("ch"),
        (pmod(floor(h / 8.0).cast("long"), lit(500L)) + 50L).cast("int")
          .as("n")).as[(Long, Int, Int, Int)]
      val media = dims.mapPartitions(_.map { case (id, sr, ch, n) =>
        graft.ops.Multimodal.MediaItem(id, "audio",
          graft.ops.Multimodal.encodeWav(n, sr, ch, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.decodeMeta(media)
        .select($"media_id", $"sampleRate".cast("long").as("sample_rate"),
          $"channels".cast("long").as("channels"),
          $"nFrames".cast("long").as("n_frames"))
    }),

    // REAL video container decode: synthesize a minimal RIFF-AVI per
    // document in the executor (dims/frames/fps derived from the text),
    // then parse the container back — MainAVIHeader fields must
    // round-trip exactly
    "mm8_video_decode" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(h, lit(320L)) + 1L).cast("int").as("w"),
        (pmod(floor(h / 320.0).cast("long"), lit(240L)) + 1L).cast("int")
          .as("h"),
        (pmod(floor(h / 76800.0).cast("long"), lit(200L)) + 1L).cast("int")
          .as("n"),
        element_at(array(lit(10), lit(20), lit(25), lit(50)),
          (pmod(h, lit(4L)) + 1L).cast("int")).as("fps"))
        .as[(Long, Int, Int, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, w, hh, n, fps) =>
        graft.ops.Multimodal.MediaItem(id, "video",
          graft.ops.Multimodal.encodeAvi(w, hh, n, fps, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.decodeMeta(media)
        .select($"media_id", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"nFrames".cast("long").as("n_frames"),
          $"sampleRate".cast("long").as("fps"))
    }),

    // REAL frame demux: every 3rd stored 00dc chunk of the synthesized
    // AVIs comes back as a Frame row (payload bytes are the actual
    // stored frame data — spec round-trips them; the gate pins the
    // index/size contract)
    "mm9_frame_demux" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(floor(h / 76800.0).cast("long"), lit(200L)) + 1L).cast("int")
          .as("n"),
        element_at(array(lit(10), lit(20), lit(25), lit(50)),
          (pmod(h, lit(4L)) + 1L).cast("int")).as("fps"))
        .as[(Long, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, n, fps) =>
        graft.ops.Multimodal.MediaItem(id, "video",
          graft.ops.Multimodal.encodeAvi(32, 24, n, fps, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.demuxFrames(media, stride = 3)
        .select($"media_id", $"frameIndex".cast("long").as("frame_index"),
          octet_length($"payload").cast("long").as("frame_bytes"))
    }),

    // REAL pixel decode end-to-end: an uncompressed (BI_RGB) AVI per
    // document, every frame's decoded pixels summed — the oracle replays
    // the pixel generator arithmetic independently, so the whole
    // encode→demux→bottom-up-BGR-decode chain must be bit-faithful
    "mm10_pixel_checksum" -> ((s, d) => {
      import s.implicits._
      val media = documents(s, d).select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          graft.ops.Multimodal.MediaItem(id, "video",
            graft.ops.Multimodal.encodeAviRgb(8, 6, 2, 25, id))
        })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      media.mapPartitions(_.flatMap { item =>
        (0 until 2).iterator.map { f =>
          val px = graft.ops.Multimodal.decodeVideoFrame(item, f)
          (item.media_id, f.toLong, px.map(_.toLong).sum)
        }
      })(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
        .toDF("media_id", "frame_index", "pix_sum")
    }),

    // REAL video resize end-to-end: per-doc-sized RGB AVIs clamped to a
    // 5-pixel long side by integer nearest-neighbor; the oracle replays
    // the sampling map (x·w÷w2, y·h÷h2 — integer division throughout)
    // against the pixel generator, so the payload-rewriting transform
    // must be bit-faithful
    "mm11_resize_checksum" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(h, lit(20L)) + 6L).cast("int").as("w"),
        (pmod(floor(h / 20.0).cast("long"), lit(15L)) + 6L).cast("int")
          .as("h")).as[(Long, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, w, hh) =>
        graft.ops.Multimodal.MediaItem(id, "video",
          graft.ops.Multimodal.encodeAviRgb(w, hh, 2, 25, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.resizeVideo(media, maxSide = 5)
        .mapPartitions(_.flatMap { item =>
          val meta = graft.ops.Multimodal.decodeVideo(item)
          (0 until meta.nFrames).iterator.map { f =>
            val px = graft.ops.Multimodal.decodeVideoFrame(item, f)
            (item.media_id, f.toLong, px.map(_.toLong).sum)
          }
        })(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("media_id", "frame_index", "pix_sum")
    }),

    // REAL image resize end-to-end: per-doc-sized PNGs clamped to a
    // 5-pixel long side by integer nearest-neighbor through the
    // lossless PNG re-encode; the oracle replays the sampling map
    // (x·w÷w2, y·h÷h2) against the PNG pixel generator, so the
    // payload-rewriting transform must be bit-faithful
    "mm12_image_resize" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(h, lit(20L)) + 6L).cast("int").as("w"),
        (pmod(floor(h / 20.0).cast("long"), lit(15L)) + 6L).cast("int")
          .as("h")).as[(Long, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, w, hh) =>
        graft.ops.Multimodal.MediaItem(id, "image",
          graft.ops.Multimodal.encodePng(w, hh, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.resizeImage(media, maxSide = 5)
        .mapPartitions(_.map { item =>
          val px = graft.ops.Multimodal.decodeImagePixels(item)
          val meta = graft.ops.Multimodal.decodeImage(item)
          (item.media_id, meta.width.toLong, meta.height.toLong,
            px.map(_.toLong).sum)
        })(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("media_id", "width", "height", "pix_sum")
    }),

    // REAL audio decimation end-to-end: per-doc PCM16 WAVs decimated
    // 4× (every 4th frame kept bit for bit, rate divided); the oracle
    // replays the kept-frame set against the WAV sample generator, so
    // the payload-rewriting transform must be bit-faithful
    "mm13_audio_decimate" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        element_at(array(lit(8000), lit(16000), lit(22050), lit(44100)),
          (pmod(h, lit(4L)) + 1L).cast("int")).as("sr"),
        (pmod(floor(h / 4.0).cast("long"), lit(2L)) + 1L).cast("int").as("ch"),
        (pmod(floor(h / 8.0).cast("long"), lit(500L)) + 50L).cast("int")
          .as("n")).as[(Long, Int, Int, Int)]
      val media = dims.mapPartitions(_.map { case (id, sr, ch, n) =>
        graft.ops.Multimodal.MediaItem(id, "audio",
          graft.ops.Multimodal.encodeWav(n, sr, ch, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.decimateAudio(media, factor = 4)
        .mapPartitions(_.map { item =>
          val meta = graft.ops.Multimodal.decodeAudio(item)
          val samples = graft.ops.Multimodal.decodeAudioSamples(item)
          (item.media_id, meta.sampleRate.toLong, meta.nFrames.toLong,
            samples.map(_.toLong).sum)
        })(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("media_id", "sample_rate", "n_frames", "sample_sum")
    }),

    // REAL image feature extraction: per-channel pixel sums from the
    // decoded raster — the oracle recomputes every pixel's R/G/B from
    // the PNG generator arithmetic
    "mm14_channel_stats" -> ((s, d) => {
      import s.implicits._
      val h = graft.ops.Dedup.charHash($"text")
      val dims = documents(s, d).select(
        $"doc_id",
        (pmod(h, lit(24L)) + 2L).cast("int").as("w"),
        (pmod(floor(h / 24.0).cast("long"), lit(18L)) + 2L).cast("int")
          .as("h")).as[(Long, Int, Int)]
      val media = graft.ops.Dedup.spread(dims).mapPartitions(_.map { case (id, w, hh) =>
        graft.ops.Multimodal.MediaItem(id, "image",
          graft.ops.Multimodal.encodePng(w, hh, id))
      })(org.apache.spark.sql.Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.channelStats(media).toDF()
    }),

    // REAL-FILE media ingestion: the committed fixture directory of
    // actual PNG/JPEG/WAV/AVI files (src/test/resources/media, generated
    // by GenMediaFixtures) read through the distributed binaryFile
    // source, kind sniffed from magic bytes (one file hides PNG bytes
    // behind a .dat extension), then decoded by the real codecs; the
    // oracle pins the independently recorded dims/rates/frame counts
    "mm15_file_ingest" -> ((s, _) => {
      import s.implicits._
      graft.ops.Multimodal.decodeMeta(
        graft.ops.Multimodal.fromFiles(s, mediaFixtureDir))
        .select($"media_id", $"kind",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"channels".cast("long").as("channels"),
          $"sampleRate".cast("long").as("sample_rate"),
          $"nFrames".cast("long").as("n_frames"),
          $"sizeBytes".as("size_bytes"))
    }),

    // multimodal feature extraction: the stub encoder's byte-histogram
    // embedding collapsed to integer invariants (dominant dimension +
    // nonzero count) the oracle can pin exactly
    "mm5_feature_argmax" -> ((s, d) => {
      import s.implicits._
      val media = graft.ops.Multimodal.asMedia(
        documents(s, d), "doc_id", lit("image"), $"text".cast("binary"))
      graft.ops.Multimodal.featureSummary(
        graft.ops.Multimodal.extractFeatures(media, dims = 16)).toDF()
    })
  )

  val oracles: Map[String, String] = Map(
    "a9_windowed_topk" ->
      """WITH w AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |         user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY window_start_us
        |    ORDER BY cnt DESC, user_id) AS INTEGER) AS rnk FROM w)
        |SELECT window_start_us, user_id, cnt, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "a11_windowed_distinct" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "st10_attribution" ->
      """SELECT p.event_id AS p_event_id, e.event_id, e.user_id,
        |       epoch_us(p.ts) AS p_ts_us, epoch_us(e.ts) AS ts_us
        |FROM events e
        |JOIN (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        | AND e.ts <= p.ts + INTERVAL 30 MINUTE""".stripMargin,

    "w9_rolling_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS roll_cents
        |FROM events""".stripMargin,

    "st1_window_agg" ->
      """SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    // hour buckets in epoch micros; quantile_disc == the sketch's exact
    // regime (per-hour distinct ≤ k)
    "st9_window_quantile" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
        |         AS p50_cents,
        |       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.95)
        |         AS p95_cents,
        |       CAST(0 AS BIGINT) AS err, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    // covered window starts w = k·slide with t−dur < w ≤ t: k ranges over
    // [(t−dur)//slide + 1, t//slide] (range() upper bound exclusive)
    "st8_hopping" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |         unnest(range((epoch_us(ts) - 600000000) // 300000000 + 1,
        |                      epoch_us(ts) // 300000000 + 1)) AS wk
        |  FROM events)
        |SELECT wk * 300000000 AS window_start_us, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM w GROUP BY 1, 2""".stripMargin,
    "st2_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts_us,
        |         CAST(sum(CASE WHEN prev_us IS NULL
        |                    OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM t)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM m GROUP BY user_id, session_seq""".stripMargin,
    "st3_gaps_islands" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM d)
        |SELECT user_id, CAST(min(day) AS BIGINT) AS start_day,
        |       CAST(max(day) AS BIGINT) AS end_day, count(*) AS n_days
        |FROM r GROUP BY user_id, day - rn""".stripMargin,
    "st4_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |w1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS first_view FROM e),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > first_view
        |                     THEN us END)
        |    OVER (PARTITION BY user_id) AS first_click FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > first_click
        |                     THEN us END)
        |    OVER (PARTITION BY user_id) AS first_purchase FROM w2),
        |u AS (
        |  SELECT DISTINCT user_id, first_view, first_click, first_purchase
        |  FROM w3)
        |SELECT count(CASE WHEN first_view IS NOT NULL THEN 1 END)
        |         AS users_view,
        |       count(CASE WHEN first_click IS NOT NULL THEN 1 END)
        |         AS users_click,
        |       count(CASE WHEN first_purchase IS NOT NULL THEN 1 END)
        |         AS users_purchase
        |FROM u""".stripMargin,
    "st7_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        |s1 AS (SELECT DISTINCT user_id FROM v),
        |s2 AS (
        |  SELECT DISTINCT v.user_id FROM v JOIN c
        |    ON c.user_id = v.user_id AND c.us > v.us
        |   AND c.us - v.us <= 43200000000),
        |s3 AS (
        |  SELECT DISTINCT v.user_id FROM v
        |  JOIN c ON c.user_id = v.user_id AND c.us > v.us
        |  JOIN p ON p.user_id = v.user_id AND p.us > c.us
        |   AND p.us - v.us <= 43200000000)
        |SELECT (SELECT count(*) FROM s1) AS users_view,
        |       (SELECT count(*) FROM s2) AS users_click,
        |       (SELECT count(*) FROM s3) AS users_purchase""".stripMargin,
    "st5_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY user_id)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset, count(*) AS users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_wk, wk - cohort_wk""".stripMargin,
    "st6_forward_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |dv AS (
        |  SELECT user_id, CAST(day AS BIGINT) AS day, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM e) t
        |  WHERE rn = 1),
        |grid AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS day
        |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
        |        FROM dv GROUP BY user_id) s),
        |j AS (
        |  SELECT g.user_id, g.day, dv.cents
        |  FROM grid g LEFT JOIN dv USING (user_id, day))
        |SELECT user_id, day,
        |       last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |         ORDER BY day ROWS UNBOUNDED PRECEDING) AS filled_cents
        |FROM j""".stripMargin,
    // st6's daily grid; neighbors via preceding/following IGNORE NULLS
    // frames, slope step as floor-of-double (integer product is
    // double-exact, so the floor is the exact rational floor)
    "st11_interpolate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |dv AS (
        |  SELECT user_id, CAST(day AS BIGINT) AS day, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM e) t
        |  WHERE rn = 1),
        |grid AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS day
        |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
        |        FROM dv GROUP BY user_id) s),
        |j AS (
        |  SELECT g.user_id, g.day, dv.cents,
        |         CASE WHEN dv.cents IS NOT NULL THEN g.day END AS od
        |  FROM grid g LEFT JOIN dv USING (user_id, day)),
        |n AS (
        |  SELECT user_id, day,
        |    last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
        |    last_value(od IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
        |    first_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY day ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING) AS nv,
        |    first_value(od IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY day ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT user_id, day,
        |       CASE WHEN nd = pd THEN pv
        |            ELSE pv + CAST(floor(CAST((nv - pv) * (day - pd)
        |              AS DOUBLE) / CAST(nd - pd AS DOUBLE)) AS BIGINT)
        |       END AS interp_cents
        |FROM n""".stripMargin,

    "mm2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_index,
        |       CAST(least(256, octet_length(CAST(text AS BLOB)) - f * 256)
        |         AS BIGINT) AS frame_bytes
        |FROM documents,
        |     unnest(range(0, greatest(1, octet_length(CAST(text AS BLOB))
        |       // 256), 4)) AS t(f)""".stripMargin,

    "mm1_media_meta" ->
      ("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       (CH % 640) + 1 AS fake_width,
        |       CAST(((CH // 640) % 480) AS BIGINT) + 1 AS fake_height
        |FROM documents""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // resize replays the exact IEEE sequence: scale = 256.0/s first,
    // then w*scale, then trunc — same double ops, same bits
    "mm3_resize" ->
      ("""WITH m AS (
        |  SELECT doc_id AS media_id,
        |         (CH % 640) + 1 AS w,
        |         ((CH // 640) % 480) + 1 AS h
        |  FROM documents)
        |SELECT media_id,
        |  CASE WHEN greatest(w, h) <= 256 THEN w
        |       ELSE greatest(1, CAST(trunc(CAST(w AS DOUBLE) *
        |         (256.0 / CAST(greatest(w, h) AS DOUBLE))) AS BIGINT)) END
        |    AS width,
        |  CASE WHEN greatest(w, h) <= 256 THEN h
        |       ELSE greatest(1, CAST(trunc(CAST(h AS DOUBLE) *
        |         (256.0 / CAST(greatest(w, h) AS DOUBLE))) AS BIGINT)) END
        |    AS height
        |FROM m""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    "mm4_audio_windows" ->
      """SELECT doc_id AS media_id, CAST(st // 160 AS BIGINT) AS window_index,
        |       CAST(st AS BIGINT) AS start_byte,
        |       CAST(least(400, octet_length(CAST(text AS BLOB)) - st)
        |         AS BIGINT) AS window_bytes
        |FROM documents,
        |     unnest(range(0, octet_length(CAST(text AS BLOB)), 160))
        |       AS t(st)""".stripMargin,

    // the decoded dims/bands must equal the derivation that sized the
    // rendered PNG — the oracle replays that arithmetic; channels is 3
    // (TYPE_3BYTE_BGR) by construction
    "mm6_image_decode" ->
      ("""SELECT doc_id AS media_id,
        |       (CH % 64) + 1 AS width,
        |       CAST((CH // 64) % 48 AS BIGINT) + 1 AS height,
        |       CAST(3 AS BIGINT) AS channels
        |FROM documents""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the decoded container format must equal the derivation that sized
    // the synthesized WAV — the oracle replays that arithmetic
    "mm7_audio_decode" ->
      ("""SELECT doc_id AS media_id,
        |       CAST(CASE CH % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |            WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
        |       CAST((CH // 4) % 2 AS BIGINT) + 1 AS channels,
        |       CAST((CH // 8) % 500 AS BIGINT) + 50 AS n_frames
        |FROM documents""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the parsed MainAVIHeader must equal the derivation that sized the
    // synthesized AVI — the oracle replays that arithmetic
    "mm8_video_decode" ->
      ("""SELECT doc_id AS media_id,
        |       (CH % 320) + 1 AS width,
        |       CAST((CH // 320) % 240 AS BIGINT) + 1 AS height,
        |       CAST((CH // 76800) % 200 AS BIGINT) + 1 AS n_frames,
        |       CAST(CASE CH % 4 WHEN 0 THEN 10 WHEN 1 THEN 20
        |            WHEN 2 THEN 25 ELSE 50 END AS BIGINT) AS fps
        |FROM documents""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    "mm9_frame_demux" ->
      ("""SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_index,
        |       CAST(16 AS BIGINT) AS frame_bytes
        |FROM documents,
        |     unnest(range(0, CAST((CH // 76800) % 200 AS BIGINT) + 1, 3))
        |       AS t(f)""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the pixel generator is pure integer arithmetic: value =
    // ((x*31+y*17+f*7001+seed)*2654435761 >> 24) mod 2^24, no 64-bit
    // wraparound at these magnitudes — so the oracle recomputes every
    // pixel of every frame and sums
    "mm10_pixel_checksum" ->
      """SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_index,
        |       CAST(SUM(((x*31 + y*17 + f*7001 + doc_id) * 2654435761
        |         // 16777216) % 16777216) AS BIGINT) AS pix_sum
        |FROM documents,
        |     unnest(range(0, 8)) AS tx(x),
        |     unnest(range(0, 6)) AS ty(y),
        |     unnest(range(0, 2)) AS tf(f)
        |GROUP BY 1, 2""".stripMargin,

    "mm11_resize_checksum" ->
      ("""WITH m AS (
        |  SELECT doc_id, (CH % 20) + 6 AS w,
        |         CAST((CH // 20) % 15 AS BIGINT) + 6 AS h
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, w, h,
        |         greatest(1, w * 5 // greatest(w, h)) AS w2,
        |         greatest(1, h * 5 // greatest(w, h)) AS h2
        |  FROM m)
        |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_index,
        |       CAST(SUM((((x2 * w // w2) * 31 + (y2 * h // h2) * 17
        |         + f * 7001 + doc_id) * 2654435761 // 16777216)
        |         % 16777216) AS BIGINT) AS pix_sum
        |FROM d,
        |     unnest(range(0, 2)) AS tf(f),
        |     unnest(range(0, w2)) AS tx(x2),
        |     unnest(range(0, h2)) AS ty(y2)
        |GROUP BY 1, 2""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the PNG pixel generator is (x*31 + y*17 + seed) mod 2^24; resize
    // reads source pixel (x2*w//w2, y2*h//h2) — the oracle recomputes
    // every target pixel from that map and sums
    "mm12_image_resize" ->
      ("""WITH m AS (
        |  SELECT doc_id, (CH % 20) + 6 AS w,
        |         CAST((CH // 20) % 15 AS BIGINT) + 6 AS h
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, w, h,
        |         greatest(1, w * 5 // greatest(w, h)) AS w2,
        |         greatest(1, h * 5 // greatest(w, h)) AS h2
        |  FROM m)
        |SELECT doc_id AS media_id, CAST(w2 AS BIGINT) AS width,
        |       CAST(h2 AS BIGINT) AS height,
        |       CAST(SUM(((x2 * w // w2) * 31 + (y2 * h // h2) * 17
        |         + doc_id) % 16777216) AS BIGINT) AS pix_sum
        |FROM d,
        |     unnest(range(0, w2)) AS tx(x2),
        |     unnest(range(0, h2)) AS ty(y2)
        |GROUP BY 1, 2, 3""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the WAV sample generator is signed16(((i*2654435761 + c*40503 +
    // seed) >> 16) mod 2^16); decimation keeps frames i ≡ 0 (mod 4) bit
    // for bit and divides the rate — the oracle recomputes the kept set
    "mm13_audio_decimate" ->
      ("""WITH m AS (
        |  SELECT doc_id,
        |         CASE CH % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |              WHEN 2 THEN 22050 ELSE 44100 END AS sr,
        |         CAST((CH // 4) % 2 AS BIGINT) + 1 AS ch,
        |         CAST((CH // 8) % 500 AS BIGINT) + 50 AS n
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(sr // 4 AS BIGINT) AS sample_rate,
        |       CAST((n + 3) // 4 AS BIGINT) AS n_frames,
        |       CAST(SUM(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
        |         AS BIGINT) AS sample_sum
        |FROM (
        |  SELECT doc_id, sr, n,
        |         ((i * 2654435761 + c * 40503 + doc_id) // 65536) % 65536 AS u
        |  FROM m,
        |       unnest(range(0, n, 4)) AS ti(i),
        |       unnest(range(0, ch)) AS tc(c))
        |GROUP BY 1, 2, 3""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // pixel v = (x*31 + y*17 + seed) mod 2^24; r = v >> 16, g = middle
    // byte, b = low byte — summed per image
    "mm14_channel_stats" ->
      ("""WITH m AS (
        |  SELECT doc_id, (CH % 24) + 2 AS w,
        |         CAST((CH // 24) % 18 AS BIGINT) + 2 AS h
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(w * h AS BIGINT) AS n_px,
        |       CAST(SUM(v // 65536) AS BIGINT) AS sum_r,
        |       CAST(SUM((v // 256) % 256) AS BIGINT) AS sum_g,
        |       CAST(SUM(v % 256) AS BIGINT) AS sum_b
        |FROM (
        |  SELECT doc_id, w, h,
        |         (x * 31 + y * 17 + doc_id) % 16777216 AS v
        |  FROM m,
        |       unnest(range(0, w)) AS tx(x),
        |       unnest(range(0, h)) AS ty(y))
        |GROUP BY 1, 2""".stripMargin).replace("CH",
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch))), " +
          "(acc, x) -> (acc * 31 + x) % 1000000007)"),

    // the decoded truth for the 8 committed fixture files, recorded at
    // generation time (GenMediaFixtures prints it) — an INDEPENDENT pin,
    // not a replay: if ingestion, sniffing, or any codec drifts, this
    // gate breaks
    "mm15_file_ingest" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, kind,
        |       CAST(width AS BIGINT) AS width,
        |       CAST(height AS BIGINT) AS height,
        |       CAST(channels AS BIGINT) AS channels,
        |       CAST(sample_rate AS BIGINT) AS sample_rate,
        |       CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(size_bytes AS BIGINT) AS size_bytes
        |FROM (VALUES
        |  (1001, 'image', 37, 23, 3, 0, 1, 1763),
        |  (1002, 'image', 64, 48, 3, 0, 1, 4755),
        |  (1003, 'image', 20, 30, 3, 0, 1, 797),
        |  (2001, 'audio', 0, 0, 1, 16000, 400, 844),
        |  (2002, 'audio', 0, 0, 2, 8000, 250, 1044),
        |  (3001, 'video', 16, 8, 3, 25, 5, 2184),
        |  (3002, 'video', 12, 10, 3, 20, 4, 196),
        |  (4001, 'image', 9, 7, 3, 0, 1, 214)
        |) AS t(media_id, kind, width, height, channels, sample_rate,
        |       n_frames, size_bytes)""".stripMargin,

    "mm5_feature_argmax" ->
      """WITH c AS (
        |  SELECT doc_id, ascii(ch) % 16 AS dim, count(*) AS cnt
        |  FROM documents, unnest(regexp_extract_all(text, '.')) AS t(ch)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT doc_id, dim, cnt,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY cnt DESC, dim) AS rn,
        |         count(*) OVER (PARTITION BY doc_id) AS nnz
        |  FROM c)
        |SELECT doc_id AS media_id, CAST(dim AS BIGINT) AS top_dim,
        |       CAST(nnz AS BIGINT) AS nnz
        |FROM r WHERE rn = 1""".stripMargin
  )
}
