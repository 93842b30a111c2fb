package graft

import java.nio.file.{Files, Paths}

import graft.ops.Multimodal._

/** One-shot generator for the committed on-disk media fixtures at
  * `src/test/resources/media/` — REAL container files (PNG via
  * javax.imageio, WAV via javax.sound, AVI via the from-scratch RIFF
  * writer) with deterministic content, consumed by the mm15 real-file
  * ingestion gate and MultimodalSpec. Run to regenerate:
  * `sbt "Test/runMain graft.GenMediaFixtures"`; then refresh the mm15
  * oracle's VALUES rows if dims changed.
  */
object GenMediaFixtures {
  def main(args: Array[String]): Unit = {
    val dir = "src/test/resources/media"
    Files.createDirectories(Paths.get(dir))
    def w(name: String, bytes: Array[Byte]): Unit = {
      Files.write(Paths.get(dir, name), bytes); ()
    }
    w("1001.png", encodePng(37, 23, 1001L))
    w("1002.png", encodePng(64, 48, 1002L))
    // deterministic JPEG via ImageIO (decode checks dims/bands; JPEG is
    // lossy so pixel content is never asserted)
    val img = new java.awt.image.BufferedImage(20, 30,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 30; x <- 0 until 20)
      img.setRGB(x, y, (x * 31 + y * 17 + 1003) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    w("1003.jpg", bos.toByteArray)
    w("2001.wav", encodeWav(400, 16000, 1, 2001L))
    w("2002.wav", encodeWav(250, 8000, 2, 2002L))
    w("3001.avi", encodeAviRgb(16, 8, 5, 25, 3001L))
    w("3002.avi", encodeAvi(12, 10, 4, 20, 3002L))
    // misleading extension: PNG bytes behind .dat — magic sniff must win
    w("4001.dat", encodePng(9, 7, 4001L))
    // print the decoded truth for the mm15 oracle VALUES
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    decodeMeta(fromFiles(spark, dir)).collect().sortBy(_.media_id)
      .foreach(m => println(s"META ${m.media_id} ${m.kind} ${m.width} " +
        s"${m.height} ${m.channels} ${m.sampleRate} ${m.nFrames} " +
        s"${m.sizeBytes}"))
    spark.stop()
  }
}
