package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IvfPqIndex, IvfPqSharedIndex, PqIndex, ScaleStress, Similarity}

/** Dev harness for the ANN speed/recall trade: replays BenchScale's
  * recall@k measurement (exact / base-neighborhood / rerank views, same
  * inflated corpus, same 8×k shortlist) over a configurable grid of
  * index parameters, so quantizer changes are measured in seconds
  * instead of full BenchScale runs. Not part of any gate — numbers that
  * count land in BENCH_SCALE*.json via BenchScale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE_FACTOR=10 \
  *   sbt "runMain graft.RecallLab [variant ...]"
  * with variants like pq:m=8,ksub=256,iters=3 ivfpq:kc=64,nprobe=16.
  */
object RecallLab {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = ScaleStress.inflateEmbeddings(
      Tables.embeddings(spark, sfDir), factor).cache()
    emb.count()
    val qVec = Tables.embeddings(spark, sfDir).where(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val k = 30

    val truthIds = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      qVec, k).select(col("vec_id")).collect().map(_.getLong(0))
    val truth = truthIds.toSet
    val truthBases = truthIds.map(_ / factor).toSet
    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    def opt(m: Map[String, Int], key: String, dflt: Int): Int =
      m.getOrElse(key, dflt)
    def parse(s: String): Map[String, Int] =
      s.split(",").filter(_.contains("=")).map { kv =>
        val Array(a, b) = kv.split("="); (a, b.toInt)
      }.toMap

    val variants: Seq[String] = if (args.nonEmpty) args.toSeq else Seq(
      "pq:m=8,ksub=64,iters=3", "pq:m=8,ksub=256,iters=3",
      "pq:m=16,ksub=256,iters=2",
      "ivfpq:kc=64,m=16,ksub=256,nprobe=8",
      "ivfpq:kc=64,m=16,ksub=256,nprobe=16")

    variants.foreach { v =>
      val Array(kind, rest) = v.split(":", 2)
      val p = parse(rest)
      val t0 = System.nanoTime()
      val mk: Int => DataFrame = kind match {
        case "pq" =>
          val idx = PqIndex.buildTrained(emb, "vec_id", "embedding",
            m = opt(p, "m", 8), dims = 64, ksub = opt(p, "ksub", 64),
            iters = opt(p, "iters", 3),
            trainLimit = p.get("train").filter(_ > 0))
          idx.codes.cache().count()
          kk => idx.probe(qVec, k = kk)
        case "ivfpq" =>
          val idx = IvfPqSharedIndex.buildTrained(emb, "vec_id",
            "embedding", kc = opt(p, "kc", 64), m = opt(p, "m", 16),
            dims = 64, ksub = opt(p, "ksub", 256),
            iters = opt(p, "iters", 3),
            trainLimit = p.get("train").filter(_ > 0))
          idx.codes.cache().count()
          kk => idx.probe(qVec, k = kk, nprobe = opt(p, "nprobe", 8))
        case "pqx" =>
          // expression-encode variant: Lloyd-train codebooks, then encode
          // map-only via pqCodeExprs instead of the explode+join argmin
          val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
            opt(p, "m", 16), 64, opt(p, "ksub", 256),
            opt(p, "iters", 2), p.get("train").filter(_ > 0)).cache()
          val cbs = cb.collect().map(r =>
            (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
          val codeCols = Similarity.pqCodeExprs(col("embedding"), cbs,
            opt(p, "m", 16), 64)
          val codes = emb.select(col("vec_id"),
            explode(array(codeCols.zipWithIndex.map { case (c, j) =>
              struct(lit(j).as("sub"), c.as("code")) }: _*)).as("sc"))
            .select(col("vec_id"), col("sc.sub").as("sub"),
              col("sc.code").as("code"))
          val idx = graft.ops.PqIndex(opt(p, "m", 16), 64, cb, codes)
          idx.codes.cache().count()
          kk => idx.probe(qVec, k = kk)
        case "ivfpq_seeded" =>
          val idx = IvfPqIndex.build(emb, "vec_id", "embedding",
            kc = opt(p, "kc", 16), m = opt(p, "m", 8), dims = 64,
            ksub = opt(p, "ksub", 64))
          idx.codes.cache().count()
          kk => idx.probe(qVec, k = kk, nprobe = opt(p, "nprobe", 4))
      }
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val found = ids(mk(k))
      val ex = truth.intersect(found).size.toDouble / truth.size
      val base = truthBases.intersect(found.map(_ / factor)).size
        .toDouble / truthBases.size
      val reranked = ids(Similarity.rerankTopK(
        mk(k * 8), emb, "vec_id", "embedding", qVec, k))
      val rr = truth.intersect(reranked).size.toDouble / truth.size
      val tProbe = (System.nanoTime() - t1) / 1e9
      println(f"[lab] $v%-40s build $tBuild%6.1f s  probe $tProbe%6.1f s" +
        f"  exact $ex%5.3f  base $base%5.3f  rerank $rr%5.3f")
      spark.catalog.clearCache()
      emb.cache().count()
    }
    spark.stop()
  }
}
