package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack.dot

/** QUANTIZER-PRECISION SCALING A/B (round 17 — the measured
  * foundation for the named next-round item): s24/s26 showed that a
  * PINNED refine shortlist rots as the index grows because ADC error
  * is fixed while the number of candidates it can mis-rank grows
  * linearly — round 16/17 held recall by growing R with occupancy
  * (linear refine cost). The alternative lever is PRECISION: grow the
  * per-subspace codebook with the corpus (bits ∝ log n) so ADC
  * distortion shrinks as candidates multiply and a FIXED R keeps
  * working. This main measures exactly that: per codebook size
  * k ∈ {8, 32, 64}, train the 4×16-dim sub-codebooks (the s10 Lloyd
  * recipe, seeds vec_id < k), score every query's own coarse cell by
  * ADC, refine the top-R=10 exactly, and report mean recall@3 vs the
  * exact cell truth — same audit shape as s24, only k varies.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.PqPrecisionAB
  * Prints one JSON line {"k8":…,"k32":…,"k64":…,"sf":…}.
  */
object PqPrecisionAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.SimilarityQueries.{evec, assign, centroidUpdate}

    val base = evec(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    // coarse quantizer FIXED at k=8 (the s10/s24 coarse cells) so the
    // A/B isolates SUB-codebook precision
    val coarse0 = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("vv").as("cc"))
    val cells = assign(base, centroidUpdate(assign(base, coarse0)))
      .select(col("vec_id"), col("cluster").as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count()

    def recallAtK(k: Int): Double = {
      // per-subspace codebooks with k seeds (the s10 recipe, k varies)
      val recon = (0 until 4).map { j =>
        val e = base
          .select(col("vec_id"), slice(col("v"), j * 16 + 1, 16).as("v"))
          .withColumn("vv", dot(col("v"), col("v")))
        val c0 = e.filter(col("vec_id") < k)
          .select(col("vec_id").as("cid"), col("v").as("cv"), col("vv").as("cc"))
        val cb = centroidUpdate(assign(e, c0))
        assign(e, cb)
          .select(col("vec_id"), col("cluster").as(s"cl$j"))
          .join(broadcast(cb.select(col("cid").as(s"cl$j"),
            col("cv").as(s"cv$j"))), s"cl$j")
          .select(col("vec_id"), col(s"cv$j"))
      }.reduce(_.join(_, "vec_id"))
        .select(col("vec_id"),
          concat(col("cv0"), col("cv1"), col("cv2"), col("cv3")).as("r"))
        .withColumn("rr", dot(col("r"), col("r")))
      val cands = recon.join(cells, "vec_id").join(base, "vec_id")
        .select(col("vec_id").as("cid_"), col("cell"), col("r"), col("rr"),
          col("v").as("xv"), col("vv").as("xx"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cands.count()
      val qs = base.filter(col("vec_id") < 10).join(cells, "vec_id")
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("vv").as("qq"), col("cell"))
      val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc"), col("cid_"))
      val wEx = Window.partitionBy(col("qid")).orderBy(col("exact"), col("cid_"))
      val ranked = qs.join(cands, "cell").filter(col("qid") =!= col("cid_"))
        .select(col("qid"), col("cid_"),
          (col("qq") - lit(2.0) * dot(col("qv"), col("r")) + col("rr"))
            .as("adc"),
          (col("qq") - lit(2.0) * dot(col("qv"), col("xv")) + col("xx"))
            .as("exact"))
        .withColumn("adc_rk", row_number().over(wAdc))
        .withColumn("true_rk", row_number().over(wEx))
      val rec = ranked.filter(col("adc_rk") <= 10)
        .withColumn("ref_rk", row_number().over(wEx))
        .groupBy(col("qid"))
        .agg((sum(when(col("ref_rk") <= 3 && col("true_rk") <= 3, 1L)
          .otherwise(0L)).cast("double") / lit(3.0)).as("recall"))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      cands.unpersist(blocking = false)
      rec
    }

    val out = Seq(8, 32, 64).map(k => s""""k$k":${recallAtK(k)}""")
      .mkString("{", ",", s""","refine_R":10,"sf":"$sfDir"}""")
    println(out)
    spark.stop()
  }
}
