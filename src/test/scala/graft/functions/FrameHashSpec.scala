package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AHash]] and [[SigMatches]] must be bit-identical to the
  * interpreted lambda forms they replace (m3's hex-parse aHash; d3's
  * zip_with signature-agreement count). */
class FrameHashSpec extends SparkSpec {
  import spark.implicits._

  // the exact lambda pipeline m3 used before the kernel
  private val lambdaAHash =
    "aggregate(sequence(0, 15), cast(0 as bigint), (acc, i) -> acc + " +
      "if(16 * bs[i] > aggregate(bs, cast(0 as bigint), (a, x) -> a + x), " +
      "shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"

  test("graft_ahash equals the hex-parse lambda on full frames") {
    val frames = Seq(
      Array.tabulate(16)(i => (i * 17).toByte),
      Array.fill[Byte](16)(0),
      Array.fill[Byte](16)(-1), // 0xff — unsigned handling
      Array.tabulate(16)(i => if (i < 8) 0.toByte else -1.toByte),
      Array.tabulate(20)(i => (i * 31 + 7).toByte) // longer than 16
    ).toDF("fr")
    val both = frames
      .withColumn("bs", expr(
        "transform(sequence(0, 15), i -> " +
          "cast(conv(substring(hex(fr), 2*i + 1, 2), 16, 10) as bigint))"))
      .select(
        call_function("graft_ahash", $"fr").as("k"),
        expr(lambdaAHash).as("l"))
      .as[(Long, Long)].collect()
    both.foreach { case (k, l) => k shouldBe l }
  }

  test("graft_ahash short-frame contract: < 16 bytes hashes to 0, like the lambda") {
    val frames = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      Array.tabulate(15)(i => (i * 5).toByte)
    ).toDF("fr")
    val both = frames
      .withColumn("bs", expr(
        "transform(sequence(0, 15), i -> " +
          "cast(conv(substring(hex(fr), 2*i + 1, 2), 16, 10) as bigint))"))
      .select(
        call_function("graft_ahash", $"fr").as("k"),
        expr(lambdaAHash).as("l"))
      .as[(Long, Long)].collect()
    both.foreach { case (k, l) =>
      k shouldBe 0L
      k shouldBe l
    }
  }

  test("graft_ahash collides on same brightness shape, splits on different") {
    // two frames with different bytes but the same above/below-mean
    // pattern must collide (that is the point of a perceptual hash)
    val a = Array.tabulate(16)(i => if (i % 2 == 0) 10.toByte else 100.toByte)
    val b = Array.tabulate(16)(i => if (i % 2 == 0) 20.toByte else 200.toByte)
    val c = Array.tabulate(16)(i => if (i % 2 == 0) 100.toByte else 10.toByte)
    val hs = Seq(a, b, c).toDF("fr")
      .select(call_function("graft_ahash", $"fr")).as[Long].collect()
    hs(0) shouldBe hs(1)
    hs(0) should not be hs(2)
  }

  test("graft_sig_matches equals the zip_with aggregate, nulls count 0") {
    val rows = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 9L, 3L, 4L)),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (Seq[java.lang.Long](null, null), Seq[java.lang.Long](null, null)),
      (Seq[java.lang.Long](5L), Seq[java.lang.Long](5L))
    ).toDF("sig1", "sig2")
    val both = rows.select(
      call_function("graft_sig_matches", $"sig1", $"sig2").as("k"),
      expr("cast(aggregate(zip_with(sig1, sig2, (x, y) -> if(x = y, 1, 0)), " +
        "0, (acc, v) -> acc + v) as bigint)").as("l"),
      expr("cast(size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v)) " +
        "as bigint)").as("l2"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (k, l, l2) =>
      k shouldBe l
      k shouldBe l2
    }
    both(0)._1 shouldBe 3L
    both(1)._1 shouldBe 2L // null positions contribute 0
    both(2)._1 shouldBe 0L
  }

  test("graft_ahash survives codegen over many rows") {
    val n = spark.range(5000)
      .select(call_function("graft_ahash",
        expr("substring(encode(concat('frame-', id, '-payload-x'), 'UTF-8'), 1, 16)"))
        .as("h"))
      .distinct().count()
    // similar ASCII frames legitimately collide under a 16-bit
    // perceptual hash; the assertion is that the codegen path runs
    // and produces variation, not hash quality
    n should be > 1L
  }
}
