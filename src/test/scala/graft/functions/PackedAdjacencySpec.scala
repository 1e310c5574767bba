package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** graft_pack_sorted / graft_packed_intersect must together return
  * EXACTLY what sort_array + array_intersect return on distinct-
  * element inputs (adjacency SETS — the g2 contract) — the packed
  * form is a wire encoding, not an approximation. Randomized
  * differential coverage spans dense small ids (1-byte varints),
  * adversarial 64-bit extremes (9-byte varints, sign boundary), and
  * the empty/disjoint/identical edges. */
class PackedAdjacencySpec extends SparkSpec {
  import spark.implicits._

  private def direct(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val pa = PackSortedLongs.pack(new GenericArrayData(a.toArray))
    val pb = PackSortedLongs.pack(new GenericArrayData(b.toArray))
    PackedIntersect.intersect(pa, pb).toLongArray().toSeq
  }

  test("differential vs set intersection — dense ids") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(200).toLong).distinct
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(200).toLong).distinct
      direct(a, b) shouldBe (a.toSet & b.toSet).toSeq.sorted
    }
  }

  test("differential vs set intersection — full 64-bit range") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct
      val b0 = Seq.fill(rnd.nextInt(30))(rnd.nextLong()).distinct
      // force some overlap — pure random 64-bit sets never intersect
      val b = (b0 ++ a.take(rnd.nextInt(a.length + 1))).distinct
      direct(a, b) shouldBe (a.toSet & b.toSet).toSeq.sorted
    }
  }

  test("boundaries: extremes, empty, identical, disjoint") {
    val ext = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    direct(ext, ext) shouldBe ext.sorted
    direct(ext, Seq.empty) shouldBe Seq.empty
    direct(Seq.empty, ext) shouldBe Seq.empty
    direct(Seq.empty, Seq.empty) shouldBe Seq.empty
    direct(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) shouldBe Seq.empty
    // pack size sanity: 1000 dense sorted ids ≈ 1-2 B each, not 8
    val packed = PackSortedLongs.pack(
      new GenericArrayData((0L until 1000L by 3).toArray))
    packed.length should be < 800
  }

  test("graft_packed_common equals the intersection cardinality") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(300).toLong).distinct
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(300).toLong).distinct
      val pa = PackSortedLongs.pack(new GenericArrayData(a.toArray))
      val pb = PackSortedLongs.pack(new GenericArrayData(b.toArray))
      PackedCommonCount.common(pa, pb) shouldBe (a.toSet & b.toSet).size
    }
    PackedCommonCount.common(Array.emptyByteArray,
      Array.emptyByteArray) shouldBe 0
  }

  test("duplicate inputs pack to sets: intersect/common match " +
      "array_intersect semantics, not multiset counts") {
    // pack() drops zero deltas after the sort, so a collect_list
    // with repeats still yields set semantics downstream
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong) // heavy repeats
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
      direct(a, b) shouldBe (a.toSet & b.toSet).toSeq.sorted
      val pa = PackSortedLongs.pack(new GenericArrayData(a.toArray))
      val pb = PackSortedLongs.pack(new GenericArrayData(b.toArray))
      PackedCommonCount.common(pa, pb) shouldBe (a.toSet & b.toSet).size
      // the packed buffer IS the distinct encoding: same bytes as
      // packing the deduped input
      pa shouldBe PackSortedLongs.pack(
        new GenericArrayData(a.distinct.toArray))
    }
    // duplicated extremes, incl. a repeated head element (zigzag path)
    val ext = Seq(Long.MinValue, Long.MinValue, -1L, -1L, 0L, 0L,
      Long.MaxValue, Long.MaxValue)
    direct(ext, ext) shouldBe ext.distinct.sorted
  }

  test("codegen path matches sort_array + array_intersect") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(100)((
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(500).toLong).distinct,
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(500).toLong).distinct))
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("graft_packed_intersect",
        call_function("graft_pack_sorted", col("a")),
        call_function("graft_pack_sorted", col("b"))).as("x"),
      sort_array(array_intersect(col("a"), col("b"))).as("want"))
    got.filter(col("x") =!= col("want")).count() shouldBe 0L
    got.count() shouldBe 100L
  }
}
