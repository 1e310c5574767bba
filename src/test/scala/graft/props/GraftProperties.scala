package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{AHash, MinHashSig, ScoredId, ShingleHash, ShingleSeq, SigMatches, TopKAgg}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck property suite for the pure kernels (no SparkSession —
  * fast, exhaustive shrinking). Spark-side equivalences live in the
  * ScalaTest specs; these pin the algebraic laws the distributed
  * plans rely on. */
object GraftProperties extends Properties("graft") {

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6))
  private val words = Gen.listOfN(20, word).map(_.toArray)

  private def arr(ws: Array[String]) =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w): Any))

  property("shingleHash is deterministic and within [0, P)") =
    forAll(words) { ws =>
      val a = ShingleHash.hashes(arr(ws), 3)
      val b = ShingleHash.hashes(arr(ws), 3)
      a.toLongArray.toSeq == b.toLongArray.toSeq &&
        a.toLongArray.forall(h => h >= 0 && h < ShingleHash.P)
    }

  property("shingleHash output is distinct") = forAll(words) { ws =>
    val hs = ShingleHash.hashes(arr(ws), 3).toLongArray
    hs.distinct.length == hs.length
  }

  property("shingleHash is permutation-sensitive but subset-stable") =
    forAll(words.suchThat(_.distinct.length >= 6)) { ws =>
      // appending words only adds shingles; existing ones survive
      val base = ShingleHash.hashes(arr(ws), 3).toLongArray.toSet
      val ext = ShingleHash.hashes(arr(ws ++ Array("zzz", "yyy", "xxx")), 3)
        .toLongArray.toSet
      base.subsetOf(ext)
    }

  private val hashArr = Gen.nonEmptyListOf(Gen.choose(0L, MinHashSig.P - 1))

  property("minhash sig_i = min over per-element perms (spot formula)") =
    forAll(hashArr) { xs =>
      val sig = MinHashSig.sig(new GenericArrayData(xs.toArray), 4).toLongArray
      (0 until 4).forall { i =>
        val a = (2L * i + 1) * 2654435761L % MinHashSig.P
        val b = (i * 40503L * 65537 + 17) % MinHashSig.P
        sig(i) == xs.map(x => (a * x + b) % MinHashSig.P).min
      }
    }

  property("minhash of a superset is <= elementwise (monotone)") =
    forAll(hashArr, hashArr) { (xs, ys) =>
      val s1 = MinHashSig.sig(new GenericArrayData(xs.toArray), 8).toLongArray
      val s2 = MinHashSig.sig(new GenericArrayData((xs ++ ys).toArray), 8).toLongArray
      (0 until 8).forall(i => s2(i) <= s1(i))
    }

  private val scored = Gen.listOf(
    Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0L, 100L)).map(ScoredId.tupled))

  property("TopKAgg merge is order-insensitive (shuffle-safe)") =
    forAll(scored, scored) { (a, b) =>
      val agg = new TopKAgg(5)
      val r1 = agg.finish(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)))
      val r2 = agg.finish(agg.merge(b.foldLeft(agg.zero)(agg.reduce),
        a.foldLeft(agg.zero)(agg.reduce)))
      val whole = agg.finish((a ++ b).foldLeft(agg.zero)(agg.reduce))
      r1 == r2 && r1 == whole
    }

  property("shingleSeq positions: length m-n+1, seq(i) hashes gram i, distinct = set") =
    forAll(words) { ws =>
      val seq = ShingleSeq.seqHashes(arr(ws), 3).toLongArray
      val set = ShingleHash.hashes(arr(ws), 3).toLongArray.toSet
      seq.length == math.max(0, ws.length - 2) &&
        seq.toSet == set &&
        seq.zipWithIndex.forall { case (h, i) =>
          h == ShingleHash.hashOne(ws.slice(i, i + 3).mkString(" "))
        }
    }

  private val frame = Gen.listOfN(16, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)

  property("ahash: 16-bit range, constant frames hash 0, short frames hash 0") =
    forAll(frame, Gen.choose(0, 255), Gen.choose(0, 15)) { (f, c, cut) =>
      AHash.ahash(f) >= 0 && AHash.ahash(f) < (1L << 16) &&
        AHash.ahash(Array.fill(16)(c.toByte)) == 0L &&
        AHash.ahash(f.take(cut)) == 0L
    }

  property("ahash is brightness-scale invariant (the perceptual property)") =
    forAll(Gen.listOfN(16, Gen.choose(0, 63)), Gen.choose(1, 4)) { (bs, c) =>
      // multiplying every byte by c preserves which bytes sit above the
      // mean, so the hash must not change (no clipping: 63*4 < 256)
      val f1 = bs.map(_.toByte).toArray
      val f2 = bs.map(b => (b * c).toByte).toArray
      AHash.ahash(f1) == AHash.ahash(f2)
    }

  private val sigArr = Gen.listOf(Gen.option(Gen.choose(0L, 100L)))
  private def sigData(xs: Seq[Option[Long]]) =
    new GenericArrayData(xs.map(_.map(Long.box).orNull: Any).toArray)

  property("sigMatches: symmetric, bounded, self = non-null count, nulls = 0") =
    forAll(sigArr, sigArr) { (a, b) =>
      val ab = SigMatches.matches(sigData(a), sigData(b))
      val ba = SigMatches.matches(sigData(b), sigData(a))
      val self = SigMatches.matches(sigData(a), sigData(a))
      ab == ba &&
        ab <= math.min(a.length, b.length) &&
        self == a.count(_.isDefined) &&
        SigMatches.matches(sigData(Seq(None, None)), sigData(Seq(None, None))) == 0L
    }

  property("dateKey falls back to UTC on any garbage zone id") =
    forAll(Gen.alphaNumStr) { z =>
      val micros = 1700000000L * 1000000
      val k = graft.functions.SafeDateKey
        .dateKey(micros, UTF8String.fromString(z)).toString
      k.matches("\\d{4}-\\d{2}-\\d{2}")
    }

  private val hashes = Gen.listOf(Gen.chooseNum(0L, 1000L)).map(_.toArray)

  property("winnow: fingerprints ⊆ input, include the global min, distinct") =
    forAll(hashes) { hs =>
      val w = 4
      val out = graft.functions.WinnowMin
        .winnow(new GenericArrayData(hs), w).toLongArray
      val inSet = hs.toSet
      out.forall(inSet.contains) &&
        out.distinct.length == out.length &&
        (hs.length < w || out.contains(hs.min)) && // the global min always wins a window
        out.length <= math.max(0, hs.length - w + 1)
    }

  property("winnow of a sorted-ascending array is exactly the prefix heads") =
    forAll(hashes.map(_.distinct.sorted)) { hs =>
      val w = 4
      val out = graft.functions.WinnowMin
        .winnow(new GenericArrayData(hs), w).toLongArray
      // ascending ⇒ window i's min is hs(i): fingerprints = first m-w+1 values
      hs.length < w || out.toSeq == hs.take(hs.length - w + 1).toSeq
    }

  property("pairMerge preserves the character stream and never grows") =
    forAll(words, word, word) { (ws, a, b) =>
      val out = graft.functions.PairMerge.merge(arr(ws),
        UTF8String.fromString(a), UTF8String.fromString(b))
      val outStrs = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      outStrs.mkString == ws.mkString && outStrs.length <= ws.length
    }

  property("pairMerge is identity when the pair never occurs adjacently") =
    forAll(words) { ws =>
      val out = graft.functions.PairMerge.merge(arr(ws),
        UTF8String.fromString("nope"), UTF8String.fromString("never"))
      (0 until out.numElements()).map(out.getUTF8String(_).toString) == ws.toSeq
    }

  property("countIn: bounded, probe-order-invariant, sums over disjoint probes") =
    forAll(words, Gen.listOfN(3, word)) { (ws, probes) =>
      val p = probes.distinct
      def c(ps: Seq[String]) = graft.functions.CountIn.countIn(
        arr(ws), arr(ps.toArray))
      val full = c(p)
      full >= 0 && full <= ws.length &&
        c(p.reverse) == full &&
        p.map(x => c(Seq(x))).sum == full // distinct probes partition the hits
    }

  // ---- round 15: the remaining kernels' algebraic laws ----

  /** Classic O(mn) Levenshtein DP — the reference the bit-parallel
    * Myers kernel must agree with. */
  private def levDp(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(a.length)
  }

  private val shortStr = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' '))
    .map(_.take(90).mkString)

  property("levBound agrees with the classic DP inside the bound, -1 outside") =
    forAll(shortStr, shortStr, Gen.choose(0, 8)) { (a, b, k) =>
      val exact = levDp(a, b)
      val got = graft.functions.LevBound.dist(a, b, k)
      if (exact <= k) got == exact else got == -1
    }

  property("levBound is symmetric and zero on self") =
    forAll(shortStr, shortStr, Gen.choose(0, 8)) { (a, b, k) =>
      graft.functions.LevBound.dist(a, b, k) ==
        graft.functions.LevBound.dist(b, a, k) &&
        graft.functions.LevBound.dist(a, a, 0) == 0
    }

  private val idSet = Gen.listOf(Gen.choose(0L, 4096L))
  private def larr(xs: Seq[Long]) = new GenericArrayData(xs.map(x => x: Any))

  property("packed adjacency: pack/intersect/common implement exact SET algebra") =
    forAll(idSet, idSet) { (xs, ys) =>
      val pa = graft.functions.PackSortedLongs.pack(larr(xs))
      val pb = graft.functions.PackSortedLongs.pack(larr(ys))
      val want = xs.toSet.intersect(ys.toSet).toSeq.sorted
      val inter = graft.functions.PackedIntersect.intersect(pa, pb)
      val got = (0 until inter.numElements()).map(inter.getLong)
      got == want &&
        graft.functions.PackedCommonCount.common(pa, pb) == want.length &&
        // self-intersection recovers the sorted distinct set (codec roundtrip)
        {
          val self = graft.functions.PackedIntersect.intersect(pa, pa)
          (0 until self.numElements()).map(self.getLong) ==
            xs.distinct.sorted
        }
    }

  property("norm is idempotent and its alphabet is closed under [a-z0-9 ]") =
    forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.oneOf('é', '中', '\t', 'Z'))) {
      (s, extra) =>
        val raw = UTF8String.fromString(s + extra.mkString)
        val once = graft.functions.NormText.norm(raw).toString
        graft.functions.NormText.norm(
          UTF8String.fromString(once)).toString == once &&
          once.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == ' ') &&
          !once.startsWith(" ") && !once.endsWith(" ") &&
          !once.contains("  ")
    }
}
