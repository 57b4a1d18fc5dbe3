package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{RgbUtil, SpaceSavingBuffer, TopKAggregator}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based laws (SURVEY.md §5.3) — the driver-side algebra the
  * distributed operators rely on, exercised over seeded random cases
  * (fixed seed => reproducible; pure JVM, no SparkSession).
  */
class PropertySpec extends AnyFunSuite {

  private def rng = new Random(42)

  private def token(r: Random): String =
    (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(26)).toChar).mkString

  test("array_join . split identity law on delimiter-free tokens") {
    val r = rng
    (1 to 200).foreach { _ =>
      val toks = (1 to (1 + r.nextInt(20))).map(_ => token(r))
      assert(toks.mkString("、").split("、").toSeq == toks)
    }
  }

  test("rgb tolerance predicate is symmetric and reflexive") {
    val r = rng
    (1 to 500).foreach { _ =>
      val Seq(r1, g1, b1, r2, g2, b2) = Seq.fill(6)(r.nextInt(256))
      val tol = r.nextInt(17)
      val a = UTF8String.fromString(s"rgb($r1, $g1, $b1)")
      val b = UTF8String.fromString(s"rgb($r2, $g2, $b2)")
      assert(RgbUtil.similar(a, b, tol) == RgbUtil.similar(b, a, tol))
      assert(RgbUtil.similar(a, a, tol))
    }
  }

  test("space-saving sketch is exact when capacity >= distinct items") {
    val r = rng
    (1 to 100).foreach { _ =>
      val items = (1 to r.nextInt(400)).map(_ => s"w${r.nextInt(12)}")
      val buf = new SpaceSavingBuffer(16)
      items.foreach(buf.add(_))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(buf.counters.map { case (k, (c, _)) => k -> c }.toMap == exact)
      assert(buf.counters.values.forall(_._2 == 0L)) // no eviction error
    }
  }

  test("space-saving merge of exact-regime buffers equals single-pass") {
    val r = rng
    (1 to 100).foreach { _ =>
      val xs = (1 to r.nextInt(200)).map(_ => s"w${r.nextInt(10)}")
      val ys = (1 to r.nextInt(200)).map(_ => s"w${r.nextInt(10)}")
      val one = new SpaceSavingBuffer(16)
      (xs ++ ys).foreach(one.add(_))
      val a = new SpaceSavingBuffer(16); xs.foreach(a.add(_))
      val b = new SpaceSavingBuffer(16); ys.foreach(b.add(_))
      a.merge(b)
      assert(a.counters.map { case (k, (c, _)) => k -> c } ==
             one.counters.map { case (k, (c, _)) => k -> c })
    }
  }

  test("top-k buffer: bounded, sorted, merge-order independent") {
    val r = rng
    val agg = TopKAggregator.topK(5)
    (1 to 200).foreach { _ =>
      def gen() = (1 to r.nextInt(30)).map(_ =>
        TopKAggregator.Scored(r.nextInt(50).toLong, r.nextInt(10) / 10.0)).toList
      val xs = gen(); val ys = gen()
      val ab = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
                         ys.foldLeft(agg.zero)(agg.reduce))
      val ba = agg.merge(ys.foldLeft(agg.zero)(agg.reduce),
                         xs.foldLeft(agg.zero)(agg.reduce))
      val direct = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      assert(ab.length <= 5)
      assert(ab == ba)     // merge commutes
      assert(ab == direct) // merge == single pass
      assert(ab == ab.sortBy(s => (-s.score, s.id))) // best-first order
    }
  }

  test("srp band codes: shape, range, positive-scale invariance") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val r = rng
    (1 to 200).foreach { _ =>
      val dim = 1 + r.nextInt(96)
      val v = Array.fill(dim)((r.nextInt(20001) - 10000).toLong)
      val codes = graft.functions.SrpUtil
        .bandCodes(new GenericArrayData(v), 4, 8)
      assert(codes.numElements() == 4)
      (0 until 4).foreach(b =>
        assert(codes.getLong(b) >= 0L && codes.getLong(b) < 256L))
      // sign bits are scale-invariant: 3*v buckets identically (the LSH
      // family property that makes unnormalized vectors safe to band)
      val scaled = graft.functions.SrpUtil
        .bandCodes(new GenericArrayData(v.map(_ * 3L)), 4, 8)
      assert((0 until 4).forall(b => codes.getLong(b) == scaled.getLong(b)))
    }
  }

  test("srp band codes match an independent scalar reimplementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val r = rng
    (1 to 100).foreach { _ =>
      val dim = 1 + r.nextInt(64)
      val v = Array.fill(dim)((r.nextInt(2001) - 1000).toLong)
      val got = graft.functions.SrpUtil.bandCodes(new GenericArrayData(v), 4, 8)
      val want = (0 until 4).map { b =>
        (0 until 8).foldLeft(0L) { (code, bit) =>
          val j = b * 8 + bit
          val dot = v.indices.foldLeft(0L)((acc, k) =>
            acc + v(k) * (((j * 1000003 + k * 7919) * 2654435761L) % 2001L - 1000L))
          if (dot >= 0L) code | (1L << bit) else code
        }
      }
      assert((0 until 4).forall(b => got.getLong(b) == want(b)))
    }
  }

  test("bmp encode/decode round-trip preserves dims and means") {
    val r = rng
    (1 to 50).foreach { _ =>
      val w = 1 + r.nextInt(9); val h = 1 + r.nextInt(9)
      val px = Array.fill(w * h)((r.nextInt(256), r.nextInt(256), r.nextInt(256)))
      val img = graft.multimodal.BmpDecoder.decode(
        graft.multimodal.BmpDecoder.encode(w, h, px)).get
      assert(img.width == w && img.height == h)
      val n = (w * h).toDouble
      assert(math.abs(img.meanR - px.map(_._1).sum / n) < 1e-9)
      assert(math.abs(img.meanG - px.map(_._2).sum / n) < 1e-9)
      assert(math.abs(img.meanB - px.map(_._3).sum / n) < 1e-9)
    }
  }
}
