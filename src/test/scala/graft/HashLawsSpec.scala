package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AviImpl, BmpImpl, PolyHashImpl, WavImpl}

/** Property checks for the hash ALGEBRA the container oracles lean on —
  * the BMP/AVI pixel hashes are replayed in DuckDB via the closed form
  * `H(A‖B) = (H(A)·31^|B| + H(B)) mod M` applied to a payload tiled k
  * times plus a prefix; these laws are what make three bounded folds
  * equal a w·3·h·n byte walk. Pure JVM (no Spark session), randomized
  * via ScalaCheck — hundreds of (payload, geometry) shapes per run, far
  * beyond what the fixed corpus exercises.
  */
class HashLawsSpec extends AnyFunSuite {

  private val M = 1000000007L

  private def byteHash(bs: Seq[Byte]): Long =
    bs.foldLeft(0L)((h, b) => (h * 31L + (b & 0xffL)) % M)

  private def modPow31(e: Long): Long = {
    var r = 1L; var b = 31L; var n = e
    while (n > 0) {
      if ((n & 1) == 1) r = r * b % M
      b = b * b % M
      n >>= 1
    }
    r
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("codepoint concatenation law: H(a ++ b) = (H(a)*31^|b| + H(b)) mod M") {
    // the identity behind every multi-stage polyhash fold in the
    // oracles; |b| counts CODEPOINTS (supplementary chars included)
    val frag = Gen.oneOf(Gen.alphaNumChar.map(_.toString),
      Gen.const("é"), Gen.const("😀")) // 😀, a surrogate pair
    val gen = Gen.zip(Gen.asciiPrintableStr, Gen.listOf(frag).map(_.mkString))
    check(Prop.forAll(gen) { case (a, b) =>
      val nb = b.codePointCount(0, b.length)
      PolyHashImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a + b)) ==
        (PolyHashImpl.compute(org.apache.spark.unsafe.types.UTF8String.fromString(a))
          * modPow31(nb)
          + PolyHashImpl.compute(org.apache.spark.unsafe.types.UTF8String.fromString(b))) % M
    })
  }

  test("tiling law: direct fold over a payload tiled to length L equals the " +
      "k-fold + prefix closed form the BMP/AVI oracles replay") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(0, 5000))
    check(Prop.forAll(gen) { case (data, len) =>
      val direct = byteHash(Seq.tabulate(len)(i => data(i % data.size)))
      val hd = byteHash(data)
      val n = data.size
      val k = len / n
      val r = len % n
      val pn = modPow31(n)
      var hk = 0L
      var f = 0
      while (f < k) { hk = (hk * pn + hd) % M; f += 1 }
      val closed = (hk * modPow31(r) + byteHash(data.take(r))) % M
      direct == closed
    })
  }

  test("container round trips hold for arbitrary payload/geometry shapes") {
    val payload = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val bmpGen = Gen.zip(payload, Gen.chooseNum(1L, 40L), Gen.chooseNum(1L, 30L))
    check(Prop.forAll(bmpGen) { case (data, w, h) =>
      val hdr = BmpImpl.parse(BmpImpl.wrap(data, w, h))
      hdr != null &&
        hdr.getLong(3) == w && hdr.getLong(4) == h &&
        hdr.getLong(11) == byteHash(
          Seq.tabulate((w * 3 * h).toInt)(i => if (data.isEmpty) 0: Byte else data(i % data.length)))
    })
    val aviGen = Gen.zip(payload, Gen.chooseNum(1L, 20L),
      Gen.chooseNum(1L, 16L), Gen.chooseNum(1L, 8L))
    check(Prop.forAll(aviGen) { case (data, w, h, n) =>
      val hdr = AviImpl.parse(AviImpl.wrap(data, w, h, n))
      hdr != null &&
        hdr.getLong(2) == n && hdr.getLong(3) == w && hdr.getLong(4) == h &&
        hdr.getLong(11) == byteHash(
          Seq.tabulate((w * 3 * h * n).toInt)(i => if (data.isEmpty) 0: Byte else data(i % data.length)))
    })
    val wavGen = Gen.zip(payload, Gen.oneOf(8000L, 16000L), Gen.oneOf(1L, 2L), Gen.oneOf(8L, 16L))
    check(Prop.forAll(wavGen) { case (data, rate, ch, bits) =>
      val hdr = WavImpl.parse(WavImpl.wrap(data, rate, ch, bits))
      hdr != null && hdr.getLong(4) == rate && hdr.getLong(3) == ch &&
        hdr.getLong(7) == bits && hdr.getLong(8) == data.length.toLong
    })
  }

  test("minhash signature kernel laws: prefix stability, the per-j " +
      "universal-hash formula, and permutation invariance") {
    import graft.functions.MinhashSigImpl
    val P = 2147483647L
    def arr(xs: Seq[Long]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
    val hsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000006L))
    check(Prop.forAll(hsGen, Gen.chooseNum(1, 64)) { (hs, k) =>
      val sig = MinhashSigImpl.compute(arr(hs), 64)
      val pre = MinhashSigImpl.compute(arr(hs), k)
      // a shorter signature is the longer one's prefix (what makes the
      // 16-long banding signature the est signature's prefix)
      (0 until k).forall(j => sig.getLong(j) == pre.getLong(j)) &&
        // each position is the formula's minimum
        (0 until 64).forall { j =>
          sig.getLong(j) ==
            hs.map(h => (h * MinhashSigImpl.A(j) + MinhashSigImpl.B(j)) % P).min
        }
    })
    // min over a SET: element order and duplication never change the sig
    check(Prop.forAll(hsGen) { hs =>
      val a = MinhashSigImpl.compute(arr(hs), 32)
      val b = MinhashSigImpl.compute(arr(scala.util.Random.shuffle(hs ++ hs.headOption)), 32)
      (0 until 32).forall(j => a.getLong(j) == b.getLong(j))
    })
  }

  test("match count laws: bounded by length, reflexive on equal arrays, " +
      "symmetric, and exact under controlled corruption") {
    import graft.functions.MatchCountImpl
    def arr(xs: Seq[Long]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(gen) { xs =>
      MatchCountImpl.compute(arr(xs), arr(xs)) == xs.length
    })
    val pair = for {
      xs <- gen
      flips <- Gen.someOf(xs.indices)
    } yield (xs, flips.toSet)
    check(Prop.forAll(pair) { case (xs, flips) =>
      val ys = xs.zipWithIndex.map { case (x, i) => if (flips(i)) x + 1 else x }
      val expect = xs.indices.count(i => xs(i) == ys(i))
      MatchCountImpl.compute(arr(xs), arr(ys)) == expect &&
        MatchCountImpl.compute(arr(ys), arr(xs)) == expect
    })
  }

  test("png codec laws: lossless roundtrip equals the tiled byte fold for " +
      "arbitrary payloads and dimensions, including 1x1 and empty payload") {
    import graft.functions.PngCodec
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      data <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, data.toArray)
    check(Prop.forAll(gen) { case (w, h, data) =>
      val Some((dw, dh, hash)) = PngCodec.decodeHash(PngCodec.encodeTiled(data, w, h))
      val expect = (0 until w * 3 * h).foldLeft(0L) { (acc, i) =>
        val b = if (data.isEmpty) 0L else data(i % data.length) & 0xffL
        (acc * 31 + b) % M
      }
      dw == w && dh == h && hash == expect
    })
  }
}
