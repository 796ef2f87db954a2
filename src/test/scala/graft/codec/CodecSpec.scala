package graft.codec

import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private def testPixels(w: Int, h: Int): Array[Int] = DataGen.pixels(123L, 42L, w, h)

  test("png roundtrip is bit-exact on pixels") {
    val px = testPixels(48, 32)
    val bytes = ImageCodec.encode(px, 48, 32, "png")
    val d = ImageCodec.decode(bytes)
    assert(d.w == 48 && d.h == 32)
    assert(d.pixels.sameElements(px))
  }

  test("jpeg roundtrip keeps PSNR >= 40 dB on smooth synthetic content") {
    val px = testPixels(64, 64)
    val bytes = ImageCodec.encode(px, 64, 64, "jpeg")
    val d = ImageCodec.decode(bytes)
    val psnr = Psnr.ofPixels(px, d.pixels)
    assert(psnr >= 40.0, s"jpeg psnr $psnr < 40")
  }

  test("psnr: identical bytes short-circuit to +inf") {
    val px = testPixels(32, 32)
    val bytes = ImageCodec.encode(px, 32, 32, "jpeg")
    assert(Psnr.ofBytes(bytes, bytes.clone()).isPosInfinity)
  }

  test("psnr drops with noise") {
    val px = testPixels(32, 32)
    val noisy = px.clone()
    val r = new scala.util.Random(7)
    (1 to 200).foreach { _ => noisy(r.nextInt(noisy.length)) ^= 0xffffff }
    val p = Psnr.ofPixels(px, noisy)
    assert(p < 40.0 && p > 0.0, s"noisy psnr was $p")
  }

  test("phash deterministic and near-dups are close in hamming") {
    val a = DataGen.imageRow(5L, 42L)
    val a2 = DataGen.imageRow(5L, 42L)
    assert(a.phash == a2.phash, "phash must be deterministic")

    // two rows in the same near-dup cluster share most phash bits
    val seed = 42L
    val clustered = (0L until 3000L).filter(i => DataGen.clusterOf(i, seed) == 0).take(2)
    assert(clustered.size == 2)
    val r1 = DataGen.imageRow(clustered(0), seed)
    val r2 = DataGen.imageRow(clustered(1), seed)
    val near = PHash.hamming(r1.phash, r2.phash)
    assert(near <= 12, s"near-dup hamming $near too large")

    // a unique image differs substantially from the cluster
    val unique = (0L until 3000L).find(i => DataGen.clusterOf(i, seed) == -1).get
    val r3 = DataGen.imageRow(unique, seed)
    val far = PHash.hamming(r1.phash, r3.phash)
    assert(far > near, s"unique image hamming $far not beyond near-dup $near")
  }

  test("generator: formats split and sizes from the allowed set") {
    val rows = (0L until 64L).map(i => DataGen.imageRow(i, 42L))
    assert(rows.exists(_.fmt == "png") && rows.exists(_.fmt == "jpeg"))
    assert(rows.forall(r => DataGen.Sizes.contains(r.w) && DataGen.Sizes.contains(r.h)))
    assert(rows.forall(r => r.caption.split(" ").length >= 5))
    assert(rows.map(_.image_id).distinct.size == 64)
    // decodability of every produced image
    rows.foreach { r =>
      val d = ImageCodec.decode(r.bytes)
      assert(d.w == r.w && d.h == r.h)
    }
  }

  test("phash skew exists: heavy-hitter cluster owns ~10% of rows") {
    val seed = 42L
    val n = 5000L
    val heavy = (0L until n).count(i => DataGen.clusterOf(i, seed) == 0)
    assert(heavy > n * 0.07 && heavy < n * 0.13, s"heavy cluster $heavy of $n")
  }
}
