package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Real-codec image pipeline: JDK imageio decode inside the engine's
  * mapPartitions batch shape — known synthetic PNGs/JPEGs in, exact
  * features out, corrupt bytes tolerated, resize round-trips. */
class MultimodalImageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageFeatures decodes PNG/JPEG blobs exactly and drops corrupt ones") {
    import spark.implicits._
    val red = png(8, 4)((_, _) => 0xff0000)
    val gray = png(5, 5)((_, _) => 0x808080)
    val jpeg = { // solid mid-gray survives JPEG compression closely
      val img = new BufferedImage(6, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 6) img.setRGB(x, y, 0x808080)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val corrupt = Array[Byte](1, 2, 3, 4, 5)
    val df = Seq((1L, red), (2L, gray), (3L, jpeg), (4L, corrupt))
      .toDF("doc_id", "content")

    val out = Multimodal.imageFeatures(df, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "corrupt blob must drop, not fail")

    val r1 = out(1L)
    assert((r1.getInt(1), r1.getInt(2)) == (8, 4))
    assert(r1.getDouble(3) == 255.0 && r1.getDouble(4) == 0.0 && r1.getDouble(5) == 0.0)
    // all 32 pixels of pure red: luma = 76 -> bin 2
    assert(r1.getSeq[Long](6)(2) == 32L)

    val r2 = out(2L)
    assert((r2.getInt(1), r2.getInt(2)) == (5, 5))
    assert(r2.getDouble(3) == 128.0 && r2.getDouble(4) == 128.0 && r2.getDouble(5) == 128.0)

    val r3 = out(3L)
    assert((r3.getInt(1), r3.getInt(2)) == (6, 6))
    assert(math.abs(r3.getDouble(3) - 128.0) < 3.0, "JPEG mid-gray must decode near 128")
  }

  test("resizePng caps the long side and round-trips through the decoder") {
    val big = png(64, 32)((x, _) => if (x < 32) 0xff0000 else 0x0000ff)
    val resized = Multimodal.resizePng(big, 16).get
    val feats = Multimodal.decodeImage(0L, resized).get
    assert((feats.width, feats.height) == (16, 8))
    val small = png(4, 4)((_, _) => 0x00ff00)
    val kept = Multimodal.resizePng(small, 16).get
    val kf = Multimodal.decodeImage(0L, kept).get
    assert((kf.width, kf.height) == (4, 4), "images under the cap keep their size")
    assert(Multimodal.resizePng(Array[Byte](9, 9, 9), 16).isEmpty)
  }

  test("aHash: flat images collide at zero, left/right split sets exactly the bright half") {
    // flat image: every block mean equals the global mean → strict >
    // never fires → the all-zero collision class
    val (_, f1, f2) = Multimodal.decodeAHash(0L, png(16, 16)((_, _) => 0x123456)).get
    assert((f1, f2) == (0L, 0L))
    // left half black, right half white, 16×16: blocks bx∈[4,8) are
    // all-white (mean 255 > global 127), bx∈[0,4) all-black → bits
    // set exactly where bx >= 4, in every row by
    val (_, s1, s2) = Multimodal.decodeAHash(1L,
      png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)).get
    val expectRow = (4 until 8).map(bx => 1L << bx).sum // 0xF0 per 8-bit row
    val expect32 = (0 until 4).map(by => expectRow << (8 * by)).reduce(_ | _)
    assert((s1, s2) == (expect32, expect32), f"got ($s1%x, $s2%x)")
    // hamming(flat, split) = 32 — far outside the near-dup radius;
    // two flat images of different colors are hamming-0 dups
    val (_, g1, g2) = Multimodal.decodeAHash(2L, png(12, 20)((_, _) => 0xabcdef)).get
    assert((g1, g2) == (0L, 0L))
    assert(Multimodal.decodeAHash(3L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("phashPairs: the enforced band cap suppresses a planted flat-image megabucket") {
    import spark.implicits._
    // 30 flat images → all-zero hash, every band identical (the crawl
    // boilerplate pathology); 2 distinct near-dups below the cap
    val mega = (0L until 30L).map(i => (i, 0L, 0L))
    // h1=3, h2=0x7F: hamming 9 from the flat class (outside radius 6),
    // hamming 0 from each other
    val pair = Seq((100L, 3L, 127L), (101L, 3L, 127L))
    val hs = (mega ++ pair).toDF("img_id", "h1", "h2")
    val capped = Multimodal.phashPairs(hs, maxBandSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"megabucket pairs must be dropped, small-band pair kept: $capped")
    // uncapped control: the megabucket alone contributes C(30,2) pairs
    val uncapped = Multimodal.phashPairs(hs, maxBandSize = 0).count()
    assert(uncapped == 30L * 29 / 2 + 1,
      s"uncapped join must be quadratic in the megabucket: $uncapped")
  }
}
