package graft.multimodal

import graft.{Portable, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Blobs are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB image/audio corpus uses (content in parquet
  * binary or pointed-to object storage, metadata columns for pruning).
  *
  * Two kernel tiers: [[decodeImage]]/[[imageFeatures]]/[[resizePng]]
  * are a REAL image pipeline on the JDK's built-in `javax.imageio`
  * codecs (PNG/JPEG/GIF/BMP — spec-verified on synthesized images,
  * corrupt-blob tolerant). Audio/video codecs are not available in
  * this environment, so the driver-gated queries use `decodeStub`, a
  * clearly-marked deterministic fake whose features are pure
  * functions of the bytes (md5-derived) — the gate corpus is text
  * stand-in bytes, and the stub keeps the whole fan-out pipeline
  * verifiable bit-for-bit against the DuckDB oracle.
  */
object Multimodal {

  /** Typed per-blob feature row (what a real decoder would emit). */
  final case class BlobFeatures(
      doc_id: Long, n_bytes: Long, fake_width: Long, fake_height: Long,
      channels: Int, codec: String)

  /** STUB decode kernel: stands in for an image decoder. Deterministic
    * md5-derived dimensions so the plumbing is verifiable end-to-end.
    * A real deployment swaps only this function (and keeps the
    * mapPartitions batching around it). */
  def decodeStub(docId: Long, content: Array[Byte]): BlobFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(content)
    val hex = md.take(8).map(b => f"$b%02x").mkString // first 15 of 16 hex chars
    val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    BlobFeatures(docId, content.length.toLong, h60 % 512, (h60 >> 9) % 512, 3, "stub-rgb8")
  }

  /** Binary-column feature extraction over a per-partition iterator
    * (the `mapPartitions` shape lets a real decoder amortize codec
    * init per partition, exactly like `mapInPandas` batching). */
  val features = QueryDef(
    "mm_features",
    Some(s"""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      ${Portable.h60Sql("text")} % 512 AS fake_width,
      (${Portable.h60Sql("text")} >> 9) % 512 AS fake_height,
      3 AS channels, 'stub-rgb8' AS codec
      FROM documents ORDER BY doc_id"""),
    (s, d) => {
      val sp = s
      import sp.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // per-partition: real codecs would init native resources here
          it.map { case (id, bytes) => decodeStub(id, bytes) }
        }
        .toDF()
        .orderBy(col("doc_id"))
    })

  /** Per-frame output of the stub "video" pipeline: deterministic
    * frame sampling (every ~Nth byte offset as a frame boundary) with
    * a resize-stub on the fake dimensions. The explode shape — one
    * blob row in, k frame rows out — is exactly how a real
    * frame-sampler fans out, and the per-frame features stay pure
    * functions of the bytes so the whole fan-out is oracle-verified. */
  final case class FrameRow(
      doc_id: Long, frame_idx: Int, frame_offset: Long,
      resized_w: Long, resized_h: Long)

  val frames = QueryDef(
    "mm_frames",
    Some(s"""WITH f AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        ${Portable.h60Sql("text")} % 512 AS w,
        (${Portable.h60Sql("text")} >> 9) % 512 AS h
        FROM documents)
      SELECT doc_id, CAST(i AS INT) AS frame_idx, i * (n_bytes // 4) AS frame_offset,
        CAST(least(w, 256) AS BIGINT) AS resized_w, CAST(least(h, 256) AS BIGINT) AS resized_h
      FROM f, (SELECT unnest(range(0, 4)) AS i)
      ORDER BY doc_id, frame_idx"""),
    (s, d) => {
      val sp = s
      import sp.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          val feat = decodeStub(id, bytes)
          // STUB frame sampler: 4 evenly spaced offsets; a real decoder
          // would seek keyframes here. Resize stub caps dims at 256.
          (0 until 4).map(i => FrameRow(id, i, i.toLong * (feat.n_bytes / 4),
            math.min(feat.fake_width, 256), math.min(feat.fake_height, 256)))
        }
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    })

  // ------------------------------------------------- real image kernel
  /** Decoded-image feature row: dimensions, per-channel means, 8-bin
    * luminance histogram. */
  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      lum_hist: Seq[Long])

  /** REAL image decode via the JDK's built-in `javax.imageio` codecs
    * (PNG/JPEG/GIF/BMP — zero external dependencies, works headless).
    * Returns None for undecodable bytes so corrupt blobs drop out
    * instead of failing the job — the tolerance mode a 100 TB crawl
    * corpus needs. Only the audio/video codecs remain stubbed in this
    * environment. */
  def decodeImage(docId: Long, bytes: Array[Byte]): Option[ImageFeatures] =
    decodeRaw(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      val hist = new Array[Long](8)
      val row = new Array[Int](w) // bulk row fetch — per-pixel getRGB pays a color-model conversion per call
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          // integer Rec.601 luma, binned into 8 buckets
          hist(((299 * r + 587 * g + 114 * b) / 1000) >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ImageFeatures(docId, w, h,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, hist.toSeq)
    }

  /** Image feature extraction over (id, binary) rows — the same
    * per-partition batch shape as [[features]], with the real codec in
    * the kernel slot; undecodable blobs are dropped. */
  def imageFeatures(df: org.apache.spark.sql.DataFrame, id: String,
      content: String): org.apache.spark.sql.DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    df.select(col(id).cast("long"), col(content).cast("binary"))
      // null ids/content would crash the non-nullable tuple encoder —
      // tolerance means such rows drop, like undecodable bytes
      .filter(col(id).isNotNull && col(content).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (i, bytes) => decodeImage(i, bytes) })
      .toDF()
  }

  /** Bilinear resize capped at `maxDim` on the long side, re-encoded
    * as PNG — the thumbnail/normalize step of an image ingest
    * pipeline. Pure JDK (`Graphics2D`). */
  def resizePng(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    decodeRaw(bytes).map { img =>
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val (w, h) =
        if (scale >= 1.0) (img.getWidth, img.getHeight)
        else (math.max(1, (img.getWidth * scale).round.toInt),
          math.max(1, (img.getHeight * scale).round.toInt))
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, w, h, null)
      gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  private def decodeRaw(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  // --------------------------------------------- real-codec gated query
  /** Gate for the REAL `javax.imageio` kernel (not [[decodeStub]]):
    * [[ImageGate]] synthesizes a parquet table of actual PNG bytes from
    * closed-form pixel patterns (solid color / vertical gradient), the
    * Spark side decodes them with [[imageFeatures]], and the oracle
    * recomputes the identical features ANALYTICALLY from the pattern
    * parameters — PNG is lossless and TYPE_INT_RGB is exact, so a
    * hash-green row proves the real decode path end-to-end without the
    * oracle engine needing an image codec. Output is de-arrayed: one
    * row per (image, luma-bin), plus exact per-channel means (integer
    * sums divided as doubles — same IEEE op both sides). */
  val imageFeaturesGate = QueryDef(
    "mm_image_features",
    Some(s"""WITH imgs AS (SELECT i AS img_id,
        8 + (i*7)%25 AS w, 8 + (i*11)%25 AS h, i%2 AS kind,
        (i*37)%256 AS br, (i*59)%256 AS bg, (i*83)%256 AS bb
      FROM range(0, ${ImageGate.NumImages}) t(i)),
      ys AS (SELECT img_id, w, h, kind, br, bg, bb, unnest(range(0, h)) AS y FROM imgs),
      rws AS (SELECT img_id, w, bg, bb,
        CASE WHEN kind = 0 THEN br ELSE (br + 3*y) % 256 END AS r FROM ys),
      px AS (SELECT img_id, w, r, bg AS g, bb AS b,
        ((299*r + 587*g + 114*b) // 1000) // 32 AS bin FROM rws),
      sums AS (SELECT img_id, sum(w * r) AS sr FROM px GROUP BY img_id),
      binc AS (SELECT img_id, bin, CAST(sum(w) AS BIGINT) AS cnt FROM px GROUP BY img_id, bin),
      allb AS (SELECT img_id, unnest(range(0, 8)) AS bin FROM imgs),
      hist AS (SELECT a.img_id, a.bin, COALESCE(b.cnt, CAST(0 AS BIGINT)) AS cnt
        FROM allb a LEFT JOIN binc b ON a.img_id = b.img_id AND a.bin = b.bin)
      SELECT i.img_id, i.w AS width, i.h AS height,
        CAST(s.sr AS DOUBLE) / (i.w * i.h) AS mean_r,
        CAST(i.bg AS DOUBLE) AS mean_g,
        CAST(i.bb AS DOUBLE) AS mean_b,
        hh.bin, hh.cnt
      FROM imgs i JOIN sums s ON s.img_id = i.img_id
      JOIN hist hh ON hh.img_id = i.img_id
      ORDER BY i.img_id, hh.bin"""),
    (s, d) => {
      val path = ImageGate.ensureParquet(s)
      imageFeatures(s.read.parquet(path), "img_id", "png")
        .select(col("doc_id").as("img_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"),
          posexplode(col("lum_hist")).as(Seq("bin0", "cnt")))
        .select(col("img_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"),
          col("bin0").cast("long").as("bin"), col("cnt"))
        .orderBy(col("img_id"), col("bin"))
    })

  /** Gate for the REAL resize kernel: solid-color gate images (even
    * ids) are resized to maxDim=10 with [[resizePng]] (decode →
    * bilinear `Graphics2D` → PNG re-encode), decoded AGAIN with
    * [[imageFeatures]], and checked against analytic expectations —
    * bilinear interpolation of a constant image is exactly that
    * constant, and the target dimensions are closed-form
    * (`round(w * maxDim/max(w,h))`, same IEEE ops both sides). Proves
    * the full decode → transform → re-encode → decode cycle. */
  val resizeGate = QueryDef(
    "mm_resize",
    Some(s"""WITH imgs AS (SELECT i AS img_id,
        8 + (i*7)%25 AS w, 8 + (i*11)%25 AS h,
        (i*37)%256 AS br, (i*59)%256 AS bg, (i*83)%256 AS bb
      FROM range(0, ${ImageGate.NumImages}) t(i) WHERE i % 2 = 0)
      SELECT img_id,
        CASE WHEN 10.0 / greatest(w, h) >= 1.0 THEN w
             ELSE greatest(1, CAST(round(w * (10.0 / greatest(w, h))) AS BIGINT)) END AS width,
        CASE WHEN 10.0 / greatest(w, h) >= 1.0 THEN h
             ELSE greatest(1, CAST(round(h * (10.0 / greatest(w, h))) AS BIGINT)) END AS height,
        CAST(br AS DOUBLE) AS mean_r, CAST(bg AS DOUBLE) AS mean_g, CAST(bb AS DOUBLE) AS mean_b
      FROM imgs ORDER BY img_id"""),
    (s, d) => {
      val path = ImageGate.ensureParquet(s)
      val sp = s
      import sp.implicits._
      val resized = s.read.parquet(path)
        .filter(pmod(col("img_id"), lit(2)) === 0) // solid-color images only
        .select(col("img_id"), col("png"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (i, b) =>
          resizePng(b, 10).map(rb => (i, rb))
        })
        .toDF("img_id", "png2")
      imageFeatures(resized, "img_id", "png2")
        .select(col("doc_id").as("img_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy(col("img_id"))
    })

  val defs: Seq[QueryDef] = Seq(features, frames, imageFeaturesGate, resizeGate)
}

/** Deterministic synthetic PNG corpus for the real-codec gate: every
  * image is drawn from a closed-form pixel function of its index (even
  * ids solid RGB, odd ids a vertical red-channel gradient), encoded
  * with the JDK PNG writer, and parqueted as an (img_id, png binary)
  * table — the same opaque-binary + typed-metadata layout the 100 TB
  * corpus uses. Pattern parameters are shared verbatim with the
  * oracle SQL above, which recomputes the expected features
  * analytically (PNG round-trip is lossless). */
object ImageGate {
  val NumImages = 40

  /** (w, h, kind, baseR, baseG, baseB) for image `i` — keep in lockstep
    * with the `imgs` CTE of the oracle. */
  private def pattern(i: Int): (Int, Int, Int, Int, Int, Int) =
    (8 + (i * 7) % 25, 8 + (i * 11) % 25, i % 2, (i * 37) % 256, (i * 59) % 256, (i * 83) % 256)

  def makePng(i: Int): Array[Byte] = {
    val (w, h, kind, br, bg, bb) = pattern(i)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val r = if (kind == 0) br else (br + 3 * y) % 256
      val rgb = (r << 16) | (bg << 8) | bb
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  @volatile private var generated: Option[String] = None

  /** Write the PNG table once per JVM (tmp dir) and return its path. */
  def ensureParquet(spark: org.apache.spark.sql.SparkSession): String = synchronized {
    generated.getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft_mm_images").toString
      val sp = spark
      import sp.implicits._
      (0 until NumImages).map(i => (i.toLong, makePng(i))).toDF("img_id", "png")
        .repartition(4) // several files: the scan shape under test is a distributed binary read
        .write.mode("overwrite").parquet(dir)
      generated = Some(dir)
      dir
    }
  }
}
