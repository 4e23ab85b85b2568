package graft.multimodal

import graft.{Portable, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Blobs are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB image/audio corpus uses (content in parquet
  * binary or pointed-to object storage, metadata columns for pruning).
  * The real decode kernel (JPEG/audio codec) is NOT available in this
  * environment, so `decodeStub` is a clearly-marked deterministic
  * fake; everything around it — pruned binary scan, per-partition
  * batch iteration, typed output schema — is the real pipeline shape.
  *
  * The fake features are pure functions of the bytes (md5-derived), so
  * the whole pipeline is verified bit-for-bit against the DuckDB
  * oracle even though the codec is stubbed.
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

  val defs: Seq[QueryDef] = Seq(features, frames)
}
