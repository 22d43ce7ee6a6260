package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by partition-batched feature
  * extraction.
  *
  * The Spark-side plumbing is real — schema, encoders, partitioning, and
  * the mapPartitions batch shape (one expensive "codec init" per
  * partition, the same contract as a Pandas-UDF `mapInPandas` batch).
  * The decode path is two-tier: formats the JVM ships a codec for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — pure JVM, no native deps)
  * decode for REAL (`decodeImage`); bytes no registered reader accepts
  * (this container has no audio/video codecs) fall back to the
  * clearly-marked deterministic STUB (`decodeStub`), which derives
  * fake-but-stable dimensions from the bytes so the distributed
  * plumbing stays fully testable for every `kind`. Swapping in further
  * codecs touches only the decode functions.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRecord(
      id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],
      declaredWidth: Int,
      declaredHeight: Int)

  case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      sha256: String,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decode — deterministic stand-in for formats with no
    * in-container codec (audio/video). Derives stable
    * pseudo-dimensions from content length + first bytes so the
    * distributed plumbing around it is fully testable. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length
    val head = if (n > 0) content(0) & 0xff else 0
    (n % 640, (n / 7) % 480, 1 + (head % 30))
  }

  /** REAL decode via `javax.imageio` (pure JVM: PNG/BMP/GIF/JPEG/WBMP
    * readers ship with the JDK). Reads dimensions from the header —
    * `reader.getWidth/getHeight` do NOT rasterize pixels, so probing a
    * 100 MB image costs header bytes, not a decode — and the frame
    * count from the container (animated GIF > 1). Returns None when no
    * registered reader accepts the bytes; callers fall back to
    * [[decodeStub]]. */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val frames =
            try math.max(1, r.getNumImages(true))
            catch { case _: Exception => 1 }
          Some((w, h, frames))
        } catch { case _: java.io.IOException => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Two-tier decode: real codec when the JVM has one for these bytes,
    * deterministic stub otherwise. */
  def decode(content: Array[Byte]): (Int, Int, Int) =
    decodeImage(content).getOrElse(decodeStub(content))

  private def sha256Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Partition-batched feature extraction. One codec/digest instance per
    * partition (the mapInPandas batch contract); records stream through
    * without materializing the partition. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init: no temp-file cache for the image
      // input streams created inside this task
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val (w, h, f) = decode(r.content)
        MediaFeatures(r.id, r.kind, r.content.length,
          sha256Hex(r.content), w, h, f)
      }
    }
  }

  /** One sampled frame of a video record — the row-explosion (UDTF)
    * shape of media processing. */
  case class FrameRecord(id: Long, frameIdx: Int, content: Array[Byte])

  /** STUB resize — deterministic byte-stride downsample standing in for
    * a real scaler: keeps every k-th byte where k is the integer scale
    * factor to the target box. Real plumbing, fake pixels. */
  def resizeStub(content: Array[Byte], w: Int, h: Int,
      targetW: Int, targetH: Int): Array[Byte] = {
    val stride = math.max(1, math.max(
      w / math.max(targetW, 1), h / math.max(targetH, 1)))
    if (stride == 1) content
    else content.indices.collect {
      case i if i % stride == 0 => content(i)
    }.toArray
  }

  /** REAL resize via `javax.imageio` + `java.awt` raster scaling
    * (bilinear), re-encoded as PNG. None when the bytes aren't a
    * JVM-decodable image. Runs headless — no display dependency. */
  def resizeImage(content: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content)))
      catch { case _: java.io.IOException => None }
    img.map { src =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Resize every record to fit a target box: streams through
    * mapPartitions (per-partition codec init), content replaced by the
    * resized bytes, metadata updated to the target dimensions. Real
    * scaler for JVM-decodable images, byte-stride stub otherwise. */
  def resize(ds: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val resized = resizeImage(r.content, targetW, targetH).getOrElse {
          val (w, h, _) = decodeStub(r.content)
          resizeStub(r.content, w, h, targetW, targetH)
        }
        r.copy(content = resized,
          declaredWidth = targetW, declaredHeight = targetH)
      }
    }
  }

  /** Sample every `everyN`-th frame of each record — one output row per
    * sampled frame (flatMap: rows multiply, the generator/UDTF shape).
    * Frame bytes are a deterministic slice stub; frame count comes from
    * the (stub) decode. */
  def sampleFrames(ds: Dataset[MediaRecord],
      everyN: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    require(everyN >= 1, "everyN must be >= 1")
    ds.flatMap { r =>
      val (_, _, frames) = decode(r.content)
      val n = r.content.length
      (0 until frames by everyN).map { i =>
        val from = if (frames == 0) 0 else (n.toLong * i / frames).toInt
        val until = if (frames == 0) n else (n.toLong * (i + 1) / frames).toInt
        FrameRecord(r.id, i, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** Build a media dataset from the documents table (text bytes standing
    * in for media bytes), partitioned for parallel decode. */
  def fromDocuments(spark: SparkSession, sfDir: String,
      partitions: Int = 32): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), lit("image").as("kind"),
        col("text").cast("binary").as("content"),
        lit(0).as("declaredWidth"), lit(0).as("declaredHeight"))
      .repartition(partitions)
      .as[MediaRecord]
  }

  /** End-to-end: documents → media records → features, as a DataFrame. */
  def documentFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(fromDocuments(spark, sfDir)).toDF()
}
