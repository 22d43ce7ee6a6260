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
  * partition, the same contract as a Pandas-UDF `mapInPandas` batch). The
  * byte-level media decode itself is a clearly-marked deterministic STUB
  * (`decodeStub`): this container has no image/audio codecs, so it
  * derives fake-but-stable dimensions from the bytes. Swapping in a real
  * codec touches only that one function.
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

  /** STUB decode — deterministic stand-in for an image/audio codec.
    * Real implementation would parse the container format; this derives
    * stable pseudo-dimensions from content length + first bytes so the
    * distributed plumbing around it is fully testable. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length
    val head = if (n > 0) content(0) & 0xff else 0
    (n % 640, (n / 7) % 480, 1 + (head % 30))
  }

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
      // per-partition init (a real codec would be constructed here, once)
      it.map { r =>
        val (w, h, f) = decodeStub(r.content)
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

  /** Resize every record to fit a target box: streams through
    * mapPartitions (per-partition codec init), content replaced by the
    * resized bytes, metadata updated to the target dimensions. */
  def resize(ds: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h, _) = decodeStub(r.content)
        r.copy(content = resizeStub(r.content, w, h, targetW, targetH),
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
      val (_, _, frames) = decodeStub(r.content)
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
