package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (SURVEY.md
  * §7.6): media payloads ride as opaque `binary` columns next to a typed
  * metadata struct; decode / feature-extract / frame-sample are staged as
  * batch transforms over those columns.
  *
  * The batch decode path ([[decodeBatches]]) uses a REAL codec for the
  * formats the JVM ships readers for (PNG/JPEG/GIF/BMP via
  * `javax.imageio`, headless-safe) and falls back to a documented
  * deterministic stub for everything else — this container has no other
  * media codecs. The expression-level `decodePixelsStub` used by
  * [[processMedia]] stays a stub by design (it demonstrates the
  * column-transform shape); the Spark-side plumbing (schema, binary
  * handling, batch shape, partition parallelism) is real and tested
  * on both paths.
  */
object Multimodal {

  /** Typed metadata carried beside every media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType),
    StructField("meta", MediaMetaSchema)))

  /** Cheap blob statistics — real operators (no stub): byte length and
    * content hash, computed without ever materializing the blob on the
    * driver. */
  def withBlobStats(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("blob_len", length(col(blobCol)))
      .withColumn("blob_sha256", sha2(col(blobCol), 256))

  /** STUB decode: deterministic fake "pixels" — `n` bytes pseudo-derived
    * from the blob content hash. A real implementation binds the codec
    * here; everything downstream (shape, type, batching) is unchanged. */
  def decodePixelsStub(blobCol: String, n: Int = 64): Column =
    expr(s"transform(sequence(0, ${n - 1}), i -> " +
      s"cast(pmod(xxhash64($blobCol, i), 256) AS int))")

  /** Feature extraction over (stub-)decoded pixels: mean/std/min/max as a
    * float vector — the aggregation shape a real embedding model output
    * would flow through. */
  def pixelFeatures(pixelsCol: String): Column =
    // pixels and mean BOUND once via the element_at/transform idiom:
    // the old textual form re-evaluated the (possibly inlined upstream
    // decode) pixel expression per lambda element and recomputed the
    // mean aggregate inside the variance fold — O(n²) per row and
    // interpreted; same math, same values, computed once per stage
    expr(
      s"""element_at(transform(array($pixelsCol), __p ->
         |element_at(transform(array(aggregate(__p, 0L, (a, x) -> a + x) / size(__p)), __m ->
         |array(
         |  cast(__m AS float),
         |  cast(sqrt(aggregate(__p, cast(0.0 AS double), (a, x) ->
         |    a + pow(x - __m, 2)) / size(__p)) AS float),
         |  cast(array_min(__p) AS float),
         |  cast(array_max(__p) AS float))
         |), 1)
         |), 1)""".stripMargin)

  /** Frame sampling: `n` fixed-stride byte windows of the blob — the
    * access pattern of video frame extraction, expressed over binary. */
  def frameSample(blobCol: String, n: Int, frameLen: Int): Column =
    expr(s"transform(sequence(0, ${n - 1}), i -> " +
      s"substring($blobCol, 1 + i * cast(length($blobCol) / $n AS int), $frameLen))")

  /** Deterministic resize of a decoded pixel array (nearest-neighbor 1-D):
    * index mapping only — the same data movement a real resize performs. */
  def resizePixels(pixelsCol: String, outLen: Int): Column =
    // pixels bound once: a textual reference inside the per-index lambda
    // re-evaluates any inlined upstream decode expression per element
    expr(s"element_at(transform(array($pixelsCol), __p -> " +
      s"transform(sequence(0, ${outLen - 1}), i -> " +
      s"element_at(__p, 1 + cast(i * size(__p) / $outLen AS int)))), 1)")

  /** One decoded media record produced by the batch decode path.
    * `codec` records which path decoded the row: "imageio" (real pixel
    * decode), "stub" (deterministic fallback), "none" (empty blob). */
  case class DecodedMedia(media_id: Long, blob_len: Int,
                          features: Array[Float], ok: Boolean,
                          codec: String)

  /** Partition-parallel BATCH decode via `mapPartitions` — the Scala
    * counterpart of a `mapInPandas` decode stage: rows stream through an
    * iterator per partition, the codec is initialized ONCE per partition
    * (the expensive part a per-row UDF would pay per call), and batches
    * of `batchSize` blobs are decoded together — the batch shape a
    * vectorized codec or an inference runtime wants.
    *
    * The codec is REAL for the formats the JVM ships readers for
    * (PNG/JPEG/GIF/BMP via `javax.imageio`, headless-safe): pixels are
    * decoded and features are intensity statistics. Unknown formats fall
    * back to the documented deterministic stub (no other media libs exist
    * in this container) — same schema, same batching, flagged by `codec`. */
  def decodeBatches(df: DataFrame, blobCol: String = "blob",
                    idCol: String = "media_id",
                    batchSize: Int = 64): Dataset[DecodedMedia] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init happens here, once
        val codec = new MediaCodec
        rows.grouped(batchSize).flatMap { batch =>
          codec.decodeBatch(batch)
        }
      }
  }

  /** Per-partition codec handle: ImageIO for real formats, deterministic
    * stub fallback for opaque payloads. */
  private class MediaCodec {
    /** Cap on sampled pixels per image — bounds per-row work for huge
      * frames (a real feature extractor downsamples the same way). */
    private val MaxSamples = 4096

    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[DecodedMedia] =
      batch.map { case (id, blob) => decodeOne(id, blob) }

    private def decodeOne(id: Long, blob: Array[Byte]): DecodedMedia = {
      if (blob == null || blob.isEmpty)
        return DecodedMedia(id, 0, Array.empty, ok = false, codec = "none")
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        // real decode: grayscale intensity statistics over a bounded
        // sample grid (stride chosen so ≤ MaxSamples pixels are touched)
        val w = img.getWidth
        val h = img.getHeight
        val stride = math.max(1,
          math.ceil(math.sqrt(w.toLong * h / MaxSamples.toDouble)).toInt)
        var sum = 0.0; var sumSq = 0.0
        var mn = 255.0; var mx = 0.0; var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            sum += gray; sumSq += gray * gray; n += 1
            if (gray < mn) mn = gray
            if (gray > mx) mx = gray
            x += stride
          }
          y += stride
        }
        val mean = sum / n
        val std = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
        DecodedMedia(id, blob.length,
          Array((mean / 255).toFloat, (std / 255).toFloat,
            (mn / 255).toFloat, (mx / 255).toFloat),
          ok = true, codec = "imageio")
      } else {
        // deterministic stub for formats without a JVM reader
        var hsh = 1125899906842597L
        blob.foreach(b => hsh = hsh * 31 + b)
        val feats = Array.tabulate(4)(i =>
          ((hsh >>> (i * 8)) & 0xFF).toFloat / 255f)
        DecodedMedia(id, blob.length, feats, ok = true, codec = "stub")
      }
    }
  }

  /** Full stub pipeline over a media table: stats → decode → features →
    * frames. One narrow pass, partition-parallel, no shuffle. */
  def processMedia(df: DataFrame, blobCol: String = "blob"): DataFrame =
    withBlobStats(df, blobCol)
      .withColumn("pixels", decodePixelsStub(blobCol))
      .withColumn("features", pixelFeatures("pixels"))
      .withColumn("frames", frameSample(blobCol, n = 4, frameLen = 16))
      .withColumn("pixels_resized", resizePixels("pixels", 16))
}
