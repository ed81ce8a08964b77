package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (SURVEY.md
  * §7.6): media payloads ride as opaque `binary` columns next to a typed
  * metadata struct; decode / feature-extract / frame-sample are staged as
  * batch transforms over those columns.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodePixelsStub` produces a deterministic fake pixel array from
  * the blob bytes. The Spark-side plumbing around it (schema, binary
  * handling, batch shape, partition parallelism) is real and tested; a
  * real deployment swaps the stub expression for a codec call (e.g. a
  * JNI/Java ImageIO expression or an Arrow-batched python worker).
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
    expr(
      s"""array(
         |  cast(aggregate($pixelsCol, 0L, (a, x) -> a + x) / size($pixelsCol) AS float),
         |  cast(sqrt(aggregate($pixelsCol, cast(0.0 AS double), (a, x) ->
         |    a + pow(x - aggregate($pixelsCol, 0L, (a2, x2) -> a2 + x2) / size($pixelsCol), 2)) / size($pixelsCol)) AS float),
         |  cast(array_min($pixelsCol) AS float),
         |  cast(array_max($pixelsCol) AS float))""".stripMargin)

  /** Frame sampling: `n` fixed-stride byte windows of the blob — the
    * access pattern of video frame extraction, expressed over binary. */
  def frameSample(blobCol: String, n: Int, frameLen: Int): Column =
    expr(s"transform(sequence(0, ${n - 1}), i -> " +
      s"substring($blobCol, 1 + i * cast(length($blobCol) / $n AS int), $frameLen))")

  /** Deterministic resize of a decoded pixel array (nearest-neighbor 1-D):
    * index mapping only — the same data movement a real resize performs. */
  def resizePixels(pixelsCol: String, outLen: Int): Column =
    expr(s"transform(sequence(0, ${outLen - 1}), i -> " +
      s"element_at($pixelsCol, 1 + cast(i * size($pixelsCol) / $outLen AS int)))")

  /** One decoded media record produced by the batch decode path. */
  case class DecodedMedia(media_id: Long, blob_len: Int,
                          features: Array[Float], ok: Boolean)

  /** Partition-parallel BATCH decode via `mapPartitions` — the Scala
    * counterpart of a `mapInPandas` decode stage: rows stream through an
    * iterator per partition, the (stubbed) codec is initialized ONCE per
    * partition (the expensive part a per-row UDF would pay per call),
    * and batches of `batchSize` blobs are decoded together — the batch
    * shape a vectorized codec or an inference runtime wants. The codec
    * itself is a deterministic stub (no media libs in this container); a
    * real deployment replaces `decodeOne` only. */
  def decodeBatches(df: DataFrame, blobCol: String = "blob",
                    idCol: String = "media_id",
                    batchSize: Int = 64): Dataset[DecodedMedia] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init happens here, once
        val codec = new StubCodec
        rows.grouped(batchSize).flatMap { batch =>
          codec.decodeBatch(batch)
        }
      }
  }

  /** Stand-in for a native codec handle: stateful, per-partition. */
  private class StubCodec {
    private var decoded = 0
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[DecodedMedia] =
      batch.map { case (id, blob) =>
        decoded += 1
        if (blob == null || blob.isEmpty)
          DecodedMedia(id, 0, Array.empty, ok = false)
        else {
          // deterministic fake features from the bytes — a real codec
          // decodes pixels/samples here
          var h = 1125899906842597L
          blob.foreach(b => h = h * 31 + b)
          val feats = Array.tabulate(4)(i =>
            ((h >>> (i * 8)) & 0xFF).toFloat / 255f)
          DecodedMedia(id, blob.length, feats, ok = true)
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
