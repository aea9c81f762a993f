package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines (beyond-parity,
  * SURVEY.md §8): image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing is real and tested: schemas, partition-size
  * control for fat binary rows, per-partition batched processing via
  * `mapPartitions` on a typed Dataset (the Scala analog of
  * `mapInPandas` batch processing). The actual codec work is STUBBED —
  * image/audio libraries are not in this container — behind
  * [[MediaCodec]], whose default is a deterministic fake so tests are
  * reproducible; swap in a real JNI/ffmpeg-backed codec in production.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long
  )

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      features: Array[Float]
  )

  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, payload: Array[Byte])

  /** Pluggable decode/feature stage. The default implementation is a
    * clearly-marked deterministic fake (hash-derived features) so the
    * distributed plumbing is testable without codec libraries.
    */
  trait MediaCodec extends Serializable {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float]
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB: deterministic fake codec — features are a seeded PRNG stream
    * from the payload hash; resize truncates/pads. Replace with a real
    * codec (javacv/ffmpeg) outside this container.
    */
  object FakeCodec extends MediaCodec {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val seed = java.util.Arrays.hashCode(payload).toLong
      val rnd = new java.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat())
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, math.min(payload.length, math.max(1, w * h)))
  }

  /** Size partitions so each holds ~`targetBytes` of payload — binary
    * rows are fat (MBs), so the default 128 MB parquet split with
    * thousands of rows per task would OOM executors at 100 TB. Uses the
    * per-row size column, not row count.
    */
  def repartitionBySize(df: DataFrame, sizeCol: String, targetBytes: Long): DataFrame = {
    val total = df.agg(sum(col(sizeCol))).first().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Feature extraction: batched per partition (one codec instance per
    * task, rows streamed — the `mapInPandas` batch shape).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int,
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        md.reset()
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sha,
          codec.decodeFeatures(r.payload, dim))
      }
    }
  }

  /** Batched resize: one codec instance per task, rows streamed through
    * `mapPartitions` (the `mapInPandas` batch shape, like
    * [[extractFeatures]]). Metadata is rewritten alongside the payload
    * so downstream size-based repartitioning sees the new dimensions.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int,
                codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(payload = codec.resize(r.payload, w, h), width = w, height = h))
    }
  }

  /** Frame sampling for video rows: every `everyMs` ms of duration emits
    * one frame row (payload STUB: slice of source bytes). Explodes fat
    * rows into many small ones — done via flatMap so no single output
    * row inherits the full payload.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.max(1, (r.duration_ms / everyMs).toInt)
      (0 until n).map { i =>
        val ts = i * everyMs
        val start = ((ts.toDouble / math.max(1, r.duration_ms)) * r.payload.length).toInt
        val end = math.min(r.payload.length, start + 1024)
        Frame(r.media_id, i, ts, java.util.Arrays.copyOfRange(r.payload, math.min(start, end), end))
      }
    }
  }

  /** Synthesize a deterministic media table from any numeric id column —
    * test/bench scaffolding for the binary-column plumbing. Payload bytes
    * are generated in the printable-ASCII range (`% 95 + 32`) so the
    * DuckDB oracle — whose sha256 only accepts VARCHAR — can rebuild the
    * exact byte stream with `chr()` and hash-match the true payload
    * digest; the column stays `BinaryType` end-to-end, so the plumbing
    * under test is unchanged.
    */
  def synthesize(spark: SparkSession, n: Int, kindCycle: Seq[String] = Seq("image", "audio", "video")): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = kindCycle((id % kindCycle.length).toInt)
      val payload = Array.tabulate[Byte](512 + (id % 512).toInt)(j => ((id * 31 + j) % 95 + 32).toByte)
      MediaRow(id, kind, payload, s"application/x-$kind", 64, 64, 4000 + (id % 2000))
    }
  }
}
