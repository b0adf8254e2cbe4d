package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.{MediaBlob, MediaMeta}

/** I5 — raw media-file ingestion via Spark's built-in `binaryFile`
  * source (ref: the reference ships media sidecar files next to its
  * traces; a training-data pipeline ingests them as opaque bytes).
  *
  * `spark.read.format("binaryFile")` yields
  * `(path, modificationTime, length, content)` with two properties that
  * matter at 100 TB:
  *  - `pathGlobFilter` and `length` predicates prune at the FILE INDEX
  *    (files are never opened, let alone read);
  *  - `content` is column-pruned — a metadata-only query (counts,
  *    size histograms, extension audits) reads zero payload bytes.
  * Both are pinned by `MultimodalSpec` plan assertions.
  *
  * Scale note: one file = one row = one task input; the source caps
  * rows at `spark.sql.files.maxPartitionBytes` granularity, so small
  * files batch into shared tasks automatically. For millions of tiny
  * files the right upstream fix is consolidation into parquet blob
  * tables ([[mediaTable]] does exactly that), after which everything
  * downstream is ordinary columnar scan.
  */
object BinaryMedia {

  /** Extension → media kind (the decode router key). Unknown
    * extensions ingest as kind "binary" rather than erroring — a
    * pipeline must not die on a stray file. */
  private val kinds = Map(
    "jpg" -> "image", "jpeg" -> "image", "png" -> "image", "gif" -> "image",
    "bmp" -> "image", "webp" -> "image",
    "wav" -> "audio", "mp3" -> "audio", "flac" -> "audio", "ogg" -> "audio",
    "mp4" -> "video", "mkv" -> "video", "webm" -> "video", "avi" -> "video")

  /** Read files matching `glob` as one row each:
    * `(media_id, path, kind, length, payload)`. `media_id` is the
    * xxhash64 of the path — stable across re-ingests, join-ready for
    * the G2/G4 pipeline. Files over `maxFileBytes` are REJECTED with a
    * distributed check (a 4 GB stray video must not OOM an executor;
    * the limit is a real pipeline guard, not a sample). */
  def read(spark: SparkSession, glob: String,
           pathGlobFilter: String = "*",
           maxFileBytes: Long = 64L << 20): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlobFilter)
      .load(glob)
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    raw
      .filter(col("length") <= maxFileBytes) // file-index predicate
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        coalesce(typedLit(kinds).apply(ext), lit("binary")).as("kind"),
        col("length"),
        col("content").as("payload"))
  }

  /** Bridge into the typed G-suite pipeline: ingested rows as
    * [[MediaBlob]]s (intrinsic metadata — width/duration/codec — is
    * the DECODER's to fill; ingest knows only the kind and bytes). */
  def asBlobs(files: DataFrame): Dataset[MediaBlob] = {
    import files.sparkSession.implicits._
    files.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) =>
        MediaBlob(id, MediaMeta(kind, 0, 0, 0L, "undecoded"), bytes)
      }
  }

  /** Consolidate a small-file ingest into a partitioned parquet blob
    * table (kind-partitioned, `maxRecordsPerFile`-bounded) — the
    * standing fix for the millions-of-tiny-files shape: ingest once,
    * scan columnar forever after. */
  def mediaTable(files: DataFrame, outDir: String,
                 maxRecordsPerFile: Int = 10000): Unit =
    files.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("kind")
      .parquet(outDir)
}
