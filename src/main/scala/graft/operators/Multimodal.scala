package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossHash
import graft.functions.Determinism.r6Sql
import graft.operators.TextAnalysis.docs

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage.
  *
  * No codec libraries exist in this environment, so the decode step is
  * STUBBED with deterministic fakes — but everything Spark-side is real
  * and tested: the binary column representation, the metadata schema,
  * the partition-preserving batched `mapPartitions` shape (the Scala
  * twin of a `mapInPandas` batch UDF), and the feature-vector output
  * schema an embedding/indexing stage would consume.
  *
  * The media table is derived from `documents` (text → UTF-8 bytes) so
  * the DuckDB oracle can reproduce ingest/feature values exactly; a
  * real deployment points the same operators at parquet with true
  * image/audio bytes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Batched-decode output: integer byte-histogram bin counts. Scalars
    * (not an array column) so the driver's pandas-side sort can order
    * the output — an `array<float>` column is unhashable there — and so
    * a DuckDB oracle can hash-check the values.
    */
  case class MediaHistogram(doc_id: Long, media_type: String, n_bytes: Int,
      c0: Int, c1: Int, c2: Int, c3: Int, c4: Int, c5: Int, c6: Int, c7: Int)

  /** media_type assignment: deterministic 3-way split of doc_id. */
  private def mediaType(id: Column): Column =
    when(id % 3 === 0, "image").when(id % 3 === 1, "audio").otherwise("video")

  /** The media table: (doc_id, media_type, content binary). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      mediaType(col("doc_id")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  // ------------------------------------------------------------------
  // mm_ingest — binary ingest audit: sizes + content digests
  // ------------------------------------------------------------------

  def mmIngest(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      col("media_type"),
      length(col("content")).cast("int").as("n_bytes"),
      md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))

  val mmIngestSql: String = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  md5(text) AS content_md5
FROM documents ORDER BY doc_id"""

  // ------------------------------------------------------------------
  // mm_features — stubbed decode: per-type metadata extraction
  // ------------------------------------------------------------------

  /** Deterministic fake "decode": metadata derived from a content hash.
    * A real decoder replaces each formula with codec output; the
    * per-type column shape (nulls for non-applicable fields) is the
    * contract downstream stages rely on. Modular arithmetic only — no
    * division on the 60-bit hash (long/long is double division in Spark
    * SQL and would lose precision past 2^53).
    */
  def mmFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val h = CrossHash.md5Long(col("content"))
    val nFrames = (lit(100) + h % 900).cast("int")
    val stride = greatest(lit(1),
      floor(nFrames / lit(16.0)).cast("int"))
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("media_type"),
        length(col("content")).cast("int").as("n_bytes"), h.as("h"),
        nFrames.as("nf"), stride.as("stride"))
      .select(
        col("doc_id"),
        col("media_type"),
        col("n_bytes"),
        when(col("media_type") === "image", (lit(320) + col("h") % 1280).cast("int"))
          .as("width"),
        when(col("media_type") === "image",
          (lit(240) + (col("h") % 99991) % 720).cast("int")).as("height"),
        when(col("media_type") === "audio",
          (lit(500) + col("h") % 60000).cast("int")).as("duration_ms"),
        when(col("media_type") === "audio",
          (lit(8000) + (col("h") % 5) * 8000).cast("int")).as("sample_rate"),
        when(col("media_type") === "video", col("nf")).as("n_frames"),
        when(col("media_type") === "video",
          size(sequence(lit(0), col("nf") - 1, col("stride"))))
          .as("sampled_frames"))
      .orderBy(col("doc_id"))
  }

  val mmFeaturesSql: String = {
    val h = CrossHash.md5LongSql("text")
    s"""WITH m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
    CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
    $h AS h
  FROM documents
), f AS (
  SELECT doc_id, media_type, n_bytes, h,
    CAST(100 + h % 900 AS INTEGER) AS nf,
    greatest(1, CAST(floor((100 + h % 900) / CAST(16.0 AS DOUBLE)) AS INTEGER)) AS stride
  FROM m
)
SELECT doc_id, media_type, n_bytes,
  CASE WHEN media_type = 'image' THEN CAST(320 + h % 1280 AS INTEGER) END AS width,
  CASE WHEN media_type = 'image' THEN CAST(240 + (h % 99991) % 720 AS INTEGER) END AS height,
  CASE WHEN media_type = 'audio' THEN CAST(500 + h % 60000 AS INTEGER) END AS duration_ms,
  CASE WHEN media_type = 'audio' THEN CAST(8000 + (h % 5) * 8000 AS INTEGER) END AS sample_rate,
  CASE WHEN media_type = 'video' THEN nf END AS n_frames,
  CASE WHEN media_type = 'video' THEN CAST(len(range(0, nf, stride)) AS INTEGER) END AS sampled_frames
FROM f ORDER BY doc_id"""
  }

  // ------------------------------------------------------------------
  // mm_decode_stub — the imperative decode path
  // ------------------------------------------------------------------

  /** The real decode plumbing: typed Dataset → batched mapPartitions
    * (the Scala analogue of `mapInPandas`: one partition streams
    * through in codec-friendly batches, no driver round-trip, output
    * schema fixed by the case class encoder).
    *
    * The imperative stage emits integer bin counts; the normalized
    * feature ratios are Column expressions on top, so float
    * canonicalization goes through the same [[graft.functions
    * .Determinism.r6]] machinery as every other oracle-checked query.
    */
  def mmDecodeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Determinism.r6
    val counts = mediaTable(spark, sfDir).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => // batch shape ≙ mapInPandas arrow batch
          batch.iterator.map { r =>
            // STUB: a real implementation hands r.content to an
            // image/audio/video codec here (none exist in this env).
            // Deterministic fake: 8-bin byte histogram.
            val hist = new Array[Int](8)
            r.content.foreach(b => hist((b & 0xff) % 8) += 1)
            MediaHistogram(r.doc_id, r.media_type, r.content.length,
              hist(0), hist(1), hist(2), hist(3),
              hist(4), hist(5), hist(6), hist(7))
          }
        }
      }
      .toDF()
    val n = greatest(lit(1), col("n_bytes")).cast("double")
    counts.select(
      col("doc_id") +: col("media_type") +: col("n_bytes") +:
        (0 until 8).map(k => r6(col(s"c$k") / n).as(s"h$k")): _*)
      .orderBy(col("doc_id"))
  }

  /** Oracle precondition (holds for the fixture by construction, checked
    * at all SFs): text is pure ASCII, so UTF-8 bytes == code points and
    * DuckDB's `ord(substr(text, i, 1))` reproduces `b & 0xff`.
    */
  val mmDecodeStubSql: String = {
    val bins = (0 until 8).map { k =>
      val cnt = s"len(list_filter(range(1, length(text) + 1), i -> (ord(substr(text, i, 1)) % 8) = $k))"
      r6Sql(s"CAST($cnt AS DOUBLE) / greatest(1, length(text))") + s" AS h$k"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  $bins
FROM documents ORDER BY doc_id"""
  }
}
