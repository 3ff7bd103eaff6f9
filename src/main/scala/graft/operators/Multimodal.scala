package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.{MediaCodec, MediaRecord}

/** Multimodal columns (SURVEY.md §2.K).
  *
  * Binary payloads + typed metadata survive the pipeline as
  * struct/binary columns; the decode stage runs as a typed
  * mapPartitions (per-partition batches — where a real codec would
  * amortize library init), with a stubbed codec (see
  * graft.multimodal.MediaCodec). Both queries are oracle-checked:
  * the oracle recomputes the stub's byte statistics with SQL string
  * functions.
  */
object Multimodal extends QueryGroup {

  /** Nested struct/binary round-trip: pack payload + metadata, then
    * re-flatten and measure. */
  def multimodalCols(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        struct(
          col("text").cast("binary").as("payload"),
          struct(col("lang"), col("n_chars")).as("meta")).as("media"))
      .select(
        col("doc_id"),
        octet_length(col("media.payload")).as("n_bytes"),
        col("media.meta.lang").as("lang"),
        col("media.meta.n_chars").as("n_chars"))
      .orderBy("doc_id")

  /** Decode pipeline: binary payload → per-partition batched decode
    * (stub codec) → fixed-width feature columns. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .mapPartitions(_.map(MediaCodec.decode))
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: 1 payload → 4 frame rows via a typed flatMap
    * (stub codec chunks the payload; a real one decodes a container).
    * Character-based chunking on both sides keeps the oracle exact on
    * this ASCII corpus. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .flatMap(MediaCodec.sampleFrames(_, 4))
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: fixed-width resample (8 evenly spaced code points) —
    * the fixed-output-shape contract of an image resize. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("lang"))
      .as[MediaRecord]
      .map(MediaCodec.resize(_, 8))
      .toDF("doc_id", "resized")
      // fixed-width int array under test; joined to a scalar so the
      // driver's pandas compare can hash the column
      .select(col("doc_id"),
        array_join(col("resized").cast("array<string>"), ",").as("resized"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_cols" -> (multimodalCols _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _)
  )

  val oracles: Map[String, String] = Map(
    "multimodal_cols" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        lang, n_chars
      FROM documents ORDER BY doc_id""",
    "multimodal_decode" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        CAST(length(text) - length(replace(text, 'a', '')) AS INTEGER) AS n_a,
        CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER) AS n_space,
        CASE WHEN length(text) = 0 THEN -1
             ELSE ascii(substring(text, 1, 1)) END AS head_codepoint
      FROM documents ORDER BY doc_id""",
    "multimodal_frames" -> """
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        CAST(((i+1)*length(text))//4 - (i*length(text))//4 AS INTEGER) AS frame_len,
        md5(substring(text, (i*length(text))//4 + 1,
                      ((i+1)*length(text))//4 - (i*length(text))//4)) AS frame_md5
      FROM documents, (SELECT unnest(range(0, 4)) AS i) f
      ORDER BY doc_id, frame_idx""",
    "multimodal_resize" -> """
      SELECT doc_id,
        array_to_string(
          [CASE WHEN length(text) = 0 THEN -1
                ELSE ascii(substring(text, (i*(length(text)-1))//7 + 1, 1)) END
           FOR i IN range(0, 8)], ',') AS resized
      FROM documents ORDER BY doc_id"""
  )
}
