package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata produced by the (stubbed) media decoder. */
case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int, checksum: Long)

/** Typed output of the (stubbed) batched resize/feature pipeline. */
case class MediaFeature(doc_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
  scale_x: Double, scale_y: Double, feat: Array[Double], feat_norm: Double)

/** Multimodal-column plumbing: media payloads travel as opaque
  * `binary` columns with typed metadata alongside. The real decode
  * (image/audio libs) is absent from this container, so the decoder is
  * a clearly-marked deterministic STUB — but the Spark-side shape
  * (binary column, per-partition batched decode, typed output schema)
  * is the real 100 TB pattern.
  */
object Multimodal {

  /** m01: binary payload column + deterministic stub "decode" to
    * typed metadata, as pure column expressions (oracle-checkable).
    */
  def m01MediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        when(pmod(col("n_chars"), lit(3)) === 0, "image")
          .when(pmod(col("n_chars"), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        length(col("payload")).cast("long").as("byte_len"),
        (pmod(col("n_chars"), lit(317)) + 32).cast("long").as("fake_width"),
        (pmod(col("n_chars") * 7, lit(211)) + 32).cast("long").as("fake_height"),
        base64(substring(col("text"), 1, 16).cast("binary")).as("head_b64"))
      .orderBy(col("doc_id"))

  /** Per-partition batched decoder over (id, payload) pairs — the
    * `mapPartitions` shape a real decoder plugs into (amortizes
    * per-batch init: codec contexts, model weights, etc.).
    *
    * STUB: real decode needs image/audio libraries not present in
    * this container; metadata is derived deterministically from the
    * payload bytes instead.
    */
  def decodeBatch(spark: SparkSession, payloads: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      // per-partition init would go here (codec context, etc.)
      it.map { case (id, bytes) =>
        val len = bytes.length
        var h = 1125899906842597L
        var i = 0
        while (i < len) { h = 31L * h + bytes(i); i += 1 }
        MediaMeta(id, len, 32 + (len % 317), 32 + ((len * 7) % 211), h)
      }
    }
  }

  /** m02: frame-sampling plumbing — fixed-stride "frames" (16-byte
    * slice every 64 bytes) from the payload, fingerprinted per frame,
    * digested per doc. The array stays row-local (no explode shuffle);
    * a real video pipeline swaps the md5 for a decoder call with the
    * identical batch shape.
    */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("frames", expr(
        "transform(sequence(0, (n_chars - 1) div 64), i -> md5(cast(substring(text, cast(i*64+1 AS INT), 16) as binary)))"))
      .select(
        col("doc_id"),
        size(col("frames")).cast("long").as("n_frames"),
        element_at(col("frames"), 1).as("first_frame_md5"),
        md5(array_join(col("frames"), "").cast("binary")).as("frames_digest"))
      .orderBy(col("doc_id"))

  /** m03: batched resize + feature-extract — the full typed
    * mapPartitions pipeline a real vision preprocessor uses: payloads
    * arrive as binary, each partition processes FIXED-SIZE BATCHES of
    * 32 (the shape GPU/codec APIs want; per-batch init amortized), and
    * emits typed rows: resize scale factors to a 64×64 target + an
    * 8-dim byte-histogram "feature vector" with its norm.
    *
    * STUB: the pixel decode is deterministic byte math (image libs
    * absent from this container) — the schema, batch shape, and
    * partition-parallel structure are the real 100 TB pattern.
    * Rows-only check (mapPartitions logic isn't single-query SQL).
    */
  def m03ResizeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val outW = 64
    val outH = 64
    payloads.mapPartitions { it =>
      // per-partition init (codec context / model weights) goes here
      it.grouped(32).flatMap { batch =>
        // per-batch init (device buffer alloc) goes here
        batch.iterator.map { case (id, bytes) =>
          val len = bytes.length
          val inW = 32 + (len % 317)
          val inH = 32 + ((len * 7) % 211)
          val feat = new Array[Double](8)
          var i = 0
          while (i < len) { feat(i % 8) += (bytes(i) & 0xFF) / 255.0; i += 1 }
          val norm = math.sqrt(feat.map(x => x * x).sum)
          MediaFeature(id, inW, inH, outW, outH,
            outW.toDouble / inW, outH.toDouble / inH, feat, norm)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_meta" -> (m01MediaMeta _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_resize_features" -> (m03ResizeFeatures _)
  )

  val oracles: Map[String, String] = Map(
    "m01_media_meta" ->
      """SELECT doc_id,
        |  CASE WHEN n_chars % 3 = 0 THEN 'image'
        |       WHEN n_chars % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  octet_length(encode(text)) AS byte_len,
        |  n_chars % 317 + 32 AS fake_width,
        |  (n_chars * 7) % 211 + 32 AS fake_height,
        |  base64(encode(substring(text, 1, 16))) AS head_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_transform(range(0, (n_chars - 1) // 64 + 1),
        |      i -> md5(substring(text, (i*64+1)::INT, 16))) AS frames
        |  FROM documents)
        |SELECT doc_id,
        |  len(frames) AS n_frames,
        |  frames[1] AS first_frame_md5,
        |  md5(array_to_string(frames, '')) AS frames_digest
        |FROM f ORDER BY doc_id""".stripMargin
  )
}
