package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Typed rows for the mapPartitions decode stage (top-level so Spark's
  * generated code can access their accessors). */
case class MmPayload(doc_id: Long, img: Array[Byte])
case class MmFeatures(doc_id: Long, f: Array[Double])

/** North-star multimodal-column operators: image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / resize /
  * frame-sample / feature-extract stages.
  *
  * The container ships no media codecs, so the DECODE step is a
  * deterministic stub (bytes are synthesized from md5(text) so the DuckDB
  * oracle can reproduce them bit-for-bit) — but the Spark-side plumbing is
  * real and is exactly what a production decoder would ride on:
  *
  *  - payload travels as BinaryType with a StructType metadata column;
  *  - per-record decode/feature-extract runs in `mapPartitions` over a
  *    typed Dataset (the slot where a JNI/native codec batch-decodes one
  *    partition's payloads — amortizing codec init per partition, the
  *    property that matters at 100 TB);
  *  - frame sampling is a generator (`explode(sequence(...))`) over the
  *    decoded frame count — shuffle-free, scales linearly.
  */
object Multimodal {

  /** Opaque payload: repeat(unhex(md5(text)), 1 + doc_id % 4) → 16–64 bytes.
    * DuckDB twin: `unhex(repeat(md5(text), CAST(1 + doc_id % 4 AS INT)))`. */
  private def payload = to_binary(
    expr("repeat(md5(text), CAST(1 + doc_id % 4 AS INT))"), lit("hex"))

  /** Byte i (0-based) of the md5 digest as an int, via the hex pair — the
    * form both engines compute identically. */
  private def digestByte(i: Int) =
    conv(substring(md5(col("text")), 2 * i + 1, 2), 16, 10).cast("int")

  /** q70: decode + resize stubs — header fields from the first payload
    * bytes, frame count from payload length, halved "resize" dims. */
  def q70(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("img", payload)
      .withColumn("meta", struct(
        length(col("img")).as("n_bytes"),
        (digestByte(0) % 16 + 1).as("width"),
        (digestByte(1) % 16 + 1).as("height"),
        (length(col("img")) / 16).cast("int").as("frames"),
        when(digestByte(2) % 3 === 0, "rgb")
          .when(digestByte(2) % 3 === 1, "gray")
          .otherwise("yuv").as("fmt")))
      .select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.frames").as("frames"), col("meta.fmt").as("fmt"),
        greatest(floor(col("meta.width") / 2), lit(1)).cast("int").as("resized_w"),
        greatest(floor(col("meta.height") / 2), lit(1)).cast("int").as("resized_h"))
      .orderBy("doc_id")

  /** q71: frame sampling — every 2nd frame of the decoded clip, with a
    * per-frame content hash (generator over frame indices). */
  def q71(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("img", payload)
      .withColumn("frames", (length(col("img")) / 16).cast("int"))
      .withColumn("digest", md5(col("text")))
      .select(col("doc_id"), col("digest"),
        explode(expr("sequence(0, frames - 1)")).as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0)
      .withColumn("frame_hash",
        md5(concat(col("digest"), col("frame_idx").cast("string"))))
      .select("doc_id", "frame_idx", "frame_hash")
      .orderBy("doc_id", "frame_idx")

  /** q72: feature extraction through REAL typed per-partition plumbing —
    * `mapPartitions` over Dataset[Payload] (where a native feature
    * extractor would batch-process a partition), emitting an 8-dim vector
    * of the first 8 byte values / 255. Flattened per §7.3.5. */
  def q72(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = documents(s, d)
      .withColumn("img", payload)
      .select(col("doc_id"), col("img"))
      .as[MmPayload]
    val feats = ds.mapPartitions { it =>
      // stub decoder: per-partition batch loop — codec init would go here
      it.map { p =>
        MmFeatures(p.doc_id,
          p.img.take(8).map(b => (b & 0xff).toDouble / 255.0))
      }
    }
    feats.select(col("doc_id") +:
        (0 until 8).map(i => col("f")(i).as(s"f$i")): _*)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_decode" -> q70,
    "q71_frame_sample" -> q71,
    "q72_binary_features" -> q72)

  private val byteSql = (i: Int) =>
    s"CAST(CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS INT) AS INT)"
  private val imgSql = "unhex(repeat(md5(text), CAST(1 + doc_id % 4 AS INT)))"

  val oracle: Map[String, String] = Map(
    "q70_multimodal_decode" ->
      s"""SELECT doc_id,
        |  CAST(octet_length($imgSql) AS INT) AS n_bytes,
        |  ${byteSql(0)} % 16 + 1 AS width,
        |  ${byteSql(1)} % 16 + 1 AS height,
        |  CAST(octet_length($imgSql) // 16 AS INT) AS frames,
        |  CASE WHEN ${byteSql(2)} % 3 = 0 THEN 'rgb'
        |       WHEN ${byteSql(2)} % 3 = 1 THEN 'gray' ELSE 'yuv' END AS fmt,
        |  CAST(GREATEST((${byteSql(0)} % 16 + 1) // 2, 1) AS INT) AS resized_w,
        |  CAST(GREATEST((${byteSql(1)} % 16 + 1) // 2, 1) AS INT) AS resized_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q71_frame_sample" ->
      s"""SELECT doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
        |  md5(md5(text) || CAST(f.frame_idx AS VARCHAR)) AS frame_hash
        |FROM documents,
        |  LATERAL (SELECT unnest(range(0, CAST(octet_length($imgSql) // 16 AS INT)))
        |           AS frame_idx) f
        |WHERE f.frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q72_binary_features" ->
      (s"SELECT doc_id, " +
        (0 until 8).map(i =>
          s"CAST(${byteSql(i)} AS DOUBLE) / 255.0 AS f$i").mkString(", ") +
        " FROM documents ORDER BY doc_id"))
}
