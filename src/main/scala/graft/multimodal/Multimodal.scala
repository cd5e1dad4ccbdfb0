package graft.multimodal

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, batched decode / feature-extraction / frame-sampling.
  * Declared north-star extension (BASELINE.json).
  *
  * The container has no image/audio codecs, so DECODE IS A DETERMINISTIC
  * STUB (md5-derived pseudo-metadata) — clearly marked below. Everything
  * around it is the real Spark shape a production pipeline needs:
  *  - payloads as BinaryType columns (parquet BYTE_ARRAY; at 100 TB these
  *    scans project only the needed columns and the payload column is
  *    late-materialized),
  *  - per-partition batched processing via Dataset.mapPartitions (the
  *    Scala analogue of mapInPandas: one iterator per partition, decoder
  *    state initialized once per partition, not per row),
  *  - typed output schema via case-class Encoders,
  *  - frame sampling as a generated array column (explode-ready).
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Decoded(
      doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, mean_intensity: Double)

  /** STUB decoder — stands in for an image codec. Deterministic:
    * metadata is arithmetic over the md5 digest of the payload. A real
    * deployment swaps `decodeOne` for the codec call; the partition
    * iterator shape stays identical. */
  private def decodeOne(md: java.security.MessageDigest, p: Payload): Decoded = {
    val h = md.digest(p.payload)
    def ub(i: Int): Int = h(i) & 0xff
    Decoded(
      doc_id = p.doc_id,
      n_bytes = p.payload.length,
      format = if (ub(0) % 2 == 0) "png" else "jpeg",
      width = 16 * (1 + ub(1) % 64),
      height = 16 * (1 + ub(2) % 64),
      mean_intensity = ub(3) * 1.0 / 255)
  }

  /** Batched decode: one decoder instance per partition. */
  def decode(payloads: Dataset[Payload]): Dataset[Decoded] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.map(p => decodeOne(md, p))
    }
  }

  /** mm01 — binary payload metadata, oracle-checked: the stub decode's
    * md5 arithmetic is reproduced in SQL on both engines. */
  val mm01 = QueryDef.sql("mm01_binary_features",
    """SELECT doc_id,
      |  CAST(strlen(text) AS INTEGER) AS n_bytes,
      |  CASE WHEN CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 2 = 0
      |       THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(16 * (1 + CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 64) AS INTEGER) AS width,
      |  CAST(16 * (1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INTEGER) % 64) AS INTEGER) AS height,
      |  CAST(('0x' || substr(md5(text), 7, 2)) AS INTEGER) * 1e0 / 255 AS mean_intensity
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val payloads = T.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
    decode(payloads)
      .toDF()
      .select("doc_id", "n_bytes", "format", "width", "height", "mean_intensity")
      .orderBy("doc_id")
  }

  /** mm02 — frame sampling: every k-th frame index of a pseudo-video
    * whose frame count derives from the payload size. Pure expression
    * (sequence + explode-ready array), oracle-checked. */
  val mm02 = QueryDef.sql("mm02_frame_sample",
    """SELECT doc_id, n_frames,
      |  array_to_string(frames, ',') AS frames,
      |  CAST(len(frames) AS INTEGER) AS n_sampled
      |FROM (
      |  SELECT doc_id,
      |    CAST(1 + n_chars % 120 AS INTEGER) AS n_frames,
      |    CAST(range(0, CAST(1 + n_chars % 120 AS INTEGER), 5) AS INTEGER[]) AS frames
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        (lit(1) + col("n_chars") % 120).cast("int").as("n_frames"))
      .withColumn("frames", sequence(lit(0), col("n_frames") - 1, lit(5)))
      .withColumn("n_sampled", size(col("frames")))
      // comma-join the frame indices: array cells break the driver's
      // pandas sort; the sampling logic above stays array-typed
      .withColumn("frames", array_join(col("frames").cast("array<string>"), ","))
      .orderBy("doc_id")
  }

  /** mm03 — per-partition batched feature extraction over the decoded
    * stream: aggregate stats of the stub decoder's outputs. Fully
    * oracled (the stub's md5 arithmetic is deterministic — the oracle
    * re-derives it via mm01's SQL and aggregates); averages are an
    * exact integer sum with one final double division on both engines. */
  val mm03 = QueryDef.sql("mm03_decode_stats",
    s"""WITH dec AS (SELECT * FROM (${"\n"}${mm01.oracle.get}${"\n"}) m)
       |SELECT format, COUNT(*) AS n,
       |  CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width,
       |  CAST(SUM(height) AS DOUBLE) / COUNT(*) AS avg_height,
       |  MAX(n_bytes) AS max_bytes
       |FROM dec
       |GROUP BY format
       |ORDER BY format""".stripMargin) { (s, d) =>
    import s.implicits._
    val payloads = T.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
    decode(payloads).toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        (sum("width").cast("double") / count(lit(1))).as("avg_width"),
        (sum("height").cast("double") / count(lit(1))).as("avg_height"),
        max("n_bytes").as("max_bytes"))
      .orderBy("format")
  }

  final case class Embedded(doc_id: Long, emb: String, l2sq: Long)

  /** STUB embedding "model" — stands in for an ONNX/torch session. The
    * k-th component is the first 2 bytes of md5(text || ":" || k) as an
    * unsigned int (0..65535) — integer-exact, so parity needs no float
    * formatting. A real deployment swaps `predictBatch`'s body for the
    * model call; the per-partition init + grouped micro-batch shape
    * stays identical. */
  private def predictBatch(md: java.security.MessageDigest,
      batch: Seq[(Long, String)]): Seq[Embedded] =
    batch.map { case (id, text) =>
      val comps = (0 until 8).map { k =>
        val h = md.digest(s"$text:$k".getBytes("UTF-8"))
        ((h(0) & 0xff) << 8) | (h(1) & 0xff)
      }
      Embedded(id, comps.mkString(","),
        comps.map(c => c.toLong * c).sum)
    }

  /** Test access: the spec proves batch-boundary/partitioning
    * independence by re-running the batcher at a different size. */
  private[graft] def predictBatchForTest(md: java.security.MessageDigest,
      batch: Seq[(Long, String)]): Seq[Embedded] = predictBatch(md, batch)

  /** mm04 — batched embedding inference: the model-serving shape of a
    * multimodal pipeline (the step after mm01's decode). The "model"
    * loads ONCE per partition (the expensive session/GPU-context init a
    * per-row UDF would pay per record) and rows are scored in
    * micro-batches of 32 (`Iterator.grouped` — the Scala analogue of
    * mapInPandas' arrow batches; batch size is the GPU-throughput dial).
    * Output components stay integer-exact (md5-derived), so the full
    * embedding string and its L2² norm are bit-oracle-able — no float
    * formatting ambiguity between engines. At 100 TB this is a pure
    * narrow map: no shuffle, embarrassingly parallel, and the batch
    * boundary never affects the result (spec asserts partitioning
    * independence). */
  val mm04 = QueryDef.sql("mm04_batch_inference",
    """SELECT doc_id,
      |  array_to_string([
      |    CAST(('0x' || substr(md5(text || ':0'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':1'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':2'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':3'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':4'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':5'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':6'), 1, 4)) AS INTEGER),
      |    CAST(('0x' || substr(md5(text || ':7'), 1, 4)) AS INTEGER)], ',') AS emb,
      |  CAST((SELECT SUM(c * c) FROM UNNEST([
      |    CAST(('0x' || substr(md5(text || ':0'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':1'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':2'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':3'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':4'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':5'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':6'), 1, 4)) AS BIGINT),
      |    CAST(('0x' || substr(md5(text || ':7'), 1, 4)) AS BIGINT)]) t(c)) AS BIGINT)
      |    AS l2sq
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = T.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // model init, once
      it.grouped(32).flatMap(batch => predictBatch(md, batch))
    }.toDF()
      .select("doc_id", "emb", "l2sq")
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(mm01, mm02, mm03, mm04)
}
