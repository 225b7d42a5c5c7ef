package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One attached media blob per document. In production this column holds
  * real image/audio bytes (parquet BINARY); the harness synthesizes a
  * deterministic 16-byte stand-in from the text's md5 so the oracle can
  * recompute every derived value.
  */
case class RawMedia(doc_id: Long, media: Array[Byte])

/** Typed output of the decode stage. */
case class DecodedMedia(doc_id: Long, width: Int, height: Int, channels: Int,
    byte_len: Int)

/** Multimodal-column plumbing (builder brief): treat image/audio/video as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs as a typed `mapPartitions` over the binary column — the Spark-side
  * shape (schema, encoders, partition-wise batching) is real; only the
  * codec body is a STUB.
  *
  * Scale notes: decode is embarrassingly parallel and map-side only; the
  * binary column stays columnar (parquet BINARY with page compression) and
  * is pruned away by any query that doesn't touch it. A real deployment
  * swaps [[Multimodal.decodeStub]] for a JNI/FFM image codec — partition
  * iteration amortizes codec init across rows, which is why this is
  * mapPartitions and not a per-row UDF.
  */
object Multimodal {

  /** Attach the synthetic media blob (16 md5 bytes) to each document. */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr("unhex(md5(text))").as("media"))

  /** STUB image decoder — a real implementation would parse the container
    * header (JPEG/PNG/WebP) here. The fake is a fixed deterministic
    * function of the leading bytes so tests and the DuckDB oracle can
    * verify the full pipeline shape.
    */
  def decodeStub(b: Array[Byte]): DecodedMedia0 =
    DecodedMedia0((b(0) & 0xFF) + 1, (b(1) & 0xFF) + 1, ((b(2) & 0xFF) % 4) + 1, b.length)

  case class DecodedMedia0(width: Int, height: Int, channels: Int, byteLen: Int)

  /** The decode stage: typed, partition-wise. */
  def decodeMeta(media: Dataset[RawMedia]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (amortized across rows)
      it.map { m =>
        val d = decodeStub(m.media)
        DecodedMedia(m.doc_id, d.width, d.height, d.channels, d.byteLen)
      }
    }
  }

  /** DuckDB twin: re-derive the stub's outputs from the md5 hex directly
    * (instr/substr arithmetic — valid verbatim in both engines).
    */
  val decodeMetaSql: String = {
    def hexByte(k: Int) = {
      val hi = 2 * k - 1; val lo = 2 * k
      s"((instr('0123456789abcdef', substr(h, $hi, 1)) - 1) * 16 + instr('0123456789abcdef', substr(h, $lo, 1)) - 1)"
    }
    s"""SELECT doc_id,
       |  CAST(${hexByte(1)} + 1 AS INT) AS width,
       |  CAST(${hexByte(2)} + 1 AS INT) AS height,
       |  CAST(${hexByte(3)} % 4 + 1 AS INT) AS channels,
       |  CAST(16 AS INT) AS byte_len
       |FROM (SELECT doc_id, md5(text) AS h FROM documents) m""".stripMargin
  }
}
