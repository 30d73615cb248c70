package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Multimodal-column processing plumbing (BASELINE north star): treat
  * image/audio/video as opaque `binary` payloads with typed metadata,
  * decoded in fixed-size batches per partition — the Scala analog of a
  * `mapInPandas` batch UDF, and the one place `mapPartitions` is the
  * right tool (imperative per-batch work a codec library would do).
  *
  * The decode itself is a DETERMINISTIC STUB — codec libraries aren't
  * in this container — but everything around it is the real artifact:
  * the typed schema, the per-partition batch iteration (bounded
  * memory: `batchSize` assets in flight per partition), and the
  * parallel, shuffle-free shape (#output rows == #input rows,
  * pipelined within each partition).
  */
object Multimodal {

  /** An asset row: opaque payload + typed metadata. */
  case class Asset(doc_id: Long, payload: Array[Byte], lang: String, n_chars: Long)

  /** Stub "decoded" features: derived only from bytes + metadata. */
  case class Features(doc_id: Long, byte_len: Int, checksum: Long,
      width: Int, height: Int, lang: String)

  private implicit val featEnc: Encoder[Features] = ExpressionEncoder[Features]()

  /** Batched decode: partition iterator → fixed-size batches → one
    * stubbed "codec call" per batch. Swap `decodeBatch` for a real
    * codec binding and nothing else changes.
    */
  def decodeFeatures(ds: Dataset[Asset], batchSize: Int = 64): Dataset[Features] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }

  /** The stub codec call: deterministic pseudo-features per asset
    * (a real implementation would hand `batch.map(_.payload)` to the
    * decoder in one native call).
    */
  private def decodeBatch(batch: Seq[Asset]): Seq[Features] =
    batch.map { a =>
      val crc = new java.util.zip.CRC32()
      crc.update(a.payload)
      Features(a.doc_id, a.payload.length, crc.getValue,
        width = (a.n_chars % 640).toInt + 1,
        height = (a.n_chars % 480).toInt + 1,
        lang = a.lang)
    }
}
