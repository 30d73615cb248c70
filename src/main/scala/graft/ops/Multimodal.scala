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

  /** One sampled video frame: asset id, frame index, timestamp, and
    * the (stub-)resized thumbnail payload.
    */
  case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long, thumb: Array[Byte])

  private implicit val frameEnc: Encoder[Frame] = ExpressionEncoder[Frame]()

  /** Frame sampling: each asset expands to one row per `intervalMs`
    * of its (metadata-declared) duration — a flatMap GENERATOR shape:
    * one→many with no shuffle, output fan-out bounded by
    * duration/interval per asset, pipelined within the partition.
    * The "decoder" seek+decode is the deterministic stub; a real
    * binding replaces only `sampleOne`.
    */
  def frameSample(ds: Dataset[Asset], intervalMs: Long, maxFrames: Int = 32)
      : Dataset[Frame] = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    ds.flatMap { a =>
      val durationMs = a.n_chars * 40 // stub: metadata-derived duration
      // cap in Long space BEFORE narrowing — a huge ratio must clamp
      // to maxFrames, not overflow Int and go negative
      val n = math.min(maxFrames.toLong, math.max(1L, durationMs / intervalMs)).toInt
      (0 until n).map(i => sampleOne(a, i, i * intervalMs))
    }
  }

  private def sampleOne(a: Asset, idx: Int, tsMs: Long): Frame = {
    // stub seek+decode+resize: an 8-byte deterministic "thumbnail"
    val crc = new java.util.zip.CRC32()
    crc.update(a.payload)
    crc.update(idx)
    val v = crc.getValue
    Frame(a.doc_id, idx, tsMs,
      (0 until 8).map(b => ((v >> (8 * (b % 8))) & 0xff).toByte).toArray)
  }

  /** Stub feature-extraction to a fixed-dim embedding — the REAL part
    * is the output schema (`Array[Float]` of `dim`, unit-normalized),
    * which is exactly what the ANN operators consume downstream; swap
    * the hash-fold for a model call and the pipeline is unchanged.
    */
  def extractEmbeddings(ds: Dataset[Asset], dim: Int = 16)
      : Dataset[(Long, Array[Float])] = {
    implicit val enc: Encoder[(Long, Array[Float])] =
      ExpressionEncoder[(Long, Array[Float])]()
    ds.mapPartitions { it =>
      it.map { a =>
        val raw = Array.tabulate(dim) { d =>
          val crc = new java.util.zip.CRC32()
          crc.update(a.payload)
          crc.update(d)
          ((crc.getValue % 2000L) - 1000L).toFloat / 1000.0f
        }
        val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
        (a.doc_id, raw.map(x => if (norm == 0) 0.0f else x / norm))
      }
    }
  }
}
