package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Multimodal-column processing (BASELINE north star): treat
  * image/audio/video as opaque `binary` payloads with typed metadata,
  * decoded in fixed-size batches per partition — the Scala analog of a
  * `mapInPandas` batch UDF, and the one place `mapPartitions` is the
  * right tool (imperative per-batch work a codec library would do).
  *
  * [[decodeMedia]] is a REAL decoder for two self-describing formats
  * a container without codec libraries can still carry end-to-end:
  * binary PPM (P6) images — header parsing incl. `#` comments, exact
  * integer luminance accumulation — and RIFF/PCM16 WAV audio — chunk
  * walking (unknown chunks skipped), sample-rate/duration extraction,
  * RMS amplitude. Heavier codecs (JPEG/MP4) would slot behind the
  * same sniff-and-dispatch without touching the Spark plumbing:
  * typed schema, bounded per-partition batches (`batchSize` assets in
  * flight), shuffle-free one-row-per-asset shape.
  *
  * [[decodeFeatures]]/[[frameSample]]/[[extractEmbeddings]] remain
  * the format-agnostic byte-feature paths (checksums, stub thumbs /
  * hash embeddings standing in for model calls).
  */
object Multimodal {

  // ---- real codecs: PPM (P6) images, RIFF/PCM16 WAV audio ---------

  /** Decoded-media row: one per asset; image fields zero for audio
    * and vice versa. `mean_level` = mean Rec.709 luminance (image) /
    * RMS sample amplitude (audio) — both from exact integer sums, so
    * results are partition-order independent.
    */
  case class Media(doc_id: Long, kind: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, duration_ms: Long, mean_level: Double)

  private implicit val mediaEnc: Encoder[Media] = ExpressionEncoder[Media]()

  /** Binary PPM writer (P6): ASCII header + RGB payload. */
  def encodePpm(width: Int, height: Int, maxval: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"P6 payload must be w*h*3 = ${width * height * 3} bytes, got ${pixels.length}")
    require(maxval > 0 && maxval < 65536, s"bad maxval $maxval")
    s"P6\n$width $height\n$maxval\n".getBytes("US-ASCII") ++ pixels
  }

  case class PpmImage(width: Int, height: Int, maxval: Int, meanLuma: Double)

  /** Binary PPM (P6) parser: whitespace/`#`-comment tolerant header,
    * strict payload length, mean Rec.709 luminance from an exact
    * integer sum (2126 r + 7152 g + 722 b per pixel, /10000 once).
    */
  /** Header scan shared by decode and resize: (w, h, maxval,
    * payload offset), strict payload-length check.
    */
  private def ppmHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (i < bytes.length && isWs(bytes(i))) i += 1
        if (i < bytes.length && bytes(i) == '#')
          while (i < bytes.length && bytes(i) != '\n') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"PPM: expected integer at byte $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(i < bytes.length && isWs(bytes(i)), "PPM: missing payload separator")
    i += 1 // exactly ONE whitespace byte before the payload (spec)
    require(bytes.length - i == w * h * 3,
      s"PPM: payload ${bytes.length - i} bytes, expected ${w * h * 3}")
    (w, h, maxval, i)
  }

  def decodePpm(bytes: Array[Byte]): PpmImage = {
    val (w, h, maxval, off) = ppmHeader(bytes)
    var lumaSum = 0L
    var p = off
    while (p < bytes.length) {
      lumaSum += 2126L * (bytes(p) & 0xff) + 7152L * (bytes(p + 1) & 0xff) +
        722L * (bytes(p + 2) & 0xff)
      p += 3
    }
    PpmImage(w, h, maxval, lumaSum / (10000.0 * w * h))
  }

  /** Nearest-neighbor P6 resize: destination pixel (X, Y) samples the
    * source at (X·w div newW, Y·h div newH) — pure integer sampling,
    * so the resized payload is bit-reproducible on any engine (the
    * closed-form oracle in pipe_image_resize recomputes every byte).
    */
  def resizePpm(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, s"bad resize target ${newW}x$newH")
    val (w, h, maxval, off) = ppmHeader(bytes)
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val sx = x * w / newW
        val s = off + (sy * w + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = bytes(s); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s + 2)
        x += 1
      }
      y += 1
    }
    encodePpm(newW, newH, maxval, out)
  }

  /** Minimal YUV4MPEG2 (y4m) writer, Cmono colorspace: the plain-text
    * stream header, then `FRAME\n` + one w·h luma plane per frame —
    * the public fixed-rate uncompressed video container (mjpegtools
    * y4m spec), trivial to parse and exact to verify.
    */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, "bad y4m dims")
    frames.foreach(f => require(f.length == width * height,
      s"y4m mono frame must be w*h = ${width * height} bytes, got ${f.length}"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n"
      .getBytes("US-ASCII"))
    frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }

  case class Y4mVideo(width: Int, height: Int, nFrames: Int,
      sampledFrames: Seq[Int], frameLumaSums: Seq[Long])

  /** y4m reader + every-k-th frame sampler: parses the stream header
    * (tag-tolerant — unknown parameters skip; only Cmono payloads are
    * accepted, loud failure otherwise), walks FRAME markers (frame
    * parameters after `FRAME` skip to the newline), keeps frames
    * 0, k, 2k, …, and returns each KEPT frame's exact integer luma
    * sum — the frame-sampling decimation a video training pipeline
    * runs before feature extraction.
    */
  def sampleY4mFrames(bytes: Array[Byte], k: Int): Y4mVideo = {
    require(k >= 1, s"bad sampling stride $k")
    var i = 0
    def readLine(): String = {
      val start = i
      while (i < bytes.length && bytes(i) != '\n') i += 1
      require(i < bytes.length, "y4m: unterminated header line")
      i += 1
      new String(bytes, start, i - 1 - start, "US-ASCII")
    }
    val header = readLine()
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    var (w, h) = (0, 0)
    var cs = "420jpeg" // the spec default when no C tag is present
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.charAt(0) match {
        case 'W' => w = tag.substring(1).toInt
        case 'H' => h = tag.substring(1).toInt
        case 'C' => cs = tag.substring(1)
        case _ => () // F/I/A/X parameters don't affect the payload walk
      }
    }
    require(w > 0 && h > 0, s"y4m: missing W/H in '$header'")
    require(cs == "mono", s"y4m: only Cmono supported here, got C$cs")
    val frameBytes = w * h
    val sampled = Seq.newBuilder[Int]
    val sums = Seq.newBuilder[Long]
    var n = 0
    while (i < bytes.length) {
      val marker = readLine()
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"y4m: expected FRAME marker, got '$marker'")
      require(bytes.length - i >= frameBytes, "y4m: truncated frame payload")
      if (n % k == 0) {
        var s = 0L
        var p = i
        val end = i + frameBytes
        while (p < end) { s += (bytes(p) & 0xff); p += 1 }
        sampled += n
        sums += s
      }
      i += frameBytes
      n += 1
    }
    Y4mVideo(w, h, n, sampled.result(), sums.result())
  }

  /** Canonical RIFF/WAVE writer: PCM16, little-endian. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "bad WAV params")
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  case class WavAudio(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, durationMs: Long, rms: Double)

  /** Chunk-walk core shared by [[decodeWav]] and [[decodeWavSamples]]:
    * (channels, sampleRate, bits, byteRate, dataOffset, dataLen, buf).
    */
  private def wavInfo(bytes: Array[Byte])
      : (Int, Int, Int, Int, Int, Int, java.nio.ByteBuffer) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 44, "WAV: too short")
    require(fourcc() == "RIFF", "not a RIFF file")
    bb.getInt // riff size (trust chunk walk, not this)
    require(fourcc() == "WAVE", "not a WAVE file")
    var channels = -1; var sampleRate = -1; var bits = -1; var byteRate = -1
    var dataOff = -1; var dataLen = -1
    while (bb.remaining() >= 8 && dataOff < 0) {
      val id = fourcc(); val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(), s"WAV: bad chunk size $size for '$id'")
      id match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"WAV: only PCM supported, got format $audioFormat")
          channels = bb.getShort
          sampleRate = bb.getInt
          byteRate = bb.getInt
          bb.getShort // block align
          bits = bb.getShort
          require(bits == 16, s"WAV: only 16-bit PCM supported, got $bits")
          bb.position(fmtStart + size + (size & 1))
        case "data" =>
          dataOff = bb.position(); dataLen = size
        case _ => // unknown chunk: skip (size + pad byte if odd)
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(channels > 0 && sampleRate > 0, "WAV: no fmt chunk before data")
    require(dataOff >= 0, "WAV: no data chunk")
    (channels, sampleRate, bits, byteRate, dataOff, dataLen, bb)
  }

  /** RIFF/WAVE parser: walks chunks (skipping unknown ones, honoring
    * odd-size padding) to `fmt ` + `data`; PCM16 only. Duration from
    * byte rate; RMS from an exact Σ s² integer sum.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val (channels, sampleRate, bits, byteRate, dataOff, dataLen, bb) = wavInfo(bytes)
    val nSamples = dataLen / 2
    var sqSum = 0L // max 2^31 samples * (2^15)^2 < 2^62 — no overflow
    var i = 0
    while (i < nSamples) {
      val s = bb.getShort(dataOff + 2 * i).toLong
      sqSum += s * s
      i += 1
    }
    val nFrames = nSamples / channels
    WavAudio(channels, sampleRate, bits, nFrames,
      dataLen.toLong * 1000L / byteRate,
      if (nSamples == 0) 0.0 else math.sqrt(sqSum.toDouble / nSamples))
  }

  /** Decode header AND raw PCM16 samples (interleaved if stereo). */
  def decodeWavSamples(bytes: Array[Byte]): (WavAudio, Array[Short]) = {
    val au = decodeWav(bytes)
    val (_, _, _, _, dataOff, dataLen, bb) = wavInfo(bytes)
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
    (au, out)
  }

  /** Per-asset windowed audio features: one full `windowMs` window at
    * a time (trailing partial window dropped), per window the RMS
    * (exact integer square sums) and the zero-crossing RATE
    * (sign-change count / (window−1) — the classic voicing/noisiness
    * feature). Returns per-asset window count and window-mean values —
    * real DSP replacing the hash-stub feature path for audio.
    */
  case class AudioWindows(doc_id: Long, n_windows: Int,
      rms_mean: Double, zcr_mean: Double)

  private implicit val audioWinEnc: Encoder[AudioWindows] =
    ExpressionEncoder[AudioWindows]()

  def audioWindowFeatures(ds: Dataset[(Long, Array[Byte])], windowMs: Int,
      batchSize: Int = 64): Dataset[AudioWindows] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        val (au, samples) = decodeWavSamples(bytes)
        val win = math.max(1, au.sampleRate * au.channels * windowMs / 1000)
        val nW = samples.length / win
        var rmsSum = 0.0
        var zcrSum = 0.0
        var w = 0
        while (w < nW) {
          var sq = 0L
          var crossings = 0
          var i = w * win
          val end = i + win
          var prev = 0
          var first = true
          while (i < end) {
            val s = samples(i).toInt
            sq += s.toLong * s
            if (!first && (s < 0) != (prev < 0) && s != 0 && prev != 0)
              crossings += 1
            if (s != 0) { prev = s; first = false }
            i += 1
          }
          rmsSum += math.sqrt(sq.toDouble / win)
          zcrSum += (if (win > 1) crossings.toDouble / (win - 1) else 0.0)
          w += 1
        }
        AudioWindows(id, nW,
          if (nW == 0) 0.0 else rmsSum / nW,
          if (nW == 0) 0.0 else zcrSum / nW)
      })
    }
  }

  /** Sniff-and-dispatch single-asset decode: P6 magic → PPM, RIFF →
    * WAV. Loud failure on anything else — silent skips would hide
    * corrupt corpus shards.
    */
  def decodeOne(id: Long, bytes: Array[Byte]): Media =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
      val img = decodePpm(bytes)
      Media(id, "image", img.width, img.height, 0, 0, 0L, img.meanLuma)
    } else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') {
      val au = decodeWav(bytes)
      Media(id, "audio", 0, 0, au.channels, au.sampleRate, au.durationMs, au.rms)
    } else throw new IllegalArgumentException(
      s"asset $id: unrecognized payload (${bytes.take(4).mkString(",")}…)")

  /** Batched media decode over (id, payload) rows: the same bounded
    * per-partition batch shape as [[decodeFeatures]], with the real
    * codecs doing the per-batch work.
    */
  def decodeMedia(ds: Dataset[(Long, Array[Byte])], batchSize: Int = 64): Dataset[Media] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { case (id, bytes) => decodeOne(id, bytes) })
    }

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
