package graft.multimodal

/** Multimodal column model (SURVEY.md §2.K `multimodal_cols`).
  *
  * Images/audio/video ride through the engine as opaque `binary`
  * payloads with typed metadata structs. The decode step would call a
  * codec library (absent in this container) — [[MediaCodec.decode]]
  * is therefore a clearly-marked STUB producing deterministic fake
  * features, while everything around it (schema, typed Dataset
  * plumbing, per-partition batched execution, feature schema) is real
  * and oracle-tested.
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], lang: String)

final case class MediaFeatures(
    doc_id: Long, n_bytes: Int, n_a: Int, n_space: Int, head_codepoint: Int)

/** One sampled "frame" of a media payload (video frame-sampling
  * stand-in): the payload split into fixed chunk rows. */
final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int, frame_md5: String)

object MediaCodec {
  /** STUB frame sampler: a real implementation would decode the video
    * container and emit every k-th frame; the fake splits the decoded
    * payload into `n` contiguous chunks. The 1→N flatMap shape (one
    * input row, n frame rows, executed per partition batch) is the
    * real contract. */
  def sampleFrames(r: MediaRecord, n: Int): Seq[MediaFrame] = {
    val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    val len = text.length
    (0 until n).map { i =>
      val from = i * len / n
      val until = (i + 1) * len / n
      val chunk = text.substring(from, until)
      MediaFrame(r.doc_id, i, chunk.length,
        md5Hex(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** STUB resize: a real implementation would bilinear-resample the
    * decoded image; the fake takes `k` evenly spaced code points —
    * same fixed-width-output contract. */
  def resize(r: MediaRecord, k: Int): (Long, Seq[Int]) = {
    require(k >= 2, s"resize width must be >= 2 (got $k)")
    val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    val n = text.length
    val pts =
      if (n == 0) Seq.fill(k)(-1)
      else (0 until k).map(i => text.charAt(i * (n - 1) / (k - 1)).toInt)
    (r.doc_id, pts)
  }
  /** Perceptual average-hash over the stub-resized "pixels" — the
    * aHash structure real image dedup runs (resize to a fixed grid,
    * threshold each cell against the grid mean, pack the sign bits;
    * pHash swaps the mean threshold for a DCT, same 64-bit contract):
    * bit i is set iff pixel_i · 64 > Σpixels — integer-exact, so the
    * oracle can restate it without float drift. Only the pixel SOURCE
    * is stubbed (sampled code points instead of decoded luma). */
  def ahash64(pixels: Seq[Int]): Long = {
    val s = pixels.foldLeft(0L)(_ + _)
    pixels.iterator.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      if (p * 64L > s) acc | (1L << i) else acc
    }
  }

  /** STUB decode: a real implementation would decode the image/audio
    * payload and emit model features. The fake is deterministic and
    * cheap: byte statistics standing in for decoded features. The
    * signature (bytes in, fixed-width features out, called once per
    * row inside a partition batch) is the real contract. */
  def decode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var nA = 0
    var nSpace = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 'a'.toByte) nA += 1
      if (bytes(i) == ' '.toByte) nSpace += 1
      i += 1
    }
    // Head "feature" is the first Unicode code point of the decoded
    // payload (not the raw signed byte — that would diverge from any
    // text-level recomputation on non-ASCII data), -1 when empty.
    MediaFeatures(r.doc_id, bytes.length, nA, nSpace,
      if (bytes.isEmpty) -1
      else new String(bytes, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0))
  }
}
