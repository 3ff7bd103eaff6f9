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

object MediaCodec {
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
