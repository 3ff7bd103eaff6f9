package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Fixed-point second-moment accumulator for distributed PCA
  * (SURVEY.md LLM-ops family: embedding whitening / dimensionality
  * reduction — the standard pre-step before IVF/PQ quantizer
  * training).
  *
  * State layout (one flat long[]): `[n, Σq(v_0)…Σq(v_{d-1}),
  * Σq(v_i·v_j) upper-triangle row-major]` where `q(x) =
  * floor(x·2²⁰)` — the k-means fixed-point discipline
  * (Similarity.kmeansAssign): every per-row term is quantized BEFORE
  * summation, so the aggregate is pure long addition — exactly
  * associative/commutative, bit-identical on any partition layout,
  * merge-safe for map-side partials. Buffer size is 1 + d + d(d+1)/2
  * longs (d=64 ⇒ 2 145 · 8 B ≈ 17 KB) — constant in the corpus, so
  * the shuffle carries one buffer per partition and the driver holds
  * exactly one.
  *
  * Quantization error: ≤ 2⁻²⁰ per term per row, so each moment is off
  * by at most n·2⁻²⁰ before normalization — ~1e-6 relative for unit
  * vectors, far below the covariance eigengap the consumers (PCA
  * projection, whitening) resolve.
  *
  * The zero buffer is the empty array; the first row sizes it. Mixed
  * dimensionalities are a hard error — a silent truncation would
  * corrupt the covariance with no signal.
  */
object GramAgg extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
  final val Scale = 1048576.0 // 2^20

  private def q(x: Double): Long = math.floor(x * Scale).toLong

  override def zero: Array[Long] = Array.emptyLongArray

  private def dimOf(len: Int): Int = {
    // len = 1 + d + d(d+1)/2 ⇒ d = (-3 + sqrt(9 + 8(len-1))) / 2
    val d = ((math.sqrt(9.0 + 8.0 * (len - 1)) - 3.0) / 2.0).round.toInt
    require(1 + d + d * (d + 1) / 2 == len, s"corrupt Gram buffer length $len")
    d
  }

  override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
    val d = v.length
    val buf = if (b.length == 0) new Array[Long](1 + d + d * (d + 1) / 2) else b
    require(dimOf(buf.length) == d,
      s"embedding dim $d != accumulator dim ${dimOf(buf.length)}")
    buf(0) += 1L
    var i = 0
    var t = 1 + d
    while (i < d) {
      val vi = v(i).toDouble
      buf(1 + i) += q(vi)
      var j = i
      while (j < d) {
        buf(t) += q(vi * v(j))
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      require(x.length == y.length,
        s"merging Gram buffers of different dims: ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExactLongArray.enc
  override def outputEncoder: Encoder[Array[Long]] = ExactLongArray.enc
}

private object ExactLongArray {
  val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
