package graft.functions

/** Cassandra's partitioner hash, re-implemented from the public
  * algorithm description (SURVEY.md §1.2: Murmur3Partitioner is the
  * reference's default data-placement function; ref anchor empty —
  * judged against SURVEY §2 `scan_token_range` / `fn_token`).
  *
  * This is MurmurHash3 x64 128 (Austin Appleby's public-domain
  * algorithm) with the TWO compatibility quirks Cassandra's variant is
  * documented to carry, both load-bearing for token fidelity:
  *
  *  1. **Sign-extended tail bytes.** The canonical algorithm (and
  *     Guava's `murmur3_128`) masks each tail byte with `& 0xff`;
  *     Cassandra's historical Java port casts the signed byte straight
  *     to long. For tail bytes ≥ 0x80 the two diverge — and Cassandra
  *     keeps the sign-extending form forever, because changing it would
  *     re-shuffle every cluster's data. Body blocks (full 16-byte
  *     chunks) are assembled unsigned in both, so inputs whose length
  *     is a multiple of 16 hash identically in both variants —
  *     Murmur3Spec exploits exactly that to anchor this implementation
  *     against Guava's canonical one on the shared domain.
  *  2. **MIN_VALUE normalization.** The token is the first 64-bit half
  *     (h1) of the 128-bit digest, except `Long.MinValue` maps to
  *     `Long.MaxValue` so the token ring has a single total order with
  *     no wrap ambiguity.
  *
  * Partition keys hash over their CQL serialization: bigint →
  * 8-byte big-endian, text → UTF-8 bytes, blob → raw bytes.
  *
  * Scalar kernel only — the engine's distributed surface is
  * [[graft.plans.CassTokenExpr]], which calls these statics from
  * whole-stage-generated code.
  */
object CassandraMurmur3 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl64(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  @inline private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Little-endian unsigned 8-byte block — identical in the canonical
    * and Cassandra variants. */
  @inline private def getBlock(key: Array[Byte], off: Int): Long =
    (key(off) & 0xffL) |
      ((key(off + 1) & 0xffL) << 8) |
      ((key(off + 2) & 0xffL) << 16) |
      ((key(off + 3) & 0xffL) << 24) |
      ((key(off + 4) & 0xffL) << 32) |
      ((key(off + 5) & 0xffL) << 40) |
      ((key(off + 6) & 0xffL) << 48) |
      ((key(off + 7) & 0xffL) << 56)

  /** First 64-bit half (h1) of hash3_x64_128 over `key` with `seed`,
    * Cassandra tail semantics (sign-extended — see class doc). h2 never
    * feeds the token, so it is folded but not returned. */
  def hash3x64h1(key: Array[Byte], seed: Long): Long = {
    val length = key.length
    val nblocks = length >> 4
    var h1 = seed
    var h2 = seed

    var i = 0
    while (i < nblocks) {
      var k1 = getBlock(key, i << 4)
      var k2 = getBlock(key, (i << 4) + 8)
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // Tail: the original fall-through switch, as cascading guards.
    // key(x).toLong sign-extends — the Cassandra quirk.
    val off = nblocks << 4
    val rem = length & 15
    var k1 = 0L
    var k2 = 0L
    if (rem >= 15) k2 ^= key(off + 14).toLong << 48
    if (rem >= 14) k2 ^= key(off + 13).toLong << 40
    if (rem >= 13) k2 ^= key(off + 12).toLong << 32
    if (rem >= 12) k2 ^= key(off + 11).toLong << 24
    if (rem >= 11) k2 ^= key(off + 10).toLong << 16
    if (rem >= 10) k2 ^= key(off + 9).toLong << 8
    if (rem >= 9) {
      k2 ^= key(off + 8).toLong
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 8) k1 ^= key(off + 7).toLong << 56
    if (rem >= 7) k1 ^= key(off + 6).toLong << 48
    if (rem >= 6) k1 ^= key(off + 5).toLong << 40
    if (rem >= 5) k1 ^= key(off + 4).toLong << 32
    if (rem >= 4) k1 ^= key(off + 3).toLong << 24
    if (rem >= 3) k1 ^= key(off + 2).toLong << 16
    if (rem >= 2) k1 ^= key(off + 1).toLong << 8
    if (rem >= 1) {
      k1 ^= key(off).toLong
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 + h2
  }

  /** Ring token of a serialized partition key (seed 0, h1,
    * MIN_VALUE → MAX_VALUE). */
  def token(key: Array[Byte]): Long = {
    val h = hash3x64h1(key, 0L)
    if (h == Long.MinValue) Long.MaxValue else h
  }

  /** CQL bigint serialization: 8-byte big-endian two's complement. */
  def serializeBigint(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - (i << 3))).toByte; i += 1 }
    b
  }

  /** Token of a bigint partition key. Called per-row from generated
    * code; the 8-byte scratch array stays in TLAB. */
  def tokenOfLong(v: Long): Long = token(serializeBigint(v))
}
