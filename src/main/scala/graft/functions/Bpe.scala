package graft.functions

import scala.collection.mutable

/** Deterministic byte-pair encoding: train on a word-frequency table,
  * encode with the learned merge ranks (SURVEY.md §2.K token counting,
  * upgraded from the whitespace/regex proxies — VERDICT r6 #2).
  *
  * Both halves are PURE functions over in-memory data. Training runs
  * on the driver over a BOUNDED word-frequency table (top-N words by
  * corpus count — the same "collect a bounded relation for planning"
  * move as the IVF training sample): BPE statistics saturate long
  * before the vocabulary tail matters, and the merge loop is
  * microseconds at that size. Encoding is row-local and rides a UDF
  * with the ≤(nMerges) rank map in its closure — per-row imperative
  * symbol merging has no Catalyst-expression form (the same
  * justification as multimodal_decode's mapPartitions; everything
  * expressible as a Column stays one).
  *
  * Determinism contract (pinned by BpeSpec's known-answer test): pair
  * counts are exact longs; the winning pair maximizes (count, then
  * lexicographically smallest (left, right)); words enter training
  * sorted; encode merges the lowest-rank adjacent pair, all
  * occurrences left-to-right, until none applies. No floats, no hash
  * iteration order, no sampling.
  */
object Bpe {

  type Pair = (String, String)

  /** Merge all occurrences of `pair` in a symbol sequence, scanning
    * left to right (canonical BPE behavior: "aaa" + (a,a) → "aa","a"). */
  def applyMerge(syms: Vector[String], pair: Pair): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to `nMerges` merges from (word, frequency) rows. Stops
    * early when no adjacent pair remains (fully merged vocabulary). */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Vector[Pair] =
    trainOn(wordFreq.toVector.sortBy(_._1)
      .map { case (w, f) => (w.map(_.toString).toVector, f) }, nMerges)

  private def trainOn(words0: Vector[(Vector[String], Long)],
      nMerges: Int): Vector[Pair] = {
    var words = words0
    val merges = Vector.newBuilder[Pair]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = mutable.Map.empty[Pair, Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best), f) }
        round += 1
      }
    }
    merges.result()
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair
    * (all its occurrences) until no learned pair applies. Characters
    * absent from training are their own tokens, so any input encodes. */
  def encode(word: String, rank: Map[Pair, Int]): Vector[String] =
    encodeSyms(word.map(_.toString).toVector, rank)

  private def encodeSyms(syms0: Vector[String], rank: Map[Pair, Int]): Vector[String] = {
    var syms = syms0
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: Pair = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = applyMerge(syms, best)
    }
    syms
  }

  // ---------------------------------------------------------------
  // BYTE-LEVEL BPE (the GPT-2/LLaMA-family discipline): regex
  // pre-tokenization, a 256-symbol byte alphabet mapped to printable
  // unicode stand-ins (so merge tables stay plain strings), full
  // lossless round-trip over ANY input — no unknown token exists.
  // ---------------------------------------------------------------

  /** The GPT-2 pre-tokenizer: contractions, space-prefixed letter and
    * digit runs, space-prefixed punctuation runs, then whitespace
    * (trailing-space lookahead keeps the space that prefixes the next
    * word out of the whitespace run). The alternatives PARTITION the
    * string: every char is a letter, digit, whitespace, or "other",
    * so concatenating the matches reproduces the input verbatim —
    * the property round-trip losslessness rests on. */
  private val Pretok = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")
  val pretokenRegex: String = Pretok.pattern()

  def pretokenize(text: String): Vector[String] = {
    val m = Pretok.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Byte → printable stand-in char (the GPT-2 table: visible latin-1
    * bytes map to themselves, the rest to 256+n in first-free order);
    * bijective, so decode is exact. */
  private val byteToChar: Array[Char] = {
    val visible =
      (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
        .map(_.toInt).toSet
    val arr = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (visible(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }
  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One pre-token → its UTF-8 bytes as single-char symbols. */
  def byteSyms(tok: String): Vector[String] =
    tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toVector.map(b => byteToChar(b & 0xFF).toString)

  /** Learn merges over the byte alphabet from a (pre-token, frequency)
    * table — same loop, same determinism contract as [[train]]. */
  def trainBytes(tokFreq: Seq[(String, Long)], nMerges: Int): Vector[Pair] =
    trainOn(tokFreq.toVector.sortBy(_._1)
      .map { case (t, f) => (byteSyms(t), f) }, nMerges)

  /** Encode one pre-token at the byte level. With an empty rank map
    * this is exactly the UTF-8 byte count — the fallback that makes
    * any input encodable. */
  def encodeBytes(tok: String, rank: Map[Pair, Int]): Vector[String] =
    encodeSyms(byteSyms(tok), rank)

  /** Tokens → bytes → string; exact inverse of pretokenize+encode. */
  def decodeBytes(tokens: Seq[String]): String = {
    val bytes = tokens.iterator.flatMap(_.iterator)
      .map(c => charToByte(c).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
