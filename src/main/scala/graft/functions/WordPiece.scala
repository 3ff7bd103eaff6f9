package graft.functions

import scala.collection.mutable

/** Deterministic WordPiece — the BERT-family tokenizer (Schuster &
  * Nakajima 2012; Wu et al. 2016, public), completing the tokenizer
  * inventory next to word-internal BPE, byte-level BPE, and
  * unigram-LM ([[Bpe]], [[Unigram]]): continuation pieces carry the
  * `##` prefix, TRAINING merges the pair with the highest LIKELIHOOD
  * score freq(xy) / (freq(x) · freq(y)) — the score that
  * distinguishes WordPiece from BPE's raw pair count — and ENCODING
  * is greedy longest-match-first over the learned vocabulary (the
  * fixed inference rule every BERT tokenizer ships, independent of
  * how the vocab was learned).
  *
  * Same contract as the sibling trainers: both halves are pure
  * functions; training runs driver-side over the BOUNDED top-N
  * pre-token frequency table (the planning-relation class), encoding
  * is row-local in a UDF closure over the ≤targetVocab piece set.
  *
  * Determinism (pinned by BpeSpec): the likelihood score is a ratio
  * of exact longs compared CROSS-MULTIPLIED in BigInt — no float
  * enters training — with ties broken by the lexicographically
  * smallest (left, right); words enter sorted; greedy matching is
  * positional. An out-of-alphabet character maps the WHOLE word to
  * `[UNK]`, the BERT rule.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** A literal '#' in a word would collide with the `##` continuation
    * marker (symbols("a#b") would emit "###b"-style pieces, making
    * encode round-trips ambiguous — ADVICE r12). BERT's own rule for
    * characters the convention can't represent applies: the whole
    * word is [UNK], on both the training and the encoding side. */
  private def representable(w: String): Boolean = !w.contains('#')

  /** Initial symbol sequence of a word: first char bare, rest `##`. */
  private def symbols(w: String): Vector[String] =
    w.iterator.zipWithIndex
      .map { case (c, i) => if (i == 0) c.toString else s"##$c" }
      .toVector

  /** Piece concatenation: the right side's continuation marker
    * disappears into the merged piece (`play` + `##ing` → `playing`,
    * `##i` + `##ng` → `##ing`). */
  private def join(l: String, r: String): String = l + r.stripPrefix("##")

  /** Learn a vocabulary of up to `targetVocab` pieces from a (word,
    * frequency) table. The alphabet (bare + `##` single chars) is
    * always included; merges then add one piece per round, chosen by
    * max likelihood freq(xy)/(freq(x)·freq(y)), until the target is
    * reached or nothing is left to merge. */
  def train(wordFreq: Seq[(String, Long)], targetVocab: Int): Set[String] = {
    var words = wordFreq.toVector.sortBy(_._1)
      .filter(wf => wf._1.nonEmpty && representable(wf._1))
      .map { case (w, f) => (symbols(w), f) }
    val vocab = mutable.Set.empty[String]
    words.foreach { case (syms, _) => vocab ++= syms }
    var done = false
    while (vocab.size < targetVocab && !done) {
      val pairCnt = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      val symCnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((syms, f) <- words) {
        syms.foreach(sy => symCnt(sy) += f)
        for (i <- 0 until syms.length - 1)
          pairCnt((syms(i), syms(i + 1))) += f
      }
      if (pairCnt.isEmpty) done = true
      else {
        // argmax of freq(xy)/(freq(x)·freq(y)) without division:
        // compare a/b vs c/d as a·d vs c·b in BigInt (frequencies can
        // reach corpus scale, so the cross product needs >64 bits)
        val best = pairCnt.iterator.map { case (p, n) =>
          (p, BigInt(n), BigInt(symCnt(p._1)) * BigInt(symCnt(p._2)))
        }.reduceLeft { (a, b) =>
          val cmp = (a._2 * b._3).compare(b._2 * a._3)
          if (cmp > 0) a
          else if (cmp < 0) b
          else if (Ordering[(String, String)].lt(a._1, b._1)) a else b
        }._1
        val piece = join(best._1, best._2)
        if (vocab.contains(piece)) {
          // merging would re-create an existing piece (possible when
          // distinct pairs join to the same string): applying it still
          // shrinks the corpus, but to keep one-piece-per-round
          // accounting simple, apply and continue without counting
          words = words.map { case (syms, f) => (applyJoin(syms, best), f) }
        } else {
          vocab += piece
          words = words.map { case (syms, f) => (applyJoin(syms, best), f) }
        }
        if (words.forall(_._1.length <= 1)) done = true
      }
    }
    vocab.toSet
  }

  private def applyJoin(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += join(syms(i), syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy longest-match-first segmentation of one pre-token — the
    * BERT inference rule: at each position take the LONGEST vocab
    * piece (`##`-prefixed after the first), and if no piece matches
    * (an out-of-alphabet character) the whole word becomes [UNK]. */
  def encode(word: String, vocab: Set[String]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    if (!representable(word)) return Vector(Unk)
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val sub = word.substring(start, end)
        val piece = if (start == 0) sub else s"##$sub"
        if (vocab.contains(piece)) found = piece else end -= 1
      }
      if (found == null) return Vector(Unk)
      out += found
      start = end
    }
    out.result()
  }
}
