package graft.functions

import scala.collection.mutable

/** Unigram-LM tokenizer (the SentencePiece family — Kudo 2018,
  * public) in bounded miniature — the THIRD production tokenizer
  * discipline next to word-internal BPE ([[Bpe.train]]) and
  * byte-level BPE ([[Bpe.trainBytes]]): instead of greedy merges, a
  * piece VOCABULARY with log-prob scores is learned by EM and pruning,
  * and encoding segments each pre-token by Viterbi (the max-likelihood
  * segmentation), which BPE's greedy merge order can miss.
  *
  * Determinism discipline (the engine's fixed-point rule): scores are
  * QUANTIZED integer log-probs (StrictMath.log × 2^20, rounded — the
  * quantized-ln convention of the perplexity family), Viterbi sums
  * longs, and every tie has a declared total order, so training and
  * segmentation are bit-reproducible on any platform or layout.
  * Training is hard-EM (Viterbi E-step, count M-step, bottom-quartile
  * pruning) over a BOUNDED (word, freq) table — the same
  * driver-bounded-state contract as the BPE trainers: state is the
  * ≤4096-row word table and a ≤~8k-piece vocab, never the corpus.
  */
object Unigram {

  private val Quant = 1L << 20
  /** Floor score for out-of-vocab single characters at encode time —
    * worse than any trained piece (ln of ~e^-40), so unknowns never
    * displace learned pieces but any text still segments. */
  val UnkScore: Long = -40L * Quant

  private def qln(x: Double): Long =
    math.round(StrictMath.log(x) * Quant)

  /** Viterbi segmentation of one word under quantized piece scores:
    * maximize the score sum; ties prefer FEWER pieces, then the
    * longer final piece (deterministic total order). Characters
    * absent from the vocab fall back to [[UnkScore]] singletons. */
  def segment(word: String, vocab: Map[String, Long]): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val maxLen = 8
    // dp(i): (score, nPieces, lastPieceStart) for best segmentation of [0, i)
    val score = Array.fill(n + 1)(Long.MinValue)
    val pieces = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0L; pieces(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val s = vocab.get(piece) match {
            case Some(q) => Some(q)
            case None => if (i - j == 1) Some(UnkScore) else None
          }
          s.foreach { q =>
            val cand = score(j) + q
            val candPieces = pieces(j) + 1
            // better score; or equal score and fewer pieces; or equal
            // both and longer final piece (smaller j)
            val better = cand > score(i) ||
              (cand == score(i) && (candPieces < pieces(i) ||
                (candPieces == pieces(i) && j < back(i))))
            if (better) { score(i) = cand; pieces(i) = candPieces; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { out.prepend(word.substring(back(p), p)); p = back(p) }
    out.toVector
  }

  /** Hard-EM training over a bounded (word, freq) table → quantized
    * (piece, score) vocab of at most `targetVocab` pieces. Seed: every
    * substring of length ≤ 6 among the top pieces by occurrence
    * frequency (capped at 8·targetVocab) plus ALL single characters
    * (kept unprunable — they guarantee coverage). Each round: Viterbi
    * E-step under current scores, count M-step (score = quantized
    * ln(count/total)), then prune the lowest-scoring quartile of
    * multi-char pieces until the target is met. Ties everywhere break
    * lexicographically. */
  def train(wordFreq: Seq[(String, Long)], targetVocab: Int = 512): Map[String, Long] = {
    val words = wordFreq.toVector
    // seed candidates by substring frequency
    val cand = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- words; a <- 0 until w.length;
         b <- (a + 1) to math.min(w.length, a + 6))
      cand(w.substring(a, b)) += f
    val chars = cand.keysIterator.filter(_.length == 1).toVector.sorted
    val seedMulti = cand.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (p, f) => (-f, p) }
      .take(8 * targetVocab).map(_._1)
    var vocabSet: Set[String] = chars.toSet ++ seedMulti
    // initial scores from raw substring frequency
    var scores: Map[String, Long] = {
      val tot = vocabSet.iterator.map(cand(_)).sum.toDouble
      vocabSet.iterator.map(p => p -> qln(cand(p) / tot)).toMap
    }
    var done = false
    while (!done) {
      // E: Viterbi counts under current scores
      val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- words; piece <- segment(w, scores)) counts(piece) += f
      // M: renormalize (unused pieces get a floor count of 0 → pruned)
      val tot = counts.valuesIterator.sum.toDouble
      scores = vocabSet.iterator.map { p =>
        val c = counts(p)
        p -> (if (c == 0) UnkScore else qln(c / tot))
      }.toMap
      val multi = vocabSet.iterator.filter(_.length > 1).toVector
      if (chars.length + multi.length <= targetVocab) done = true
      else {
        // prune the lowest-scoring quartile of multi-char pieces
        val keepN = math.min(multi.length - 1,
          math.max(targetVocab - chars.length, (multi.length * 3) / 4))
        if (keepN <= 0) {
          // degenerate: the single-character alphabet alone meets or
          // exceeds the target. The ≤ targetVocab bound stated at call
          // sites must still hold as tightly as coverage allows, so
          // every multi-char piece is dropped (chars are the coverage
          // floor — Viterbi still segments any input) instead of
          // exiting with the target exceeded (ADVICE r11).
          vocabSet = chars.toSet
          scores = scores.filter { case (p, _) => vocabSet(p) }
          done = true
        }
        else {
          val kept = multi
            .sortBy(p => (-scores(p), p))
            .take(keepN)
          vocabSet = chars.toSet ++ kept
          scores = scores.filter { case (p, _) => vocabSet(p) }
        }
      }
    }
    scores
  }
}
