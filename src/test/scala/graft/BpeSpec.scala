package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** Determinism + correctness of the in-engine BPE tokenizer
  * (tokenize_bpe / pack_sequences_bpe — VERDICT r6 #2). */
class BpeSpec extends SparkSpec {

  // the classic Sennrich et al. toy corpus — merge order is hand-derivable
  private val toy = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("known-answer: merge order on the classic toy corpus") {
    // pair counts round 1: es=9, st=9, we=8, lo=7, ow=7, ne=6, ew=6,
    // er=2, wi=3, id=3, de=3 → (e,s) wins the 9-tie lexicographically;
    // round 2: (es,t)=9; round 3: (l,o)=7 beats (o,w) lexicographically
    val merges = Bpe.train(toy, 3)
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o")), merges)
  }

  test("training is deterministic and stops when fully merged") {
    val a = Bpe.train(toy, 1000)
    val b = Bpe.train(toy.reverse, 1000)
    assert(a == b, "input order changed the learned merges")
    // 4 words over a shared alphabet fully merge long before 1000
    assert(a.length < 40, s"merge loop failed to terminate early: ${a.length}")
    val rank = a.zipWithIndex.toMap
    for ((w, _) <- toy) assert(Bpe.encode(w, rank) == Vector(w))
  }

  test("encode is lossless (concat round-trip) and handles OOV symbols") {
    val rank = Bpe.train(toy, 3).zipWithIndex.toMap
    for (w <- Seq("low", "lowest", "xyz", "wildest", "a", ""))
      assert(Bpe.encode(w, rank).mkString == w)
    // characters never seen in training are their own tokens
    assert(Bpe.encode("xyz", rank) == Vector("x", "y", "z"))
  }

  test("tokenize_bpe: corpus-trained counts are consistent and lossless") {
    val rows = SparkEntry.queries("tokenize_bpe")(spark, sf001).collect()
    assert(rows.length == graft.core.Tables.documents(spark, sf001).count())
    // every word is >= 1 token, so bpe_tokens >= ws_tokens; fertility >= 1
    assert(rows.forall(r => r.getLong(2) >= r.getInt(1).toLong))
    assert(rows.forall(r => r.getDouble(3) >= 1.0))
    // driver-side recomputation of the whole operator: encode every doc
    // with the same learned merges and compare counts exactly
    val rank = graft.operators.TextOps.bpeMerges(spark, sf001).zipWithIndex.toMap
    val docs = graft.core.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val expected = docs(r.getLong(0)).split(" ", -1)
        .map(w => Bpe.encode(w, rank).length.toLong).sum
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: spark ${r.getLong(2)} vs driver $expected")
    }
  }

  test("frozen merge artifact encodes byte-identically to the in-memory table") {
    val live = graft.operators.TextOps.bpeMerges(spark, sf001)
    val frozen = graft.operators.TextOps.bpeMergesFrozen(spark, sf001)
    assert(frozen == live, "persisted merge table drifted from the trained one")
    val liveRank = live.zipWithIndex.toMap
    val frozenRank = frozen.zipWithIndex.toMap
    // corpus words + OOV with characters outside the learned alphabet
    // (byte-fallback: they must encode as single-char tokens, lossless)
    val corpus = graft.core.Tables.documents(spark, sf001)
      .select("text").collect().flatMap(_.getString(0).split(" ", -1)).distinct
    for (w <- corpus ++ Seq("naïve", "Σσ", "zzzqqq", "")) {
      val a = Bpe.encode(w, liveRank)
      val b = Bpe.encode(w, frozenRank)
      assert(a == b, s"'$w': live $a vs frozen $b")
      assert(b.mkString == w, s"'$w' not lossless: $b")
    }
  }

  test("tokenize_bpe_frozen covers exactly the held-out slice with live-table counts") {
    val rows = SparkEntry.queries("tokenize_bpe_frozen")(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 5 == 0), "encoded a training-split doc")
    val rank = graft.operators.TextOps.bpeMerges(spark, sf001).zipWithIndex.toMap
    val docs = graft.core.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val expected = docs(r.getLong(0)).split(" ", -1)
        .map(w => Bpe.encode(w, rank).length.toLong).sum
      assert(r.getLong(2) == expected)
    }
  }

  test("byte-level BPE: pretokenizer partitions, round-trip lossless on multi-script text") {
    val samples = Seq(
      "Hello, world! It's fine.",
      "naïve café — résumé",
      "мир и παράδειγμα",              // cyrillic + greek
      "日本語のテキストです。",            // CJK
      "emoji 🌍 mixed 123 tabs\tand\nnewlines  ",
      "",
      "   leading and trailing   ")
    for (t <- samples) {
      val toks = Bpe.pretokenize(t)
      // the regex alternatives partition the string
      assert(toks.mkString == t, s"pretokenize dropped chars on '$t'")
    }
    // round-trip through encode/decode, with NO merges (pure bytes)
    // and with corpus-trained merges — both must be exact inverses
    val trained = graft.operators.TextOps.bpeBytesMerges(spark, sf001)
      .zipWithIndex.toMap
    for (t <- samples; rank <- Seq(Map.empty[(String, String), Int], trained)) {
      val toks = Bpe.pretokenize(t).flatMap(p => Bpe.encodeBytes(p, rank))
      assert(Bpe.decodeBytes(toks) == t, s"round trip failed on '$t'")
    }
    // empty rank ⇒ token count is exactly the UTF-8 byte count
    for (t <- samples) {
      val n = Bpe.pretokenize(t)
        .map(p => Bpe.encodeBytes(p, Map.empty).length).sum
      assert(n == t.getBytes("UTF-8").length, s"byte identity failed on '$t'")
    }
  }

  test("trainBytes is deterministic; tokenize_bpe_bytes compares fertilities consistently") {
    val toyTok = Seq(" low" -> 5L, " lower" -> 2L, " newest" -> 6L, " widest" -> 3L)
    assert(Bpe.trainBytes(toyTok, 16) == Bpe.trainBytes(toyTok.reverse, 16),
      "input order changed the learned byte merges")
    val rows = SparkEntry.queries("tokenize_bpe_bytes")(spark, sf001).collect()
    assert(rows.length == graft.core.Tables.documents(spark, sf001).count())
    val rank = graft.operators.TextOps.bpeBytesMerges(spark, sf001).zipWithIndex.toMap
    val docs = graft.core.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val text = docs(r.getLong(0))
      // n_bytes is the UTF-8 length; byte tokens never exceed it and
      // merges compress below it on a trained corpus
      assert(r.getInt(1) == text.getBytes("UTF-8").length)
      val expected = Bpe.pretokenize(text)
        .map(p => Bpe.encodeBytes(p, rank).length.toLong).sum
      assert(r.getLong(4) == expected,
        s"doc ${r.getLong(0)}: spark ${r.getLong(4)} vs driver $expected")
      assert(r.getLong(4) <= r.getInt(1).toLong)
    }
    // the corpus is ASCII word soup: trained byte merges must compress
    // meaningfully below raw bytes overall
    val totalBytes = rows.map(_.getInt(1).toLong).sum
    val totalTok = rows.map(_.getLong(4)).sum
    assert(totalTok * 2 < totalBytes,
      s"byte BPE failed to compress: $totalTok tokens over $totalBytes bytes")
  }

  test("frozen byte-level artifact: persisted merges == trained; held-out encode matches") {
    val live = graft.operators.TextOps.bpeBytesMerges(spark, sf001)
    val frozen = graft.operators.TextOps.bpeBytesMergesFrozen(spark, sf001)
    assert(frozen == live, "persisted byte merge table drifted from the trained one")
    val rows = SparkEntry.queries("tokenize_bpe_bytes_frozen")(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 5 == 0), "encoded a training-split doc")
    val rank = live.zipWithIndex.toMap
    val docs = graft.core.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val text = docs(r.getLong(0))
      assert(r.getInt(1) == text.getBytes("UTF-8").length)
      val expected = Bpe.pretokenize(text)
        .map(p => Bpe.encodeBytes(p, rank).length.toLong).sum
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: frozen-encode ${r.getLong(2)} vs driver $expected")
    }
  }

  test("pack_sequences_bpe: placement invariants hold per shard") {
    val rows = SparkEntry.queries("pack_sequences_bpe")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    for ((_, shardRows) <- rows.groupBy(_._2)) {
      val ordered = shardRows.sortBy(_._1)
      // prefix-sum contiguity: each doc starts where the previous ended
      ordered.foldLeft(0L) { case (expectedStart, (id, _, n, start, seq, off)) =>
        assert(start == expectedStart, s"doc $id starts at $start, want $expectedStart")
        assert(seq == start / 2048 && off == start % 2048)
        start + n
      }
    }
  }
  test("unigram: lossless round-trip, Viterbi optimality, bounded deterministic vocab") {
    import graft.functions.{Bpe, Unigram}
    import graft.operators.TextOps
    val vocab = TextOps.unigramVocab(spark, sf001)
    // bounds: <= 512 pieces + full single-char coverage of the corpus
    assert(vocab.size <= 512, s"vocab ${vocab.size} > 512")
    val texts = graft.core.Tables.documents(spark, sf001)
      .select("text").collect().map(_.getString(0))
    val chars = texts.flatMap(_.toSeq).toSet
    assert(chars.forall(ch => vocab.contains(ch.toString)),
      "a corpus character is missing from the vocab — coverage broken")
    // lossless: segmentation concatenates back to every pre-token
    for (t <- texts.take(50); tok <- Bpe.pretokenize(t)) {
      val seg = Unigram.segment(tok, vocab)
      assert(seg.mkString == tok, s"lossy segmentation of '$tok': $seg")
    }
    // Viterbi optimality: against brute-force enumeration on short tokens
    def bruteBest(tok: String): Long = {
      if (tok.isEmpty) return 0L
      (1 to math.min(8, tok.length)).iterator.flatMap { k =>
        val piece = tok.substring(0, k)
        val s = vocab.get(piece).orElse(
          if (k == 1) Some(Unigram.UnkScore) else None)
        s.map(_ + bruteBest(tok.substring(k)))
      }.max
    }
    for (tok <- texts.flatMap(Bpe.pretokenize).distinct.filter(_.length <= 10).take(200)) {
      val seg = Unigram.segment(tok, vocab)
      val vit = seg.map(p => vocab.getOrElse(p, Unigram.UnkScore)).sum
      assert(vit == bruteBest(tok),
        s"'$tok': Viterbi $vit != brute ${bruteBest(tok)} (seg $seg)")
    }
    // train determinism: a fresh train on the same table is identical
    val wf = graft.core.Tables.documents(spark, sf001)
      .select(explode(regexp_extract_all(col("text"),
        lit(Bpe.pretokenRegex), lit(0))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok").asc).limit(4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(Unigram.train(wf, 512) == vocab, "retrain diverged")
  }
  test("unigram frozen artifact: encode-only equals live on the held-out slice") {
    import graft.operators.TextOps
    val live = TextOps.unigramVocab(spark, sf001)
    val frozen = spark.read.parquet(TextOps.unigramVocabPath(spark, sf001))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frozen == live, "persisted vocab diverged from the live train")
    val rows = SparkEntry.queries("tokenize_unigram_frozen")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val liveCounts = SparkEntry.queries("tokenize_unigram")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
      .filter(_._1 % 5 == 0).toMap
    assert(rows == liveCounts, "frozen-encode piece counts diverged from live")
  }

  test("wordpiece: round-trip, greedy longest match, [UNK] rule, bounded deterministic vocab") {
    import graft.functions.WordPiece
    import graft.operators.TextOps
    val vocab = TextOps.wordpieceVocab(spark, sf001)
    assert(vocab.size <= 96, s"vocab ${vocab.size} > 96")
    // every piece is well-formed: the bare/## split is structural
    assert(vocab.forall(p => p.nonEmpty && (p == WordPiece.Unk || !p.startsWith("###"))))
    val words = graft.core.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).filter(_.nonEmpty)
    for (w <- words) {
      val enc = WordPiece.encode(w, vocab)
      if (enc == Vector(WordPiece.Unk)) ()
      else {
        // round-trip: pieces concat (## stripped) back to the word
        assert(enc.map(_.stripPrefix("##")).mkString == w,
          s"lossy encode of '$w': $enc")
        // greedy longest-match: at each boundary no LONGER vocab piece
        // matched (the BERT inference rule, not just any segmentation)
        var pos = 0
        for (p <- enc) {
          val plen = p.stripPrefix("##").length
          for (longer <- plen + 1 to w.length - pos) {
            val sub = w.substring(pos, pos + longer)
            val cand = if (pos == 0) sub else s"##$sub"
            assert(!vocab.contains(cand),
              s"'$w' at $pos took '$p' but longer '$cand' is in vocab")
          }
          pos += plen
        }
      }
    }
    // the [UNK] rule: an out-of-alphabet char kills the WHOLE word
    assert(WordPiece.encode("§bogus§", vocab) == Vector(WordPiece.Unk))
    // the '#'-collision rule (ADVICE r12): a literal '#' would be
    // ambiguous with the ## continuation marker, so such words are
    // [UNK] on encode and excluded from training — a trained vocab
    // must never contain a piece with '#' beyond the marker prefix
    assert(WordPiece.encode("a#b", vocab) == Vector(WordPiece.Unk))
    assert(WordPiece.encode("#", vocab) == Vector(WordPiece.Unk))
    val hashVocab = WordPiece.train(
      Seq("a#b" -> 100L, "ab" -> 5L, "ba" -> 3L), 32)
    assert(hashVocab.forall(p => !p.stripPrefix("##").contains('#')),
      s"training leaked a '#' piece: $hashVocab")
    // a word that IS a piece encodes to exactly itself
    val whole = vocab.find(p => !p.startsWith("##") && p.length > 2 && p != WordPiece.Unk)
    whole.foreach(p => assert(WordPiece.encode(p, vocab) == Vector(p)))
    // train determinism on the same bounded table
    val wf = graft.core.Tables.documents(spark, sf001)
      .select(explode(graft.functions.Text.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("word").asc).limit(4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(WordPiece.train(wf, 96) == vocab, "retrain diverged")
  }

  test("wordpiece frozen artifact: encode-only equals live on the held-out slice") {
    import graft.operators.TextOps
    val live = TextOps.wordpieceVocab(spark, sf001)
    val frozen = spark.read.parquet(TextOps.wordpieceVocabPath(spark, sf001))
      .collect().map(_.getString(0)).toSet
    assert(frozen == live, "persisted vocab diverged from the live train")
    val rows = SparkEntry.queries("tokenize_wordpiece_frozen")(spark, sf001)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val liveCounts = SparkEntry.queries("tokenize_wordpiece")(spark, sf001)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3))))
      .filter(_._1 % 5 == 0).toMap
    assert(rows == liveCounts, "frozen-encode counts diverged from live")
  }

  test("tokenize_eval report totals equal the per-doc frozen faces' sums") {
    val report = SparkEntry.queries("tokenize_eval")(spark, sf001)
      .collect().map(r => r.getAs[String]("family") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("unk_words"))).toMap
    assert(report.keySet ==
      Set("bpe_word", "bpe_byte", "unigram_lm", "wordpiece"))
    // no-drift: the one-report numbers must be exactly the sums of the
    // standalone frozen faces over the same held-out slice
    def sumCol(q: String, c: String): Long =
      SparkEntry.queries(q)(spark, sf001).collect()
        .map(_.getAs[Long](c)).sum
    assert(report("bpe_word")._1 == sumCol("tokenize_bpe_frozen", "bpe_tokens"))
    assert(report("bpe_byte")._1 ==
      sumCol("tokenize_bpe_bytes_frozen", "bpe_byte_tokens"))
    assert(report("unigram_lm")._1 ==
      sumCol("tokenize_unigram_frozen", "uni_pieces"))
    assert(report("wordpiece")._1 ==
      sumCol("tokenize_wordpiece_frozen", "wp_tokens"))
    assert(report("wordpiece")._2 ==
      sumCol("tokenize_wordpiece_frozen", "n_unk_words"))
    // structural facts: byte BPE cannot UNK; every family tokenizes
    assert(report("bpe_byte")._2 == 0L)
    assert(report.values.forall(_._1 > 0L))
  }
}
