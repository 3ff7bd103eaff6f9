package graft

import org.apache.spark.sql.functions._

/** Known-answer tests for the LM-perplexity gate: a planted gibberish
  * document (held-out split, unseen vocabulary) must score the
  * highest perplexity in the corpus and be dropped, while a planted
  * copy of a training document scores low. Ids use the 2^40 offset
  * discipline (collision-proof at any fixture scale) and are chosen
  * ≡ 0 (mod 5) so the plants stay OUT of the training split and the
  * vocabulary aggregate. */
class PerplexitySpec extends SparkSpec {

  test("text_perplexity: planted gibberish is ranked worst and dropped; training copy scores low") {
    val sp = spark; import sp.implicits._
    val base = graft.core.Tables.documents(spark, sf001)
    val donor = base.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .orderBy("doc_id").limit(1).select("text").as[String].head()
    val gibId = (1L << 40) + 4 // ≡ 0 (mod 5): held out of training
    val cpId = (1L << 40) + 9
    val gibberish = (0 until 40).map(i => s"zq${i}xv w${i}jq7 plk${i}m").mkString(" ")
    val planted = Seq((gibId, gibberish), (cpId, donor))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ppl").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")

    val out = graft.operators.Perplexity.textPerplexity(spark, tmp)
      .select("doc_id", "avg_nlq", "keep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val (gibNlq, gibKeep) = out(gibId)
    val (cpNlq, _) = out(cpId)
    // gibberish = all-<unk> trigrams unseen in training → worst score
    assert(gibNlq == out.values.map(_._1).max,
      s"gibberish not worst: $gibNlq vs max ${out.values.map(_._1).max}")
    assert(!gibKeep, "gibberish survived the gate")
    assert(cpNlq < gibNlq, s"training copy ($cpNlq) not below gibberish ($gibNlq)")

    // quantize-then-sum ⇒ bit-identical on a different partition layout
    val again = graft.operators.Perplexity.textPerplexity(spark, tmp)
      .select("doc_id", "avg_nlq", "keep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(again == out)
  }
}
