package graft

import org.apache.spark.sql.functions._

/** Accuracy + determinism properties of the learned quality gate
  * (text_quality_model is declared no-oracle — these are its gate). */
class QualityModelSpec extends SparkSpec {

  test("text_quality_model beats the majority class on the content-hash holdout") {
    val rows = SparkEntry.queries("text_quality_model")(spark, sf001).collect()
    assert(rows.length == graft.core.Tables.documents(spark, sf001).count())
    val holdout = rows.filter(_.getString(4) == "holdout")
    assert(holdout.length >= 15, s"holdout too small: ${holdout.length}")
    val correct = holdout.count(r => r.getInt(2) == r.getInt(3))
    val acc = correct.toDouble / holdout.length
    val majority = {
      val pos = holdout.count(_.getInt(3) == 1)
      math.max(pos, holdout.length - pos).toDouble / holdout.length
    }
    assert(acc >= majority,
      s"holdout accuracy $acc below majority baseline $majority")
    assert(acc >= 0.75, s"holdout accuracy $acc below floor 0.75")
    // train-split accuracy sanity: the model actually fit something
    val tr = rows.filter(_.getString(4) == "train")
    val trAcc = tr.count(r => r.getInt(2) == r.getInt(3)).toDouble / tr.length
    assert(trAcc >= 0.8, s"train accuracy $trAcc — model failed to fit")
  }

  test("training is bit-deterministic across partition layouts (fixed-point grads)") {
    import graft.operators.QualityModel
    val feat = QualityModel.featurized(spark, sf001)
    val w1 = QualityModel.train(feat)
    val w2 = QualityModel.train(feat.repartition(7))
    val w3 = QualityModel.train(feat.coalesce(1))
    assert(w1.sameElements(w2) && w1.sameElements(w3),
      "learned weights differ across partition layouts")
  }
}
