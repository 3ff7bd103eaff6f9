package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Vectors

/** Similarity search over `embeddings` (SURVEY.md §2.K).
  *
  * Declared no-oracle (float kernels are engine-specific; DuckDB's
  * list_dot_product need not be bit-identical) — the driver does
  * rows-only checks; SimilaritySpec verifies the math (self-sim ≡ 1,
  * brute-force agreement, LSH recall).
  *
  * Scale paths: the brute-force variant broadcasts the (small) query
  * side and streams the corpus — linear, no shuffle; the LSH variant
  * replaces all-pairs with bucket-equality joins.
  */
object Similarity extends QueryGroup {

  private val planes = Vectors.hyperplanes(nbits = 8, dim = 64)
  // Coarser buckets for top-k recall (16 buckets ⇒ ~1/16 of the corpus
  // as candidates); the dedup path keeps 8 bits (exact copies always
  // collide, and smaller candidate sets are cheaper).
  private val topkPlanes = Vectors.hyperplanes(nbits = 4, dim = 64)

  /** Brute-force top-10 cosine neighbors for 5 query vectors. */
  def simTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(Vectors.fdot(col("embedding"), col("qvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "score", "rk")
      .orderBy("query_id", "rk")
  }

  /** All pairs above cosine τ=0.35 within a bounded id range. */
  def simThreshold(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.embeddings(s, dir).filter(col("vec_id") < 300)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = Tables.embeddings(s, dir).filter(col("vec_id") < 300)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(Vectors.fdot(col("va"), col("vb")), 6))
      .filter(col("score") > 0.35)
      .select("id_a", "id_b", "score")
      .orderBy("id_a", "id_b")
  }

  /** LSH-bucketed top-k: candidates share the query's 8-bit
    * sign-random-projection bucket; exact rerank inside the bucket.
    * Approximate by design — recall vs simTopk measured in tests. */
  def simTopkLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .withColumn("bucket", Vectors.lshBucket(col("embedding"), topkPlanes))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    emb.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(Vectors.fdot(col("embedding"), col("qvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "score", "rk")
      .orderBy("query_id", "rk")
  }

  /** Embedding-cosine near-dup detection: exact copies planted with
    * vec_id+100000, found via LSH bucket join + cosine > 0.9 verify
    * (corpus max pairwise cosine is ~0.51 — FIXTURES-measured — so
    * only planted pairs survive). */
  def dedupEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val all = emb.unionByName(planted)
      .withColumn("bucket", Vectors.lshBucket(col("embedding"), planes))
    val a = all.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("bucket"))
    val b = all.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(Vectors.fdot(col("va"), col("vb")), 6))
      .filter(col("score") > 0.9)
      .select("id_a", "id_b", "score")
      .orderBy("id_a", "id_b")
  }

  /** IVF top-k: coarse-quantize the corpus with k-means (16 cells,
    * fixed seed), probe the 5 cells nearest each query, exact rerank
    * inside the probed cells. The 100 TB shape: centroids are tiny and
    * broadcast; the corpus is scanned once to assign cells (a write-
    * once index in practice), and each query touches nprobe/k of the
    * data. Centroid training is floating-point ⇒ declared no-oracle
    * and excluded from the determinism suite. */
  private val ivfIndex =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.ml.clustering.KMeansModel]

  /** Coarse quantizer for [[simTopkIvf]], trained ONCE per (session,
    * corpus) and reused — the in-session stand-in for the offline
    * write-once index build a 100 TB deployment would run. Trains on a
    * seeded 50% sample with 4 Lloyd iterations: centroid quality barely
    * moves after a few iterations on a sample, and the query path
    * reranks exactly inside the probed cells anyway. Sample fraction
    * and nprobe=5/16 are set so every query still fills top-10 on the
    * smallest fixture. */
  private def ivfModel(emb: DataFrame, dir: String) =
    ivfIndex.getOrElseUpdate(dir, {
      import org.apache.spark.ml.clustering.KMeans
      new KMeans().setK(16).setSeed(42).setMaxIter(4)
        // random init: k-means|| costs extra full passes over the
        // sample and Lloyd refinement converges to comparable cells
        .setInitMode("random")
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(emb.sample(withReplacement = false, 0.5, seed = 7))
    })

  def simTopkIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(s, dir)
      .withColumn("fv", array_to_vector(col("embedding")))
    val model = ivfModel(emb, dir)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint()
    val cents = s.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cent_cell", "cent")
    val q = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wCell = Window.partitionBy("query_id")
      .orderBy(col("cent_sim").desc, col("cent_cell").asc)
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("cent_sim", Vectors.dot(col("qvec"), col("cent")))
      .withColumn("cell_rk", row_number().over(wCell))
      .filter(col("cell_rk") <= 5)
      .select(col("query_id"), col("qvec"), col("cent_cell").as("cell"))
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    assigned.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(Vectors.fdot(col("embedding"), col("qvec")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "score", "rk")
      .orderBy("query_id", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> (simTopk _),
    "sim_threshold" -> (simThreshold _),
    "sim_topk_lsh" -> (simTopkLsh _),
    "sim_topk_ivf" -> (simTopkIvf _),
    "dedup_embed" -> (dedupEmbed _)
  )

  /** All similarity ops are declared no-oracle (float kernels). */
  val oracles: Map[String, String] = Map.empty
}
