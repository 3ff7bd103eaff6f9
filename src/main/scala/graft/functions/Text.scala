package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels for the LLM-pipeline operators (SURVEY.md §2.K):
  * tokenization, shingling, MinHash, SimHash, fingerprints. All pure
  * Column expressions built from codegen'd higher-order functions —
  * no UDFs — so they distribute trivially and stay in-row (no
  * shuffle) until the caller aggregates or joins.
  */
object Text {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: word runs or single non-space symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** k-gram word shingles of a token array (empty if too short).
    *
    * Built as arrays_zip of k shifted slices rather than per-element
    * element_at: the token array is then referenced k+1 times per ROW
    * instead of k times per ELEMENT, which matters because Catalyst's
    * CollapseProject may inline the (expensive) tokenizer expression
    * into each reference — measured 10× slower in the per-element
    * form. */
  def shingles(w: Column, k: Int): Column = {
    val n = size(w) - (k - 1)
    val zipped = arrays_zip((0 until k).map(j => slice(w, lit(j + 1), n)): _*)
    val gram = (s: Column) => concat_ws(" ", (0 until k).map(j => s.getField(j.toString)): _*)
    when(size(w) >= k, transform(zipped, gram))
      .otherwise(array().cast("array<string>"))
  }

  /** LSH band keys over a minhash signature: `bands` groups of
    * `rowsPerBand` coordinates hashed together. Docs sharing any band
    * key are candidate near-duplicates; at scale the self-join runs
    * per band key, never all-pairs. */
  def bandKeys(mh: Seq[Column], bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      xxhash64((mh.slice(b * rowsPerBand, (b + 1) * rowsPerBand) :+ lit(b)): _*).as(s"band$b")
    }

  /** Rolling-hash document fingerprint: the minimum over 3-gram
    * shingle MD5s (single-window winnowing). */
  def fingerprint(w: Column): Column =
    array_min(transform(shingles(w, 3), x => md5(x)))

  import org.apache.spark.sql.DataFrame

  /** MinHash signature via explode + codegen'd hash aggregate: one
    * row per (doc, shingle), `k` seeded xxhash64 columns, min-reduced
    * per doc. One shuffle on the doc id; everything else is Tungsten
    * codegen — orders of magnitude faster than per-row interpreted
    * array lambdas, and the shape that scales (shuffle volume = docs ×
    * k longs, independent of document length). */
  def minhashSignature(docs: DataFrame, idCol: String, shCol: String, k: Int): DataFrame = {
    val exploded = docs.select(col(idCol), explode(col(shCol)).as("_shingle"))
    val aggs = (0 until k).map(j => min(xxhash64(col("_shingle"), lit(j))).as(s"mh$j"))
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** 64-bit SimHash via explode + codegen'd hash aggregate: per bit,
    * sum of ±1 according to the shingle hash's bit, sign-bit assembled
    * after the aggregate. Same scale shape as [[minhashSignature]]. */
  def simhashSignature(docs: DataFrame, idCol: String, shCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(col(shCol)).as("_s"))
      .select(col(idCol), xxhash64(col("_s")).as("_h"))
    val aggs = (0 until 64).map { j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val counts = exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    val sim = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    counts.select(col(idCol), sim.as("sim"))
  }

  /** Exact token Jaccard similarity of two distinct-token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
}
