package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels for similarity search (SURVEY.md §2.K).
  *
  * Embeddings are ArrayType(FloatType), dim 64, L2-normalized
  * (FIXTURES.md) ⇒ cosine ≡ dot product. The dot product is a
  * zip_with+aggregate higher-order expression — codegen'd, in-row,
  * deterministic (left-to-right double accumulation). If Bench ever
  * shows it hot, the §4.3 upgrade path is a fused Catalyst Expression
  * with doGenCode; the call sites below wouldn't change.
  */
object Vectors {

  /** Dot product of two numeric arrays (any element type),
    * accumulated left-to-right in double — the generic interpreted
    * fallback. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  /** Dot product of two FLOAT arrays via the fused codegen expression
    * (graft.plans.DotProductExpr) — bit-identical to [[dot]] on float
    * inputs, but runs inside whole-stage codegen. Use on hot paths. */
  def fdot(a: Column, b: Column): Column = graft.plans.DotProductExpr.dot(a, b)

  /** Deterministic Gaussian hyperplanes for sign-random-projection
    * LSH: `nbits` planes of dimension `dim`, fixed seed. Float so the
    * bucket computation stays on the codegen [[fdot]] path. */
  def hyperplanes(nbits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** LSH bucket id: one sign bit per hyperplane. Vectors at small
    * angle collide with high probability; bucket-equality joins
    * replace the all-pairs crossJoin at scale. Composed-column form —
    * fine for ONE narrow band; for multi-band/wide-band projections
    * use [[srpBuckets]], which stays JIT-compiled at any plane count
    * (the composed form's generated code grows past HotSpot's
    * huge-method limit and drops to interpreted bytecode). */
  def lshBucket(v: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(fdot(v, typedlit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ bitwiseOR _)

  /** Every band's [[lshBucket]] in one fused codegen pass — returns
    * array<int>, element b = band b's bucket. Bit-identical per plane
    * to the composed form (same float-multiply/double-accumulate sign
    * test; asserted in KernelSpec). */
  def srpBuckets(v: Column, bands: Seq[Seq[Seq[Float]]]): Column =
    graft.plans.SrpBucketsExpr.buckets(v, bands)
}
