package graft

import java.nio.charset.StandardCharsets

import com.google.common.hash.Hashing
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.functions.CassandraMurmur3

/** Anchors for the Cassandra Murmur3Partitioner token kernel
  * (SURVEY.md §2.A scan_token_range / fn_token).
  *
  * The kernel differs from canonical murmur3 x64 128 ONLY in
  * sign-extending tail bytes (Cassandra's documented compatibility
  * quirk). That gives a public oracle for everything else: Guava's
  * `Hashing.murmur3_128` (the canonical algorithm) must agree with the
  * kernel's h1 wherever the quirk can't fire —
  *   (a) any input whose length is a multiple of 16 (no tail), and
  *   (b) any input whose tail bytes are all < 0x80 (sign extension is
  *       a no-op), which covers every ASCII text key.
  * And it must DISAGREE when a tail byte ≥ 0x80 flips the quirk on.
  * Guava's `asLong()` is the first 8 digest bytes little-endian — the
  * same h1 Cassandra takes as the token.
  */
class Murmur3Spec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def guavaH1(b: Array[Byte]): Long =
    Hashing.murmur3_128(0).hashBytes(b).asLong()

  test("kernel == canonical Guava murmur3_128 h1 on full-block inputs (any bytes)") {
    val gen = for {
      blocks <- Gen.choose(0, 4)
      bytes <- Gen.listOfN(blocks * 16, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes.toArray
    check(Prop.forAll(gen) { b =>
      CassandraMurmur3.hash3x64h1(b, 0L) == guavaH1(b)
    })
  }

  test("kernel == canonical Guava murmur3_128 h1 on low-byte tails (ASCII domain)") {
    val gen = for {
      n <- Gen.choose(0, 64)
      bytes <- Gen.listOfN(n, Gen.choose(0.toByte, Byte.MaxValue))
    } yield bytes.toArray
    check(Prop.forAll(gen) { b =>
      CassandraMurmur3.hash3x64h1(b, 0L) == guavaH1(b)
    })
  }

  test("text keys: token == Guava h1 (ASCII is quirk-free)") {
    for (k <- Seq("", "a", "key1", "jim", "0123456789abcde", "exactly16bytes!!",
      "a longer partition key crossing several blocks")) {
      val b = k.getBytes(StandardCharsets.UTF_8)
      assert(CassandraMurmur3.token(b) == guavaH1(b), s"key '$k'")
    }
  }

  test("sign-extension quirk fires on high tail bytes and only there") {
    // One high byte in the tail → must diverge from canonical.
    val tail = Array.fill[Byte](5)(0x20) :+ 0x9a.toByte
    assert(CassandraMurmur3.hash3x64h1(tail, 0L) != guavaH1(tail))
    // Same high bytes packed into a full block → no tail → must agree.
    val block = Array.tabulate[Byte](16)(i => (0x80 + i).toByte)
    assert(CassandraMurmur3.hash3x64h1(block, 0L) == guavaH1(block))
  }

  test("bigint serialization is 8-byte big-endian (CQL LongType)") {
    assert(CassandraMurmur3.serializeBigint(1L).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(CassandraMurmur3.serializeBigint(-1L).toSeq == Seq.fill[Byte](8)(-1))
    assert(CassandraMurmur3.serializeBigint(0x0102030405060708L).toSeq ==
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    // tokenOfLong goes through the same serialization + token path
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      CassandraMurmur3.tokenOfLong(v) ==
        CassandraMurmur3.token(CassandraMurmur3.serializeBigint(v))
    })
  }

  test("CassTokenExpr codegen == kernel across long/string/binary inputs") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "key1", Array[Byte](1, 2, 0x9a.toByte)),
        (42L, "jim", Array.emptyByteArray),
        (-7L, "", Array.tabulate[Byte](17)(i => (i * 37).toByte)))
      .toDF("k_long", "k_str", "k_bin")
    val got = df.select(
      graft.plans.CassTokenExpr.token(col("k_long")).as("tl"),
      graft.plans.CassTokenExpr.token(col("k_str")).as("ts"),
      graft.plans.CassTokenExpr.token(col("k_bin")).as("tb"),
      col("k_long"), col("k_str"), col("k_bin")).collect()
    for (r <- got) {
      assert(r.getLong(0) == CassandraMurmur3.tokenOfLong(r.getLong(3)))
      assert(r.getLong(1) == CassandraMurmur3.token(
        r.getString(4).getBytes(StandardCharsets.UTF_8)))
      assert(r.getLong(2) == CassandraMurmur3.token(r.getAs[Array[Byte]](5)))
    }
  }

  test("cass_token is SQL-registered and null-safe") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT cass_token(CAST(42 AS BIGINT)) AS t, cass_token(CAST(NULL AS STRING)) AS n")
      .collect().head
    assert(got.getLong(0) == CassandraMurmur3.tokenOfLong(42L))
    assert(got.isNullAt(1))
  }

  test("scan_token_range selects exactly the keys whose token falls in the range") {
    val df = graft.operators.Scans.scanTokenRange(spark, sf001)
    val keys = df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val all = graft.core.Tables.orders(spark, sf001)
      .select("o_orderkey").collect().map(_.getLong(0))
    val span = Long.MaxValue >> 3
    val expected = all.filter { k =>
      val t = CassandraMurmur3.tokenOfLong(k); t > 0L && t <= span
    }.toSet
    assert(keys == expected)
    // ~1/16 of the ring: uniformity sanity on the selected fraction
    val frac = keys.size.toDouble / all.length
    assert(frac > 0.02 && frac < 0.11, s"fraction $frac not near 1/16")
  }
}
