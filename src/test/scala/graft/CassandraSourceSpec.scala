package graft

import graft.sources.CassandraSource

/** Runtime evidence for the `source_cassandra` routing stub
  * (VERDICT r4 #4): the connector itself cannot run in this
  * zero-egress image (no jar, no cluster), but the flag routing, the
  * format name, and the keyspace/table option wiring are all
  * observable and asserted here. COVERAGE.md marks the row
  * `partial — tested stub` on the strength of these tests.
  */
class CassandraSourceSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("disabled by default: read routes to the parquet substrate") {
    assert(!CassandraSource.enabled(spark))
    val df = CassandraSource.read(spark, sf001, "nation")
    assert(df.count() == 25)
    assert(df.columns.contains("n_nationkey"))
  }

  test("enabled flag is an exact-string opt-in, not truthiness") {
    withConf("graft.cassandra.enabled" -> "TRUE") {
      assert(!CassandraSource.enabled(spark),
        "only the literal 'true' may enable the connector path")
    }
    withConf("graft.cassandra.enabled" -> "true") {
      assert(CassandraSource.enabled(spark))
    }
  }

  test("connector options wire keyspace default and table name") {
    assert(CassandraSource.connectorOptions(spark, "orders") ==
      Map("keyspace" -> "graft", "table" -> "orders"))
  }

  test("connector options honor a configured keyspace") {
    withConf("graft.cassandra.keyspace" -> "prod_ks") {
      assert(CassandraSource.connectorOptions(spark, "lineitem") ==
        Map("keyspace" -> "prod_ks", "table" -> "lineitem"))
    }
  }

  test("enabled read attempts the connector format and fails cleanly when absent") {
    withConf("graft.cassandra.enabled" -> "true") {
      val e = intercept[Exception] {
        CassandraSource.read(spark, sf001, "nation")
      }
      // Spark's data-source lookup names the missing format in its
      // error; asserting it proves the enabled branch really targets
      // the Spark-Cassandra-Connector format, not the parquet path.
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.toString).getOrElse("")
      assert(msg.contains("cassandra"),
        s"expected the connector format name in the failure, got: $msg")
    }
  }

  test("disabled write round-trips through the parquet substrate") {
    val dir = java.nio.file.Files.createTempDirectory("cass_sub").toString
    val df = spark.range(5).toDF("k")
    CassandraSource.write(spark, df, dir, "t")
    val back = spark.read.parquet(s"$dir/t.parquet")
    assert(back.count() == 5)
  }
}
