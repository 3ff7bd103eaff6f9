package graft

/** Driver-contract smoke: entry() has rows, every declared query
  * executes, and oracle keys refer to declared queries. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("COVERAGE.md header count matches SparkEntry.queries.size") {
    // The contract index drifted from the code two rounds running
    // (VERDICT r4 #6, r5 #2) — pin it: the bolded count in the header
    // must equal the declared query count, so adding a query without
    // updating COVERAGE.md fails the build.
    val header = java.nio.file.Files.readString(
      java.nio.file.Paths.get("COVERAGE.md"))
      .linesIterator.take(20).mkString(" ")
    val m = """All \*\*(\d+)\*\* queries""".r.findFirstMatchIn(header)
    assert(m.isDefined, "COVERAGE.md header lost its 'All **N** queries' count")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.get.group(1)} queries, " +
        s"SparkEntry declares ${SparkEntry.queries.size}")
  }

  test("registry carries every group's queries (no silent id collisions)") {
    val expected = graft.operators.Registry.groups.map(_.queries.size).sum
    assert(SparkEntry.queries.size == expected,
      s"${SparkEntry.queries.size} merged vs $expected declared")
  }

  test("events fixture event_type domain matches the declared pivot columns") {
    // agg_pivot hard-codes the value list (one-scan plan) and would
    // silently DROP any event_type outside it, while the agg_unpivot
    // oracle (plain GROUP BY) would keep it — a regenerated fixture
    // with a new type must fail HERE with a clear message, not at the
    // driver with a confusing row-count diff.
    val actual = graft.core.Tables.events(spark, sf001)
      .select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(actual == graft.operators.Aggregates.EventTypes,
      s"events.event_type domain drifted: fixture has $actual, " +
        s"agg_pivot declares ${graft.operators.Aggregates.EventTypes}")
  }

  test("every declared query executes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
