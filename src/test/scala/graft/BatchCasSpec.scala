package graft

import org.apache.spark.sql.functions._
import graft.operators.CellStore

/** Write-path semantics the oracle can't see (CORRECTNESS only runs
  * the all-committed happy path): CAS no-op on failed/absent attempts
  * (CQL LWT `UPDATE … IF`), and logged-BATCH atomicity — a crash
  * between the two table writes must leave the torn batch invisible
  * to committed reads, and a replay must converge (not double rows).
  */
class BatchCasSpec extends SparkSpec {

  import spark.implicits._

  // One row per condition branch: applied, failed condition, absent
  // attempt, attempt on a missing key (must not appear at all).
  private def base =
    Seq((1L, 10L, "click", 1.0), (2L, 20L, "view", 2.0), (3L, 30L, "click", 3.0))
      .toDF("user_id", "event_id", "event_type", "value")
  private def attempts =
    Seq((1L, 11L, "scroll", 9.0, "click"),  // matches current type → applies
        (2L, 21L, "scroll", 9.0, "click"),  // current is view → fails
        (9L, 91L, "scroll", 9.0, "click"))  // key absent from base → dropped
      .toDF("user_id", "a_event_id", "a_event_type", "a_value", "expected_type")

  test("casMerge applies iff the current value matches the expectation") {
    val out = CellStore.casMerge(base, attempts)
      .orderBy("user_id").collect().map(r =>
        (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    assert(out === Seq(
      (1L, true, 11L, "scroll", 9.0),   // applied: attempt's cells win
      (2L, false, 20L, "view", 2.0),    // failed: base row byte-identical
      (3L, false, 30L, "click", 3.0))) // absent: base row byte-identical
  }

  test("casMerge failed/absent attempts leave every base column unchanged") {
    // Property over a generated base: with an always-false expectation
    // the merge must be the identity on (event_id, event_type, value).
    val gen = spark.range(0, 500)
      .select(col("id").as("user_id"), (col("id") * 7 % 1000).as("event_id"),
        when(col("id") % 3 === 0, "click").otherwise("view").as("event_type"),
        (col("id") % 17).cast("double").as("value"))
    val att = gen.limit(250).select(col("user_id"),
      lit(1L).as("a_event_id"), lit("x").as("a_event_type"),
      lit(0.0).as("a_value"), lit("never-matches").as("expected_type"))
    val merged = CellStore.casMerge(gen, att)
      .select("user_id", "event_id", "event_type", "value")
    assert(merged.exceptAll(gen).isEmpty && gen.exceptAll(merged).isEmpty)
  }

  private def changes =
    Seq((1L, 100L, "click", 1.0, "2024-01-01 00:00:00", 0L),
        (2L, 101L, "view", 2.0, "2024-01-01 00:00:01", 0L),
        (3L, 102L, "click", 3.0, "2024-01-01 00:00:02", 1L))
      .toDF("user_id", "event_id", "event_type", "value", "ts", "batch_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("a crash between the batch writes leaves the torn batch invisible") {
    val root = graft.core.RunId.scratch("batchcas_crash")
    CellStore.applyBatches(changes, root, crashBetweenWrites = true)
    // by_user holds the rows on disk, but no commit marker exists —
    // the committed view must be empty, not an error and not torn.
    assert(CellStore.readCommitted(spark, root, "by_user").count() === 0)
    // Recovery: the replay overwrites (never appends to) the partial
    // state, so the committed view converges to exactly one copy.
    CellStore.applyBatches(changes, root)
    assert(CellStore.readCommitted(spark, root, "by_user").count() === 3)
    assert(CellStore.readCommitted(spark, root, "by_type").count() === 3)
  }

  // batchCasMerge fixtures: base state per (user, type); user 1's
  // batch is all-passing, user 2's batch has ONE failing row (its
  // other row would pass in isolation), user 3's batch targets a
  // missing row (condition false on absence), user 4 has no batch.
  private def bcBase =
    Seq((1L, "click", 10L, 1.0), (1L, "view", 11L, 2.0),
        (2L, "click", 20L, 5.0), (2L, "view", 21L, 6.0),
        (3L, "click", 30L, 7.0),
        (4L, "click", 40L, 8.0))
      .toDF("user_id", "event_type", "event_id", "value")
  private def bcAttempts =
    Seq((1L, "click", 110L, 3.0), (1L, "view", 111L, 4.0),  // both pass
        (2L, "click", 120L, 9.0), (2L, "view", 121L, 1.0),  // 2nd fails (1.0 < 6.0)
        (3L, "click", 130L, 9.0), (3L, "scroll", 131L, 9.0)) // scroll row missing
      .toDF("user_id", "event_type", "a_event_id", "a_value")

  test("batchCasMerge: all-or-nothing per user; a failed or missing-row condition blocks the whole batch") {
    val out = CellStore.batchCasMerge(bcBase, bcAttempts)
      .orderBy("user_id", "event_type").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
         r.getLong(4), r.getDouble(5)))
    assert(out === Seq(
      (1L, "click", true, true, 110L, 3.0),   // applied wholesale
      (1L, "view", true, true, 111L, 4.0),
      (2L, "click", false, false, 20L, 5.0),  // sibling row failed ⇒ no-op
      (2L, "view", false, false, 21L, 6.0),
      (3L, "click", false, false, 30L, 7.0),  // missing-row attempt ⇒ no-op
      (4L, "click", false, false, 40L, 8.0))) // no batch ⇒ untouched
    // nothing created: the missing (3, scroll) target must not appear
    assert(!out.exists(r => r._1 == 3L && r._2 == "scroll"))
  }

  test("batchCasMerge: replay of an applied batch is a converged no-op (LWT CAS fails the second time)") {
    val once = CellStore.batchCasMerge(bcBase, bcAttempts)
      .select("user_id", "event_type", "event_id", "value")
    val twice = CellStore.batchCasMerge(once, bcAttempts)
      .select("user_id", "event_type", "event_id", "value")
    // second application: every previously-applied row now has
    // value == a_value, so its condition a_value > value is false and
    // the replayed batch is a pure no-op — state is unchanged
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("a duplicate replay of a committed batch does not double the tables") {
    val root = graft.core.RunId.scratch("batchcas_replay")
    CellStore.applyBatches(changes, root)
    CellStore.applyBatches(changes, root) // retry after e.g. a lost ack
    val byUser = CellStore.readCommitted(spark, root, "by_user")
    assert(byUser.count() === 3)
    assert(byUser.select("event_id").as[Long].collect().sorted === Seq(100L, 101L, 102L))
  }
}
