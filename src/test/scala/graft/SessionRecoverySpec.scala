package graft

import org.apache.spark.GraftTestContext

/** Pins the stopped-context recovery of the shared suite session — the
  * round-13 driver failure mode: one suite's context death poisoned every
  * suite after it (`Dataset.persist → CacheManager.cloneSession →
  * assertNotStopped`). Two paths:
  *
  *  - CLEAN stop: stop() ran to completion and deregistered itself;
  *    recovery only needs acquire() to build a fresh session.
  *  - HALF stop: stop() died mid-teardown — the context is marked stopped
  *    but still registered as the JVM's activeContext, which
  *    `SparkContext.getOrCreate` returns WITHOUT an isStopped check, so a
  *    plain getOrCreate keeps handing back the corpse forever. acquire()'s
  *    stale-handle sweep ([[GraftTestContext.clearStaleActiveContext]]) is
  *    what breaks that loop.
  *
  * The half-stop test deliberately leaves the zombie context's threads
  * running (idle local[4] workers, a dormant listener bus): un-marking and
  * fully stopping it would null the GLOBAL SparkEnv and deregister the
  * FRESH context — breaking every later suite to clean up a test fixture.
  * The leak is a few idle daemon threads for the remainder of one test JVM.
  *
  * Suite-ordering note: every suite acquires its session through the same
  * [[SparkSuite.acquire]], so whatever suites run AFTER this one implicitly
  * re-verify that the rebuilt session serves real workloads. */
class SessionRecoverySpec extends SparkSuite {

  test("half-stopped context (stop() died before deregistering) is swept, not returned") {
    val zombie = spark
    assert(!zombie.sparkContext.isStopped)
    GraftTestContext.simulateHalfStop(zombie.sparkContext)
    assert(zombie.sparkContext.isStopped)
    val fresh = SparkSuite.acquire()
    assert(fresh.sparkContext ne zombie.sparkContext,
      "acquire() returned the half-stopped context — the stale activeContext sweep is broken")
    assert(!fresh.sparkContext.isStopped)
    // the rebuilt session must serve a real query with the suite config
    import fresh.implicits._
    assert(Seq(1L, 2L, 3L).toDF("v")
      .agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) === 6L)
    assert(fresh.conf.get("spark.sql.shuffle.partitions") === "4")
  }

  test("cleanly stopped context is rebuilt by the next acquire") {
    val before = SparkSuite.acquire()
    before.stop()
    assert(before.sparkContext.isStopped)
    val after = SparkSuite.acquire()
    assert(!after.sparkContext.isStopped)
    import after.implicits._
    assert(Seq("a", "b", "a").toDF("k").distinct().count() === 2L)
  }
}
