package graft

import java.nio.file.Files

import graft.bus.FileTopic

class FileTopicSpec extends SparkSuite {

  private def broker(): FileTopic =
    new FileTopic(Files.createTempDirectory("bus").toString)

  test("publish/poll round trip with per-group offsets") {
    val b = broker()
    b.publish("orders", Seq("m1", "m2"))
    b.publish("orders", Seq("m3"))
    val got = b.poll("orders", "g1")
    assert(got === Seq("m1", "m2", "m3"))
    // committed: nothing new on re-poll
    assert(b.poll("orders", "g1").isEmpty)
    // new publish arrives incrementally
    b.publish("orders", Seq("m4"))
    assert(b.poll("orders", "g1") === Seq("m4"))
  }

  test("consumer group splits messages disjointly and completely (ST12)") {
    val b = broker()
    val msgs = (1 to 40).map(i => s"m$i")
    msgs.grouped(10).foreach(g => b.publish("t", g))
    val c0 = b.poll("t", "workers", consumer = 0, groupSize = 2)
    val c1 = b.poll("t", "workers", consumer = 1, groupSize = 2)
    assert((c0 ++ c1).sorted === msgs.sorted)  // complete
    assert(c0.toSet.intersect(c1.toSet).isEmpty) // exclusive delivery
    assert(c0.nonEmpty && c1.nonEmpty)           // actually balanced
    // an independent group sees every message (fan-out across groups)
    assert(b.poll("t", "audit").sorted === msgs.sorted)
  }

  test("stats reports depth, consumers, totals (ST13)") {
    val b = broker()
    b.publish("t", Seq("a", "b"))
    val s0 = b.stats("t")
    assert(s0("total_messages") === 2 && s0("queue_depth") === 2 &&
      s0("n_consumers") === 0)
    b.poll("t", "g1")
    val s1 = b.stats("t")
    assert(s1("queue_depth") === 0 && s1("n_consumers") === 1)
    b.publish("t", Seq("c"))
    assert(b.stats("t")("queue_depth") === 1)
  }

  test("claim polling rebalances a dead consumer's in-flight work") {
    val b = broker()
    var clock = 1000L
    val now = () => clock
    b.publish("t", Seq("m0"))
    b.publish("t", Seq("m1", "m2"))

    // consumer 0 claims everything but dies before finishing (no DONE)
    val dying = b.pollClaims("t", "g", consumer = 0, claimTtlMs = 5000,
      now = now, markDone = false)
    assert(dying === Seq("m0", "m1", "m2"))

    // survivor polls while the claims are fresh: nothing to take
    clock += 1000
    assert(b.pollClaims("t", "g", consumer = 1, claimTtlMs = 5000, now = now).isEmpty)

    // after the claim TTL the dead consumer's files rebalance to it
    clock += 10000
    val taken = b.pollClaims("t", "g", consumer = 1, claimTtlMs = 5000, now = now)
    assert(taken === Seq("m0", "m1", "m2"))

    // completed files never redeliver — exactly-once per group
    clock += 60000
    assert(b.pollClaims("t", "g", consumer = 2, claimTtlMs = 5000, now = now).isEmpty)
    // and an independent group still sees everything
    assert(b.pollClaims("t", "g2", consumer = 0, claimTtlMs = 5000, now = now).size === 3)
  }

  test("concurrent claim polling never double-delivers an unclaimed file") {
    // the CREATE_NEW atomic-claim path: N members of one group race over
    // the same fresh files; exactly-once requires the union to be exact
    // with zero duplicates — a read-check-write protocol fails this
    val b = broker()
    val msgs = (1 to 24).map(i => f"m$i%03d")
    msgs.grouped(2).foreach(g => b.publish("t", g)) // 12 part files
    val nConsumers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nConsumers)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = (0 until nConsumers).map { c =>
      pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        def call(): Seq[String] = { start.await(); b.pollClaims("t", "g", c) }
      })
    }
    start.countDown()
    val got = results.flatMap(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(got.sorted === msgs.sorted) // complete AND duplicate-free
  }

  test("concurrent publishers all land their batches; no staging leftovers") {
    // the create-exclusive link path: N publishers race for sequence
    // numbers; every batch must survive under a distinct seq, and the
    // staged temp files must all be cleaned up (they are invisible to
    // consumers either way — partFiles' pattern excludes dot names)
    val root = Files.createTempDirectory("bus_race").toString
    val b = new FileTopic(root)
    val nPublishers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nPublishers)
    val start = new java.util.concurrent.CountDownLatch(1)
    val seqs = (0 until nPublishers).map { p =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = { start.await(); b.publish("t", Seq(s"batch-$p")) }
      })
    }
    start.countDown()
    val landed = seqs.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(landed.distinct.length === nPublishers,
      "two publishers claimed the same sequence")
    val got = b.poll("t", "g")
    assert(got.sorted === (0 until nPublishers).map(p => s"batch-$p").sorted,
      "a racing publisher's batch was lost")
    val s = Files.list(java.nio.file.Paths.get(root, "t"))
    val leftovers =
      try {
        val it = s.iterator()
        var acc = List.empty[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith(".staging-")) acc ::= n
        }
        acc
      } finally s.close()
    assert(leftovers.isEmpty, s"staging files left behind: $leftovers")
  }

  test("a hole in the listed sequence bounds delivery to the contiguous prefix") {
    val root = Files.createTempDirectory("bus")
    val b = new FileTopic(root.toString)
    b.publish("t", Seq("m0"))
    b.publish("t", Seq("m1"))
    b.publish("t", Seq("m2"))
    // model the live-scan race: part-000001 was linked mid-scan, so this
    // listing sees 0 and 2 but not 1 — consuming 2 would commit the
    // offset over 1 and lose it forever
    val hidden = root.resolve("t/part-000001.jsonl")
    val aside = root.resolve("t/.part-000001.hidden")
    Files.move(hidden, aside)
    assert(b.poll("t", "g") === Seq("m0"), "must stop at the hole")
    Files.move(aside, hidden)
    // the skipped tail is simply the next poll's delivery
    assert(b.poll("t", "g") === Seq("m1", "m2"))
    assert(b.poll("t", "g").isEmpty)
  }

  test("a DURABLE hole fails loudly after the tolerance instead of wedging") {
    val root = Files.createTempDirectory("bus")
    var clockMs = 1000L
    val b = new FileTopic(root.toString, holeToleranceMs = 2000L,
      clock = () => clockMs)
    b.publish("t", Seq("m0"))
    b.publish("t", Seq("m1"))
    b.publish("t", Seq("m2"))
    assert(b.poll("t", "g") === Seq("m0", "m1", "m2"))
    b.publish("t", Seq("m3"))
    b.publish("t", Seq("m4"))
    // part-000003 is LOST (partial restore) — not a transient listing race
    Files.delete(root.resolve("t/part-000003.jsonl"))
    // the first polls are indistinguishable from a race: empty, no error
    assert(b.poll("t", "g").isEmpty)
    assert(b.poll("t", "g").isEmpty)
    // poll count alone must NOT trip the alarm — an NFS attribute-cache
    // window can hide a freshly-published file for seconds while a
    // tight-polling consumer burns through any count
    assert(b.poll("t", "g").isEmpty, "fast polls within the time floor stay silent")
    clockMs += 2100 // clear the 2 s time floor
    // the gap persisting past BOTH tolerances must be loud, not silent
    val e = intercept[IllegalStateException](b.poll("t", "g"))
    assert(e.getMessage.contains("sequence 3"))
    assert(e.getMessage.contains("durable hole"))
    // operator remedy: advance the offset past the hole → consumption
    // resumes (and the sighting counter resets for future gaps)
    val off = root.resolve("t/offsets/g.0")
    Files.write(off, "000003".getBytes)
    assert(b.poll("t", "g") === Seq("m4"))
    assert(b.poll("t", "g").isEmpty)
    // the healed poll also cleared the persisted sighting
    assert(!Files.exists(root.resolve("t/offsets/.hole.g.0")))
  }

  test("a crash-looping consumer still reports a durable hole (persisted sighting)") {
    val root = Files.createTempDirectory("bus")
    var clockMs = 1000L
    val clock = () => clockMs
    def freshConsumer() = // a restart = a brand-new broker instance
      new FileTopic(root.toString, holeToleranceMs = 2000L, clock = clock)
    val producer = freshConsumer()
    producer.publish("t", Seq("m0"))
    producer.publish("t", Seq("m1"))
    assert(freshConsumer().poll("t", "g") === Seq("m0", "m1"))
    producer.publish("t", Seq("m2"))
    producer.publish("t", Seq("m3"))
    Files.delete(root.resolve("t/part-000002.jsonl")) // durable loss
    // each poll is a NEW instance restarting INSIDE the tolerance window —
    // with in-memory-only sightings the clock would reset every time and
    // the hole would never be reported
    assert(freshConsumer().poll("t", "g").isEmpty)
    clockMs += 700
    assert(freshConsumer().poll("t", "g").isEmpty)
    clockMs += 700
    assert(freshConsumer().poll("t", "g").isEmpty)
    clockMs += 700 // 2100 ms since first sighting, 3 polls seen
    val e = intercept[IllegalStateException](freshConsumer().poll("t", "g"))
    assert(e.getMessage.contains("sequence 2"))
    assert(e.getMessage.contains("durable hole"))
  }

  test("an empty or corrupt offset file degrades to redelivery, not a crash-loop") {
    val root = Files.createTempDirectory("bus")
    val b = new FileTopic(root.toString)
    b.publish("t", Seq("m0"))
    assert(b.poll("t", "g") === Seq("m0"))
    // a pre-atomic-commit crash could leave the file empty; polls must
    // treat it as "no commit" (at-least-once) instead of throwing forever
    val off = root.resolve("t/offsets/g.0")
    Files.write(off, Array.emptyByteArray)
    assert(b.poll("t", "g") === Seq("m0"))
    assert(b.poll("t", "g").isEmpty, "redelivery re-commits the offset")
    // stats must tolerate a corrupt offset too (reads every consumer's)
    Files.write(off, "garbage".getBytes)
    assert(b.stats("t")("queue_depth") === 1)
  }
}
