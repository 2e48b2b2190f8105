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
}
