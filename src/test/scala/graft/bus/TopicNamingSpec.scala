package graft.bus

import org.scalatest.funsuite.AnyFunSuite

/** The part-file naming scheme across the 6-digit padding boundary:
  * `%06d` grows past its padding at sequence 1,000,000, so the listing
  * pattern and the parse must accept 6-OR-MORE digits — a `\d{6}`-only
  * match would make every batch past the millionth invisible to
  * consumers while nextSeq kept colliding on it, wedging the topic. */
class TopicNamingSpec extends AnyFunSuite {

  test("names before and past the padding boundary list and parse") {
    for (seq <- Seq(0, 7, 999999, 1000000, 12345678)) {
      val name = FileTopic.partFileName(seq)
      assert(name.matches(FileTopic.PartFileRegex),
        s"$name must match the listing pattern")
      assert(FileTopic.seqOf(name) === seq)
    }
    assert(FileTopic.partFileName(999999) === "part-999999.jsonl")
    assert(FileTopic.partFileName(1000000) === "part-1000000.jsonl")
  }

  test("staging and offset residue never match the part listing") {
    for (n <- Seq(".staging-x.tmp", "part-00001.jsonl.crc", "part-x.jsonl",
        ".part-000001.hidden", "part-000001.jsonl.tmp"))
      assert(!n.matches(FileTopic.PartFileRegex), s"$n must not list")
  }

  test("schemeless and colon-containing RELATIVE roots are pinned to file://") {
    import TopicSource.qualifyRoot
    // explicit absolute schemes are honored as given
    assert(qualifyRoot("hdfs://nn:8020/bus") === "hdfs://nn:8020/bus")
    assert(qualifyRoot("s3a://bucket/bus") === "s3a://bucket/bus")
    assert(qualifyRoot("file:/var/bus") === "file:/var/bus")
    // plain paths pin to file:// (absolute, executor-visible)
    assert(qualifyRoot("/var/bus") === "file:///var/bus")
    // a RELATIVE path whose first segment contains a colon must not be
    // mistaken for a scheme — java.net.URI reports "data" as one, and
    // honoring it would silently resolve the root via fs.defaultFS
    val pinned = qualifyRoot("data:2026/bus")
    assert(pinned.startsWith("file:///") && pinned.endsWith("/data:2026/bus"))
  }
}
