package graft.bus

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** S12 + ST12-ST13: the reference's SQLite-backed Kafka clone
  * (assignment3/simple_kafka_setup.py) re-expressed as a zero-dependency
  * directory-per-topic log.
  *
  * Layout: `root/<topic>/part-%06d.jsonl` are immutable appended message
  * files; `root/<topic>/offsets/<group>.<consumer>` holds the last
  * fully-consumed file sequence per consumer (the `consumer_offsets`
  * table, simple_kafka_setup.py:50-57).
  *
  * Delivery semantics, mapped from the claim-based broker (:146-177):
  * within a consumer group, messages are hash-partitioned across the
  * group's consumers — every message is delivered to exactly one member
  * (the exclusive claim); independent groups each see every message.
  * The broker is deliberately metadata-scale (driver-side file IO, like
  * the reference's SQLite): high-volume streams belong on
  * [[graft.streaming.PipeStream]], this is the pub/sub control plane.
  */
object FileTopic {
  /** The naming scheme, single-sourced for every producer and consumer
    * path (including [[TopicSource]]'s micro-batch listing): writes are
    * zero-padded to 6 digits and GROW PAST the padding at sequence
    * 1,000,000 (`%06d` never truncates), so the listing pattern accepts
    * 6-or-more digits and ordering is numeric, never lexicographic —
    * a `\d{6}`-only match would make every batch past the millionth
    * invisible to consumers while `nextSeq` kept colliding on it,
    * permanently wedging the topic. */
  private[bus] val PartFileRegex = "part-\\d{6,}\\.jsonl"

  private[bus] def partFileName(seq: Int): String = f"part-$seq%06d.jsonl"

  /** The one parse of a part file's sequence number. */
  private[bus] def seqOf(name: String): Int =
    name.stripPrefix("part-").takeWhile(_.isDigit).toInt

  /** Default consecutive polls AND minimum wall-clock a head-of-line
    * sequence gap must persist before [[FileTopic.poll]] declares it a
    * durable hole and throws. Both are required: a poll count alone
    * would let a tight-polling consumer crash inside a network
    * filesystem's attribute-cache window, where part-(N+1) can be
    * visible before part-N for a moment; a time floor alone would let
    * one stale observation an hour later trip the alarm. The time floor
    * defaults ABOVE typical attribute-cache windows (NFS acdirmax
    * defaults to 60 s — the motivating race), so a healthy consumer on
    * NFS can never be crashed by cache-skewed visibility; deployments on
    * local disk that want a faster alarm pass a smaller floor to the
    * constructor. */
  private[bus] val HoleTolerance = 3
  private[bus] val HoleToleranceMs = 65000L
}

/** @param holeTolerancePolls consecutive polls a head-of-line gap must
  *   persist before it is a durable hole (see [[FileTopic.HoleTolerance]])
  * @param holeToleranceMs minimum wall-clock the same gap must persist —
  *   keep it above the filesystem's attribute-cache window
  * @param clock injectable millis clock shared by the hole bookkeeping
  *   (tests advance it instead of sleeping through the tolerance) */
class FileTopic(root: String,
    holeTolerancePolls: Int = FileTopic.HoleTolerance,
    holeToleranceMs: Long = FileTopic.HoleToleranceMs,
    clock: () => Long = () => System.currentTimeMillis()) {

  /** Per-consumer tracking of a sequence gap observed at the head of the
    * undelivered run — see the durable-hole check in [[poll]]. PERSISTED
    * next to the consumer's offset file (dot-prefixed, so [[stats]] and
    * the offset reads skip it): an in-memory sighting would reset on
    * every restart, so a crash-looping consumer — restarting faster than
    * the tolerance elapses — would never report a durable hole at all. */
  private case class HoleSighting(missing: Int, polls: Int, firstSeenMs: Long)

  private def holeFile(topic: String, group: String, consumer: Int): Path =
    offsetsDir(topic).resolve(s".hole.$group.$consumer")

  private def readHole(f: Path): Option[HoleSighting] =
    if (!Files.exists(f)) None
    else scala.util.Try {
      val Array(m, p, t) = new String(Files.readAllBytes(f),
        StandardCharsets.UTF_8).trim.split(":")
      HoleSighting(m.toInt, p.toInt, t.toLong)
    }.toOption // corrupt sighting = no sighting; the clock restarts

  private def topicDir(topic: String): Path = Paths.get(root, topic)
  private def offsetsDir(topic: String): Path = topicDir(topic).resolve("offsets")

  /** create_topic (simple_kafka_setup.py:80-93) — idempotent. */
  def createTopic(topic: String): Unit = {
    Files.createDirectories(offsetsDir(topic))
  }

  /** Files.list returns a stream holding a directory fd — must be closed
    * eagerly, not left to finalization, or busy brokers exhaust fds. */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toList finally s.close()
  }

  private def partFiles(topic: String): Seq[Path] =
    listDir(topicDir(topic))
      .filter(p => p.getFileName.toString.matches(FileTopic.PartFileRegex))
      .sortBy(seqOf) // numeric: "part-1000000" sorts before "part-999999" as text

  private def seqOf(p: Path): Int = FileTopic.seqOf(p.getFileName.toString)

  private def nextSeq(topic: String): Int =
    partFiles(topic).lastOption.map(seqOf(_) + 1).getOrElse(0)

  /** publish_message (simple_kafka_setup.py:95-112): one immutable file
    * per publish batch, made visible ATOMICALLY AND COMPLETE. A direct
    * CREATE_NEW write is atomic for the file's EXISTENCE, not its
    * content — a consumer listing the directory mid-write would read a
    * half-written batch and commit its offset past the missing tail,
    * losing it forever. So the batch is staged to a dot-prefixed temp
    * name (invisible to [[partFiles]]' pattern) and linked into place
    * with create-exclusive semantics; a concurrent publisher racing to
    * the same sequence loses the link atomically and retries with the
    * next one instead of throwing its batch away. */
  def publish(topic: String, messages: Seq[String]): Int = {
    createTopic(topic)
    val tmp = Files.createTempFile(topicDir(topic), ".staging-", ".tmp")
    try {
      Files.write(tmp, messages.asJava, StandardCharsets.UTF_8,
        StandardOpenOption.TRUNCATE_EXISTING)
      var attempts = 0
      var published = -1
      while (published < 0) {
        val seq = nextSeq(topic)
        val target = topicDir(topic).resolve(FileTopic.partFileName(seq))
        try {
          try Files.createLink(target, tmp)
          catch {
            // filesystems without hard links (SMB/FAT/some FUSE):
            // degrade to the create-exclusive direct write — existence
            // stays atomic vs racing publishers; content atomicity
            // (the reason links are preferred) is lost only where the
            // filesystem gives us no rename-into-place primitive that
            // refuses existing targets
            case _: UnsupportedOperationException =>
              Files.write(target, messages.asJava, StandardCharsets.UTF_8,
                StandardOpenOption.CREATE_NEW)
          }
          published = seq
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            attempts += 1
            require(attempts < 1000,
              s"publish: lost the sequence race $attempts times on $topic")
        }
      }
      published
    } finally Files.deleteIfExists(tmp)
  }

  private def offsetFile(topic: String, group: String, consumer: Int): Path =
    offsetsDir(topic).resolve(s"$group.$consumer")

  /** Guarded parse of an offset file: a pre-atomic-commit crash (or a
    * hand-edited file) can leave it empty/corrupt — treat that as "no
    * commit" (-1, at-least-once redelivery) rather than throwing, which
    * would crash-loop every subsequent poll for this consumer until an
    * operator hand-repaired the file. */
  private def parseOffset(bytes: Array[Byte]): Int =
    scala.util.Try(new String(bytes, StandardCharsets.UTF_8).trim.toInt)
      .getOrElse(-1)

  private def committed(topic: String, group: String, consumer: Int): Int = {
    val f = offsetFile(topic, group, consumer)
    if (Files.exists(f)) parseOffset(Files.readAllBytes(f)) else -1
  }

  /** Write a small state file ATOMICALLY: staged to a dot-prefixed temp
    * (the publish discipline) and moved into place, so no reader — a
    * poll, [[stats]], or a restarted consumer reading its hole sighting —
    * can ever observe the truncated-but-unwritten middle of an in-place
    * rewrite. Filesystems without atomic move degrade to a plain move
    * (same visibility as a truncate-then-write, with the guarded parses
    * as the backstop). */
  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(s".${target.getFileName}.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def commitOffset(topic: String, group: String, consumer: Int,
      seq: Int): Unit =
    atomicWrite(offsetFile(topic, group, consumer), f"$seq%06d")

  /** subscribe+claim+commit (simple_kafka_setup.py:114-177): return the
    * new messages owned by this consumer (stable hash split across the
    * group) and advance its offset.
    *
    * Only the CONTIGUOUS prefix of new sequences (last+1, last+2, …) is
    * delivered and committed: a directory listing is a live scan, so it
    * can observe part-(N+1) created mid-scan while having already passed
    * N's slot before part-N was linked — consuming past that hole would
    * commit the offset over part-N and lose its messages forever.
    * Sequences are dense by construction ([[publish]] retries until its
    * create-exclusive link wins), so the skipped tail is simply delivered
    * by the next poll once the listing sees the full run. */
  def poll(topic: String, group: String, consumer: Int = 0,
      groupSize: Int = 1): Seq[String] = {
    createTopic(topic)
    val last = committed(topic, group, consumer)
    val newer = partFiles(topic).filter(seqOf(_) > last)
    val files = newer.zipWithIndex
      .takeWhile { case (f, i) => seqOf(f) == last + 1 + i }
      .map(_._1)
    // A transient hole (publish racing the listing) heals on the next
    // poll; a DURABLE hole (part file deleted/lost, e.g. a partial
    // restore) would wedge this consumer behind it silently forever —
    // poll returning empty with files visible past the gap. Detect the
    // same gap persisting across HoleTolerance consecutive polls and
    // fail loudly with the missing sequence, so an operator can restore
    // the file or explicitly skip it by advancing the offset.
    if (files.isEmpty && newer.nonEmpty) {
      val missing = last + 1
      val now = clock()
      val hf = holeFile(topic, group, consumer)
      val seen = readHole(hf) match {
        case Some(prev) if prev.missing == missing =>
          HoleSighting(missing, prev.polls + 1, prev.firstSeenMs)
        case _ => HoleSighting(missing, 1, now)
      }
      // persisted BEFORE the throw decision, same atomic temp+move
      // discipline as the offset commit — a consumer that crashes (or
      // crash-loops) inside the tolerance window resumes the SAME clock
      // instead of resetting it, so a durable hole is reported after the
      // tolerance no matter how often its consumer restarts
      atomicWrite(hf, s"${seen.missing}:${seen.polls}:${seen.firstSeenMs}")
      val heldMs = now - seen.firstSeenMs
      if (seen.polls >= holeTolerancePolls && heldMs >= holeToleranceMs)
        throw new IllegalStateException(
          s"topic '$topic': sequence $missing is missing but " +
            s"${newer.size} newer part file(s) exist (up to " +
            s"${seqOf(newer.last)}) — durable hole after ${seen.polls} " +
            s"polls over ${heldMs}ms; restore the file or advance the " +
            "group offset past it")
    } else Files.deleteIfExists(holeFile(topic, group, consumer))
    val mine = files.flatMap { f =>
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      val fileSeq = seqOf(f)
      lines.zipWithIndex.collect {
        case (m, i) if Math.floorMod(
          scala.util.hashing.byteswap64(fileSeq.toLong << 32 | i), groupSize)
          == consumer => m
      }
    }
    files.lastOption.foreach(f =>
      commitOffset(topic, group, consumer, seqOf(f)))
    mine
  }

  // ---- claim-based consumption with dynamic rebalancing ----

  private def claimsDir(topic: String): Path = topicDir(topic).resolve("claims")
  private def claimFile(topic: String, group: String, seq: Int): Path =
    claimsDir(topic).resolve(f"$group.$seq%06d")

  /** The reference broker's claim model (simple_kafka_setup.py:146-177)
    * at file granularity: a consumer CLAIMS a part file, processes it,
    * and marks it DONE. A claim older than `claimTtlMs` whose file never
    * reached DONE means its owner died mid-flight — any live member may
    * reclaim it. So when a consumer disappears, its outstanding work
    * rebalances to the survivors on their next poll with no coordinator:
    * exactly-once per group for completed files, at-least-once takeover
    * for a dead consumer's in-flight file (the same contract as the
    * reference's claim table).
    *
    * `markDone = false` leaves this poll's claims in-flight — used by
    * tests (and crash-simulations) to model a consumer dying after
    * claiming.
    *
    * Claim atomicity: the initial claim is a CREATE_NEW — the filesystem
    * picks exactly one winner among concurrent claimers, so two members
    * polling the same unclaimed file can never both consume it (the
    * exactly-once-per-group-for-completed-files contract holds under
    * concurrency, not just in single-threaded tests). A TTL reclaim of a
    * dead owner's file can't use CREATE_NEW (the stale file exists), so
    * it writes a uniquely-nonced token and re-reads to confirm ownership
    * before consuming — concurrent reclaimers that lose the last-write
    * race observe the winner's token and back off. A reclaim race that
    * interleaves exactly between a loser's write and re-read can still
    * double-deliver, which is the documented at-least-once takeover
    * semantics for dead-owner files (same contract as the reference's
    * claim table). */
  def pollClaims(topic: String, group: String, consumer: Int,
      claimTtlMs: Long = 30000L,
      now: () => Long = () => System.currentTimeMillis(),
      markDone: Boolean = true): Seq[String] = {
    createTopic(topic)
    Files.createDirectories(claimsDir(topic))
    val mine = partFiles(topic).flatMap { f =>
      val seq = seqOf(f)
      val cf = claimFile(topic, group, seq)
      // token fields: owner:timestamp:state:nonce — the nonce
      // disambiguates two claim attempts by the same (owner, timestamp)
      val token = s"$consumer:${now()}:claimed:${java.util.UUID.randomUUID()}"
      def readToken(): Option[String] =
        if (Files.exists(cf))
          Some(new String(Files.readAllBytes(cf), StandardCharsets.UTF_8).trim)
        else None
      val owned = readToken() match {
        case None =>
          // atomic initial claim: CREATE_NEW admits exactly one creator
          try {
            Files.write(cf, token.getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE_NEW)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        case Some(cur) =>
          // defensive parse: a token mangled by interleaved concurrent
          // writes must not poison this file's polling forever with a
          // parse throw — but an UNREADABLE token is also what a reader
          // sees transiently between a winner's CREATE_NEW and its byte
          // write, so corrupt tokens become reclaimable only once the
          // claim FILE itself has gone stale (mtime past the TTL on the
          // same injectable clock as every other decision here), never
          // immediately; an unreadable mtime is NOT proof of staleness
          def staleByMtime: Boolean =
            scala.util.Try(Files.getLastModifiedTime(cf).toMillis).toOption
              .exists(m => now() - m > claimTtlMs)
          val reclaimable = cur.split(":") match {
            case Array(_, ts, "claimed", _*) =>
              scala.util.Try(ts.toLong).toOption match {
                case Some(t) => now() - t > claimTtlMs
                case None => staleByMtime
              }
            case Array(_, _, "done", _*) => false
            case _ => staleByMtime
          }
          if (!reclaimable) false
          else {
            // TTL reclaim: write, then re-read to confirm we won the race
            Files.write(cf, token.getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
            readToken().contains(token)
          }
      }
      if (!owned) None
      else {
        val msgs = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
        if (markDone)
          Files.write(cf, s"$consumer:${now()}:done".getBytes(StandardCharsets.UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        Some(msgs)
      }
    }
    mine.flatten
  }

  /** get_topic_stats (simple_kafka_setup.py:179-198): total messages,
    * files, consumer count, and queue depth (messages not yet consumed by
    * the laggiest registered consumer). */
  def stats(topic: String): Map[String, Long] = {
    createTopic(topic)
    val files = partFiles(topic)
    // one read per part file: the per-file line counts feed both the
    // total and the depth sums (the old shape read every file twice)
    val lineCounts = files.map(f =>
      f -> Files.readAllLines(f).size().toLong).toMap
    val total = lineCounts.valuesIterator.sum
    // skip dot-prefixed staging residue (a crashed commitOffset's tmp);
    // parseOffset guards the read against pre-atomic-commit leftovers
    val offsets = listDir(offsetsDir(topic))
      .filterNot(_.getFileName.toString.startsWith("."))
    val minCommitted =
      if (offsets.isEmpty) -1
      else offsets.map(p => parseOffset(Files.readAllBytes(p))).min
    val unconsumed = files.filter(seqOf(_) > minCommitted)
      .map(lineCounts).sum
    Map("total_messages" -> total, "n_files" -> files.size.toLong,
      "n_consumers" -> offsets.size.toLong, "queue_depth" -> unconsumed)
  }
}
