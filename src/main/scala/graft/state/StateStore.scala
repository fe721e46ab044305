package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Checkpoint / lineage / metrics state, mirroring the reference's H2
  * state machine (`H2DatabaseManager.java:43-86`):
  *
  *  - [[Checkpoint]] ≈ `csv_settings` + `jobs` — per (tier, partition)
  *    watermark + status instead of per-file status;
  *  - [[LineageRow]] ≈ `row_processing` — per (tier, partition) work
  *    unit with status ∈ PENDING/PROCESSING/COMPLETED/FAILED/RETRY
  *    (`DAO/RowProcessingStatus.java:5-10`) and `retry_count`;
  *  - [[MetricsRow]] ≈ `jobs.processed_rows/failed_rows` counters.
  *
  * Storage: JSON-lines files, one per commit, under `<root>/<kind>/`,
  * each written temp-then-ATOMIC_MOVE so a kill mid-commit never leaves
  * a torn record (the H2 analogue was transaction-per-batch,
  * `MigrateTask.java:101`). Latest-wins per key, exactly like the
  * reference's MERGE upsert (`RowProcessingDAO.java:184-194`).
  *
  * State volume is O(tiers × partitions), not O(rows) — at 100 TB the
  * partition count is ~10^4-10^5, so driver-side JSON stays trivially
  * small while the data path stays fully distributed.
  *
  * **Compaction** ([[compact]]): every read is latest-wins over ALL
  * commit files ever written, so a long-lived warehouse — especially a
  * streaming job committing one lineage file per micro-batch — would
  * accrete O(total-commits) tiny files re-scanned at each planning pass
  * and each restart (the reference avoids this with an indexed H2
  * store, `H2DatabaseManager.java:43-86`). Compaction rewrites each
  * kind into ONE snapshot file: checkpoints/lineage keep only the
  * latest row per (tier, partition) (their only read semantics);
  * metrics and logs are append-semantics (sums / human record) so every
  * row is preserved, just coalesced. Crash-safe without multi-file
  * atomicity: the snapshot is written (atomic move) under a name whose
  * seq exceeds every file it absorbed, readers ignore commit files with
  * name-seq ≤ the newest snapshot's, and only then are the absorbed
  * files deleted — a crash mid-delete leaves duplicates that are
  * already invisible.
  *
  * **Writer model: ONE process writes a store root at a time.** Batch
  * and streaming jobs may share a root SEQUENTIALLY (each seeds its seq
  * counter from the files on open), never concurrently: compaction's
  * debris sweep deletes every file not in the effective snapshot cover,
  * so a second live writer whose counter trails the cover would have
  * fresh commits first rendered invisible (name-seq ≤ snapshot) and
  * then deleted. Concurrent DEPLOYMENTS split roots — the lineage
  * namespace (`stream_<tier>`) separates facts, not writers.
  *
  * Not final so tests can inject commit faults by overriding a commit
  * method (crash-window specs).
  */
class StateStore(root: String) {

  /** `rawCount` records how many RAW input rows the partition's day had
    * when the checkpoint was written — the late-arrival detector: a
    * COMPLETED day whose current input census disagrees gets recomputed
    * (idempotent overwrite) instead of silently keeping stale rollups.
    * -1 = unknown (checkpoints written before the field existed, or
    * callers without a census); unknown never reads as dirty.
    */
  final case class Checkpoint(
      tier: String, partition: String, watermarkUs: Long, status: String,
      jobId: String, seq: Long, rawCount: Long = -1L)

  final case class LineageRow(
      tier: String, partition: String, status: String, error: String,
      retryCount: Int, rows: Long, jobId: String, seq: Long)

  final case class MetricsRow(
      jobId: String, tier: String, processed: Long, failed: Long, seq: Long)

  private def dir(kind: String) = Paths.get(root, kind)

  private val seqCounter = new java.util.concurrent.atomic.AtomicLong(loadMaxSeq())

  private def loadMaxSeq(): Long = {
    val entries = for {
      // every kind that carries a seq — omitting one (the log stream is
      // written LAST in a run, so it often holds the global max) would
      // re-issue its seq values after a restart
      kind <- Seq("checkpoints", "lineage", "metrics", "logs")
      if Files.exists(dir(kind))
      f <- Files.list(dir(kind)).iterator().asScala.toSeq
      if !f.getFileName.toString.startsWith(".")
    } yield f
    val rowSeqs = for {
      f <- entries
      line <- Files.readAllLines(f).asScala
      m <- """"seq":(\d+)""".r.findFirstMatchIn(line)
    } yield m.group(1).toLong
    // file-NAME seqs count too: writeLines/compactKind consume counter
    // values for names beyond any row seq, and a compaction snapshot
    // written as the process's LAST act has a name-seq ABOVE every row
    // inside it — seeding from rows alone would let the next process
    // issue name-seqs at or below that snapshot's cover, making its
    // first commits permanently invisible to effectiveFiles
    val nameSeqs = entries.map(f => nameSeq(f.getFileName.toString))
    (rowSeqs ++ nameSeqs ++ Seq(0L)).max
  }

  def nextSeq(): Long = seqCounter.incrementAndGet()

  private def esc(s: String): String =
    Option(s).getOrElse("").flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  private def writeFile(kind: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(dir(kind))
    val tmp = dir(kind).resolve(s".$name.tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir(kind).resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeLines(kind: String, lines: Seq[String]): Unit = {
    if (lines.isEmpty) return
    // incrementAndGet (not get): file-name seqs are strictly monotone
    // within a process, so a compaction snapshot's name-seq strictly
    // bounds every file it absorbed and every later commit exceeds it
    writeFile(kind,
      f"commit-${seqCounter.incrementAndGet()}%012d-${java.util.UUID.randomUUID()}.jsonl",
      lines)
  }

  private def nameSeq(name: String): Long =
    name.stripPrefix("commit-").takeWhile(_.isDigit) match {
      case "" => -1L; case d => d.toLong
    }

  /** The files a read must scan: the newest compaction snapshot (if
    * any) plus commit files strictly newer than it. Commit files at or
    * below the snapshot's name-seq existed when the snapshot was
    * written (name-seqs are monotone), so their rows are already inside
    * it — they are deletion debris from a crash mid-[[compact]].
    */
  private def effectiveFiles(kind: String): Seq[java.nio.file.Path] = {
    if (!Files.exists(dir(kind))) return Seq.empty
    val all = Files.list(dir(kind)).iterator().asScala.toSeq
      .filterNot(_.getFileName.toString.startsWith("."))
    val compacts = all.filter(_.getFileName.toString.contains("-compact-"))
    val kept =
      if (compacts.isEmpty) all
      else {
        val best = compacts.maxBy(p =>
          (nameSeq(p.getFileName.toString), p.getFileName.toString))
        val cover = nameSeq(best.getFileName.toString)
        best +: all.filter(p => !p.getFileName.toString.contains("-compact-") &&
          nameSeq(p.getFileName.toString) > cover)
      }
    kept.sortBy(_.getFileName.toString)
  }

  private def readLines(kind: String): Seq[String] =
    effectiveFiles(kind).flatMap(f => Files.readAllLines(f).asScala)

  private val kinds = Seq("checkpoints", "lineage", "metrics", "logs")

  /** Rewrite each kind into one snapshot file (see class doc). Safe to
    * call any time the single writer is not mid-commit.
    */
  def compact(): Unit = kinds.foreach(k => compactKind(k, effectiveFiles(k)))

  /** Compact only kinds fragmented into ≥ `minFiles` files — the cheap
    * periodic form for job entry points and streaming hooks.
    */
  def compactIfNeeded(minFiles: Int = 64): Unit =
    kinds.foreach { k =>
      val files = effectiveFiles(k)
      if (files.size >= minFiles) compactKind(k, files)
    }

  private def compactKind(kind: String,
      effective: Seq[java.nio.file.Path]): Unit = {
    // sweep crash debris FIRST (files below the cover, invisible to
    // readers since an earlier crash mid-delete) — even when there is
    // nothing to rewrite, or debris would survive every future
    // compaction and keep growing the loadMaxSeq startup scan
    if (Files.exists(dir(kind))) {
      val eff = effective.toSet
      Files.list(dir(kind)).iterator().asScala.toSeq
        .filterNot(eff.contains)
        .filterNot(_.getFileName.toString.startsWith("."))
        .foreach(Files.deleteIfExists(_))
    }
    if (effective.size < 2 &&
        !effective.exists(f => !f.getFileName.toString.contains("-compact-"))) return
    val lines = effective.flatMap(f => Files.readAllLines(f).asScala)
    if (lines.isEmpty) return
    val retained = kind match {
      case "checkpoints" | "lineage" =>
        // latest-wins per (tier, partition) — the only read semantics
        // these kinds have; preserve seq order for determinism
        lines.groupBy(l => (field(l, "tier"), field(l, "partition")))
          .map { case (_, vs) => vs.maxBy(l => numField(l, "seq")) }
          .toSeq.sortBy(l => numField(l, "seq"))
      case _ => lines // metrics sum, logs are the human record: keep all
    }
    val name =
      f"commit-${seqCounter.incrementAndGet()}%012d-compact-${java.util.UUID.randomUUID()}.jsonl"
    writeFile(kind, name, retained)
    // delete the absorbed files LAST: a crash here leaves files whose
    // name-seq ≤ the snapshot's — invisible to effectiveFiles, swept
    // by the next compaction's debris pass
    effective.foreach(Files.deleteIfExists(_))
  }

  private def field(line: String, name: String): String =
    s""""$name":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(line).map(_.group(1))
      .getOrElse("")

  private def numField(line: String, name: String): Long =
    s""""$name":(-?\\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(0L)

  private def numFieldOr(line: String, name: String, default: Long): Long =
    s""""$name":(-?\\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toLong).getOrElse(default)

  // --- checkpoints ----------------------------------------------------

  def commitCheckpoints(cps: Seq[Checkpoint]): Unit =
    writeLines("checkpoints", cps.map(c =>
      s"""{"tier":"${esc(c.tier)}","partition":"${esc(c.partition)}","watermarkUs":${c.watermarkUs},"status":"${esc(c.status)}","jobId":"${esc(c.jobId)}","seq":${c.seq},"rawCount":${c.rawCount}}"""))

  /** Latest checkpoint per (tier, partition), by seq. */
  def checkpoints: Map[(String, String), Checkpoint] =
    readLines("checkpoints")
      .map(l => Checkpoint(field(l, "tier"), field(l, "partition"),
        numField(l, "watermarkUs"), field(l, "status"), field(l, "jobId"),
        numField(l, "seq"),
        // pre-rawCount lines read as unknown, not as count 0 — an
        // upgraded store must not mark every old closed day dirty
        numFieldOr(l, "rawCount", -1L)))
      .groupBy(c => (c.tier, c.partition))
      .map { case (k, vs) => k -> vs.maxBy(_.seq) }

  /** COMPLETED partitions whose recorded raw-input census no longer
    * matches the current one — late arrivals (or removals) for CLOSED
    * days, which the plain resume anti-join would silently skip.
    * Unknown recorded counts (-1) never read as dirty; a day missing
    * from `currentCounts` entirely is not reported (there is nothing
    * to recompute FROM — the append-only input model does not delete
    * whole days).
    */
  def dirtyPartitions(tier: String, currentCounts: Map[String, Long]): Set[String] =
    checkpoints.collect {
      case ((t, p), c) if t == tier && c.status == "COMPLETED" &&
        c.rawCount >= 0 && currentCounts.get(p).exists(_ != c.rawCount) => p
    }.toSet

  /** Partitions of `tier` already COMPLETED — the resume planner's
    * anti-join set (reference: replay-only-failed,
    * `MigrationInitializer.java:62-75`).
    */
  def completedPartitions(tier: String): Set[String] =
    completedPartitions(tier, checkpoints)

  /** Overload over a pre-read checkpoint map — callers inspecting
    * several tiers (the serving stitch) read the files once and keep
    * the ONE COMPLETED-status predicate defined here.
    */
  def completedPartitions(tier: String,
      cps: Map[(String, String), Checkpoint]): Set[String] =
    cps.collect {
      case ((t, p), c) if t == tier && c.status == "COMPLETED" => p
    }.toSet

  // --- lineage ----------------------------------------------------------

  def commitLineage(rows: Seq[LineageRow]): Unit =
    writeLines("lineage", rows.map(r =>
      s"""{"tier":"${esc(r.tier)}","partition":"${esc(r.partition)}","status":"${esc(r.status)}","error":"${esc(r.error)}","retryCount":${r.retryCount},"rows":${r.rows},"jobId":"${esc(r.jobId)}","seq":${r.seq}}"""))

  def lineage: Seq[LineageRow] =
    readLines("lineage").map(l => LineageRow(
      field(l, "tier"), field(l, "partition"), field(l, "status"),
      field(l, "error"), numField(l, "retryCount").toInt, numField(l, "rows"),
      field(l, "jobId"), numField(l, "seq")))

  /** Latest lineage row per (tier, partition). */
  def latestLineage: Map[(String, String), LineageRow] =
    lineage.groupBy(r => (r.tier, r.partition))
      .map { case (k, vs) => k -> vs.maxBy(_.seq) }

  // --- metrics ----------------------------------------------------------

  def commitMetrics(rows: Seq[MetricsRow]): Unit =
    writeLines("metrics", rows.map(r =>
      s"""{"jobId":"${esc(r.jobId)}","tier":"${esc(r.tier)}","processed":${r.processed},"failed":${r.failed},"seq":${r.seq}}"""))

  def metrics: Seq[MetricsRow] =
    readLines("metrics").map(l => MetricsRow(
      field(l, "jobId"), field(l, "tier"), numField(l, "processed"),
      numField(l, "failed"), numField(l, "seq")))

  // --- leveled migration log -------------------------------------------

  /** Append-only leveled job log — the reference's `migration_logs`
    * stream (`H2DatabaseManager.java:55-62`: ts, level
    * INFO/WARNING/ERROR, message per job). Lineage rows carry errors;
    * this is the human-facing channel for non-fatal signals (precision
    * loss, rejects, retries) that the reference logs at WARNING.
    */
  final case class LogRow(
      tsMs: Long, level: String, tier: String, message: String,
      jobId: String, seq: Long)

  private val logLevels = Set("INFO", "WARNING", "ERROR")

  def log(level: String, tier: String, message: String, jobId: String): Unit = {
    require(logLevels.contains(level), s"bad log level: $level")
    commitLogs(Seq(LogRow(
      System.currentTimeMillis(), level, tier, message, jobId, nextSeq())))
  }

  def commitLogs(rows: Seq[LogRow]): Unit =
    writeLines("logs", rows.map(r =>
      s"""{"tsMs":${r.tsMs},"level":"${esc(r.level)}","tier":"${esc(r.tier)}","message":"${esc(r.message)}","jobId":"${esc(r.jobId)}","seq":${r.seq}}"""))

  def logs: Seq[LogRow] =
    readLines("logs").map(l => LogRow(
      numField(l, "tsMs"), field(l, "level"), field(l, "tier"),
      field(l, "message"), field(l, "jobId"), numField(l, "seq")))

  /** Cross-run retry state: partitions of `tier` whose LATEST lineage is
    * FAILED, with their accumulated failed-run count — the resume
    * planner's poison filter (`RowProcessingDAO.java:121-135`:
    * `status='FAILED' AND retry_count < max`).
    */
  def failedRetryCounts(tier: String): Map[String, Int] =
    latestLineage.collect {
      case ((t, p), r) if t == tier && r.status == "FAILED" && p != "*" =>
        p -> r.retryCount
    }
}
