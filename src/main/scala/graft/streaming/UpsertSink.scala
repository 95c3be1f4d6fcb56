package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once keyed UPSERT sink for Structured Streaming, built on
  * `foreachBatch` (SURVEY §2.7's "streaming sinks/output modes" row —
  * the one surface that was design-note-only before r9).
  *
  * The pattern is the standard lakehouse-writer recipe: an update-mode
  * stream emits refined rows per key each micro-batch; `foreachBatch`
  * turns each micro-batch into a BATCH merge against the current table
  * snapshot. Exactly-once comes from composing two guarantees:
  *  - the streaming checkpoint replays a failed batch with the SAME
  *    `batchId`, and
  *  - this sink is IDEMPOTENT per `batchId`: the table pointer records
  *    the last applied id, and a replayed (≤ last) batch is a no-op.
  *
  * Table layout (engine-level, no table-format dependency):
  * {{{
  *   tableDir/v_<batchId>/part-*.parquet   // immutable snapshot
  *   tableDir/_latest                      // "v_<batchId>\t<batchId>"
  * }}}
  * `_latest` is published by write-temp-then-ATOMIC_MOVE, so readers
  * never observe a torn pointer and a crash between snapshot write and
  * publish leaves the previous snapshot live (the half-written v_ dir
  * is simply re-written on replay — same batchId, same content).
  *
  * Merge semantics: last-write-wins per key — a batch row replaces the
  * current row wholesale (key columns are non-null by contract, so
  * "batch side present" is detected on the first key column). Update
  * mode never emits deletes; a tombstone column composes on top if
  * needed (filter after merge, as in q_merge_upsert).
  *
  * Scale: each merge is ONE full-outer shuffle of (table ⋈ batch) on
  * the key — no driver loops, no per-row lookups. At 100 TB the same
  * contract maps onto a format with transactional MERGE (Delta/Iceberg
  * `whenMatched`/`whenNotMatched`) or a bucket-partitioned table where
  * only key-buckets touched by the batch are rewritten; the
  * batchId-idempotence discipline is identical. For an append-only
  * stream of CLOSED windows (append mode after watermark), prefer a
  * plain partitioned-append sink — upsert is for refining state.
  */
object UpsertSink {

  private def pointerPath(tableDir: String): Path = Paths.get(tableDir, "_latest")

  /** Recursive delete (children-first walk); shared by vacuum and the
    * scratch-dir resets in ops.Streaming. */
  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }

  /** (snapshot subdir, last applied batchId), if any snapshot is live. */
  private[graft] def readPointer(tableDir: String): Option[(String, Long)] = {
    val p = pointerPath(tableDir)
    if (!Files.exists(p)) None
    else {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.split('\t')
      Some((parts(0), parts(1).toLong))
    }
  }

  /** Current table snapshot (empty-schema'd None before the first commit). */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    readPointer(tableDir).map { case (v, _) =>
      spark.read.parquet(Paths.get(tableDir, v).toString)
    }

  /** Batch ids with a live COMMITTED snapshot, ascending. Only ids at
    * or below the published pointer count: a crash between snapshot
    * write and pointer publish leaves a half-written v_ dir with a
    * HIGHER id than the pointer — listing it would hand readers
    * unpublished (possibly torn) data. Non-numeric v_* strays are
    * ignored, not fatal. */
  def versions(tableDir: String): Seq[Long] = {
    val committed = readPointer(tableDir).map(_._2)
    val d = new java.io.File(tableDir)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      .flatMap(_.getName.stripPrefix("v_").toLongOption)
      .filter(v => committed.exists(v <= _))
      .sorted
  }

  /** Time travel: the table AS OF a batch id — the newest snapshot with
    * id ≤ asOfBatch (immutable snapshots make this free). None if no
    * snapshot that old exists. */
  def readTableAsOf(spark: SparkSession, tableDir: String,
                    asOfBatch: Long): Option[DataFrame] =
    versions(tableDir).filter(_ <= asOfBatch).lastOption.map(v =>
      spark.read.parquet(Paths.get(tableDir, s"v_$v").toString))

  /** Retention: drop all but the newest `keep` snapshots. The live
    * pointer target is always retained (keep ≥ 1 enforced); concurrent
    * readers of a reaped old version fail like any vacuumed table
    * format — retention is a policy knob, not a consistency one. */
  def vacuum(tableDir: String, keep: Int): Unit = {
    require(keep >= 1, "vacuum must keep at least the live snapshot")
    // finish any reap a previous crash left half-done: .reap_* dirs are
    // invisible to readers but would otherwise leak disk forever
    Option(new java.io.File(tableDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(".reap_"))
      .foreach(f => deleteRecursively(f.toPath))
    val live = readPointer(tableDir).map(_._2)
    versions(tableDir).dropRight(keep)
      .filterNot(live.contains) // never reap the published snapshot
      .foreach { v =>
        // rename OUT of the v_ namespace first (atomic), then delete:
        // a crash mid-delete leaves a .reap_* dir that versions() and
        // as-of reads never see — torn snapshots are invisible, not
        // silently-partial (and the sweep above reclaims them)
        val dir = Paths.get(tableDir, s"v_$v")
        val doomed = Paths.get(tableDir, s".reap_v_$v")
        Files.move(dir, doomed, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(doomed)
      }
  }

  /** The pure merge: ONE full-outer join of (table ⋈ batch) on the key,
    * batch side winning wholesale where present (key columns are
    * non-null by contract). Declarative, so Catalyst picks the join
    * strategy — a small refining batch broadcasts against a large
    * table; two large sides sort-merge. Exposed for plan audits and
    * batch backfills. */
  def merge(cur: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame = {
    // schema drift fails loudly: a silently-dropped new column (or a
    // coalesce against a missing old one) corrupts every later snapshot
    require(cur.columns.sorted.sameElements(batch.columns.sorted),
      s"upsert schema drift: table has [${cur.columns.sorted.mkString(",")}], " +
        s"batch has [${batch.columns.sorted.mkString(",")}] — migrate the " +
        "table snapshot before streaming the new schema")
    val cols = batch.columns.toSeq
    val b = batch.alias("b")
    val c = cur.alias("c")
    val keyEq = keyCols.map(k => col(s"b.$k") <=> col(s"c.$k")).reduce(_ && _)
    val fromBatch = col(s"b.${keyCols.head}").isNotNull
    c.join(b, keyEq, "full_outer")
      .select(cols.map(n =>
        when(fromBatch, col(s"b.$n")).otherwise(col(s"c.$n")).as(n)): _*)
  }

  /** Merge one micro-batch into the table; returns false iff skipped as
    * an already-applied replay. Public so specs (and batch backfills)
    * can drive the exact code path the stream runs. */
  def mergeBatch(batch: DataFrame, batchId: Long, tableDir: String,
                 keyCols: Seq[String]): Boolean = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    Files.createDirectories(Paths.get(tableDir))
    val current = readPointer(tableDir)
    if (current.exists(_._2 >= batchId)) {
      // Replayed batch: write nothing — but still CONSUME every
      // partition. Structured Streaming validates that foreachBatch
      // processed the whole DataFrame (the upstream stateful operator
      // only commits its state stores when its partitions run); a
      // pure early-return fails the restarted batch with
      // STATE_STORE_COMMIT_VALIDATION_FAILED.
      batch.foreach(_ => ())
      return false
    }

    val spark = batch.sparkSession
    val merged = current match {
      case None => batch
      case Some((v, _)) =>
        merge(spark.read.parquet(Paths.get(tableDir, v).toString), batch, keyCols)
    }
    val vNew = s"v_$batchId"
    merged.write.mode("overwrite").parquet(Paths.get(tableDir, vNew).toString)
    val tmp = Paths.get(tableDir, s"._latest.$batchId.tmp")
    Files.write(tmp, s"$vNew\t$batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(tableDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    true
  }

  /** Start an update-mode stream draining into the upsert table. */
  def start(stream: DataFrame, tableDir: String, checkpointDir: String,
            keyCols: Seq[String]): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, tableDir, keyCols); ()
      }
      .start()
}
