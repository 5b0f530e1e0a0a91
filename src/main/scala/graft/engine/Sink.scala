package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 sink semantics on parquet tables.
  *
  * The reference's write patterns map onto three idempotent file-sink shapes:
  *  - S13 delete+insert of a date range inside a txn
  *    (daily_pv_automation.py:201-224, nambu_backfill.py:285-298) →
  *    dynamic partition overwrite: only the date partitions present in the
  *    incoming frame are replaced, atomically per partition.
  *  - S14 keyed upsert `ON CONFLICT DO UPDATE`
  *    (namdong_wind_collect.py:191-225) → read + [[Dedup.upsert]] + rewrite.
  *  - S15/S16 truncate/replace (hangyoung_wind_load.py:65-67,
  *    initial_db_ingestion.py:138) → `mode("overwrite")`.
  *
  * Scale: partition layout is `p_date=YYYY-MM-DD` — date predicates
  * partition-prune at read (the reference's B-tree-on-datetime equivalent,
  * SURVEY.md §4), and a daily re-run rewrites only that day's partitions no
  * matter how big the table is. The S14 full-rewrite path is only for keyed
  * tables that cannot be date-partitioned; prefer S13 at scale.
  */
object Sink {

  /** S13: write `df` partitioned by the date of `ts`, dynamically overwriting
    * ONLY the partitions the frame contains — the delete+insert-range
    * equivalent. Re-running the same day is a no-op-identical rewrite
    * (idempotent); other days are untouched. */
  def overwriteDatePartitions(df: DataFrame, ts: Column, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // repartition by the partition column first: one task per date →
    // one file per partition dir, not (tasks × dates) small files
    try df.withColumn("p_date", to_date(ts))
      .repartition(col("p_date"))
      .write.partitionBy("p_date").mode(SaveMode.Overwrite).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** S14: keyed upsert into a parquet table — read-merge-rewrite with the
    * incoming side winning on key conflict. Writes to a temp path first, then
    * swaps via [[swapStaged]], so a failed job never truncates the table.
    *
    * COMMIT CONTRACT: single POSIX filesystem (or HDFS) ONLY — see
    * [[swapStaged]]. On S3/GCS at 100 TB, commit through a metastore/table-
    * format pointer flip (Hive location swap, Iceberg/Delta commit) instead;
    * directory rename there is non-atomic copy+delete. */
  def upsertParquet(spark: SparkSession, incoming: DataFrame, path: String,
                    keys: Seq[String], tieBreak: Seq[Column]): Unit = {
    val target = new java.io.File(path)
    val merged = if (target.exists()) {
      val existing = spark.read.parquet(path)
      Dedup.upsert(existing, incoming.select(existing.columns.map(col): _*),
        keys, tieBreak)
    } else incoming
    val tmp = path + "._staged"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapStaged(new java.io.File(tmp), target)
  }

  /** Staged swap of a freshly-written table directory into place:
    * `target` → `target._old`, `tmp` → `target`, drop `target._old`.
    *
    * CONTRACT — single-filesystem `rename(2)` semantics: both renames must be
    * atomic metadata moves, which holds on one POSIX FS and on HDFS, and does
    * NOT hold on object stores (S3/GCS "rename" = copy+delete per object).
    * Every rename is CHECKED: an ignored failure followed by delete would
    * destroy the only copy. If the swap-in fails after the table was staged
    * aside, the backup is restored before the error propagates — the table
    * survives any single failure. A crash BETWEEN the two renames leaves the
    * data intact at `target._old`; recover by renaming it back. */
  private[graft] def swapStaged(tmp: java.io.File, target: java.io.File): Unit = {
    val bak = new java.io.File(target.getPath + "._old")
    if (target.exists()) {
      delete(bak)
      if (!target.renameTo(bak))
        throw new java.io.IOException(
          s"swapStaged: cannot stage $target aside to $bak")
    }
    if (!tmp.renameTo(target)) {
      // restore the backup before failing — the table must survive
      if (bak.exists()) bak.renameTo(target)
      throw new java.io.IOException(s"swapStaged: swap of $tmp into $target failed")
    }
    delete(bak)
  }

  /** S15/S16: full replace. */
  def replaceTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed managed table: pre-shuffles once at write time so that every
    * subsequent equi-join/aggregation on `keys` between co-bucketed tables
    * runs with NO exchange (the 100 TB co-location strategy for repeatedly
    * joined fact tables — SURVEY §4's B-tree-index analogue for joins).
    * Managed-catalog only: bucketing metadata lives in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet table to ~targetFileMB files.
    * Daily S13 runs produce one file per day per run; long-lived tables need
    * periodic compaction to keep scan task counts sane at 100 TB.
    * Same single-FS commit contract as [[swapStaged]]. */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 256): Unit = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      (bytes / (targetFileMB.toLong << 20)).toInt)
    val tmp = path + "._compact"
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(tmp)
    swapStaged(new java.io.File(tmp), new java.io.File(path))
  }

  /** S11: CSV sink (utf-8, header), append or overwrite. */
  def writeCsv(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write.option("header", "true")
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite).csv(path)

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }
}
