package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver harness.
  *
  * All `SparkEntry.queries` entries take an `sfDir` pointing at one of
  * `/root/testdata/sf{0.001,0.01,0.1}` (see TESTDATA.md). Each table is one
  * parquet file; Catalyst prunes columns/pushes filters into the scan, so the
  * accessors stay plain `spark.read.parquet` with no caching tricks — at
  * 100 TB these would be partitioned table paths and the same code holds.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` has shipped with two physical `ts` types across data
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read nanos as long, truncate to micros with INTEGER division; a double
    * division would lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ). Both normalize to a session-zone TIMESTAMP
    * so every downstream operator and verify dump sees one type; sessions run
    * UTC, so the NTZ→LTZ cast is value-preserving. DuckDB truncates nanos →
    * micros identically and reads micros natively, so oracles agree either
    * way. */
  private def eventsRawTyped(spark: SparkSession, sfDir: String): DataFrame = {
    // The NTZ→LTZ cast in normalizeTs and the NTZ-literal compare in
    // eventsRange are value-preserving ONLY under a UTC session zone; a
    // session built without it would silently shift every timestamp, so
    // fail loudly here (every entrypoint and SparkSpec set UTC).
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "events access requires spark.sql.session.timeZone=UTC — the " +
        "NTZ→LTZ normalization is only value-preserving in UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  private def tsIsLegacyNanos(df: DataFrame): Boolean =
    df.schema("ts").dataType == org.apache.spark.sql.types.LongType

  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (tsIsLegacyNanos(df))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(eventsRawTyped(spark, sfDir))

  /** Range-pruned events scan: the predicate is applied to the RAW scan
    * column BEFORE the timestamp normalization, so it pushes into the
    * parquet scan (min/max row-group skipping). Filtering the converted `ts`
    * instead defeats pushdown — `timestamp_micros(ts div 1000) >= x` is
    * opaque to the source. At 100 TB this is the difference between scanning
    * a day and scanning the table. For micros files the native NTZ predicate
    * pushes down directly; for legacy nanos files the compare is on the raw
    * long. Both branches are plan-asserted in TablesSpec (PushedFilters
    * carries the ts bounds on a real NTZ file — measured, per the repo's
    * measure-don't-assume rule). */
  def eventsRange(spark: SparkSession, sfDir: String, fromIso: String,
                  toIso: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    def ldt(s: String): java.time.LocalDateTime =
      if (s.length == 10) java.time.LocalDate.parse(s).atStartOfDay()
      else java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    val raw = eventsRawTyped(spark, sfDir)
    val filtered =
      if (tsIsLegacyNanos(raw)) {
        def nanos(s: String): Long =
          ldt(s).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
        raw.filter(col("ts") >= nanos(fromIso) && col("ts") < nanos(toIso))
      } else
        raw.filter(col("ts") >= lit(ldt(fromIso)) && col("ts") < lit(ldt(toIso)))
    normalizeTs(filtered)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
