package graft

import org.apache.spark.sql.functions._

/** S10/S12/S17 (SURVEY §2.1/§2.6): JDBC scan, append, batched insert.
  *
  * The engine path is Spark's built-in JDBC source — this repo adds no code
  * for it — so the spec's job is to prove the declared passthrough actually
  * executes: write (overwrite), batched append, whole read-back, and a
  * partitioned parallel scan, against an embedded in-memory Derby (the one
  * JDBC engine that ships in /opt/spark/jars). Closes round-1's "declared
  * built-in but never executed" gap for the three JDBC rows.
  *
  * (reference: fetch_data/common/db_upload.py — psycopg2 `execute_values`
  * batched inserts into Postgres; fetch_data/pv/daily_pv_automation.py reads
  * resume points back over the same connection.)
  *
  * Scale note: the partitioned read (`partitionColumn`/bounds/numPartitions)
  * is the 100 TB shape — one range query per task, no single-connection
  * bottleneck; `batchsize` on the write is the execute_values equivalent.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  // keep Derby's log out of the repo tree
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc: overwrite write, batched append, whole + partitioned read") {
    val base = (1L to 100L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "v")
    base.write.mode("overwrite").jdbc(url, "graft_t", props)          // S12

    val more = (101L to 120L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "v")
    more.write.mode("append").option("batchsize", "7")                // S17
      .jdbc(url, "graft_t", props)

    val back = spark.read.jdbc(url, "graft_t", props)                 // S10
    back.count() shouldBe 120L
    val row = back.filter(col("id") === 5L).select("name", "v").head()
    row.getString(0) shouldBe "name_5"
    row.getDouble(1) shouldBe 7.5

    // parallel scan: one range predicate per task
    val part = spark.read.jdbc(url, "graft_t", "id", 1L, 121L, 4, props)
    part.rdd.getNumPartitions shouldBe 4
    part.agg(sum("id").as("s")).head().getLong(0) shouldBe (1L to 120L).sum
  }
}
