package graft

import graft.engine.{Order, Tables}
import org.apache.spark.sql.functions._

class OrderSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("seededShuffle: pos is an exact permutation of 0..N-1 and matches " +
    "a driver-side sort under the same md5 order") {
    val ids = (0L until 200L)
    val df = ids.toDF("doc_id").repartition(7)
    val out = Order.seededShuffle(df, col("doc_id"), seed = 42L,
        numShards = 8, numParts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._2).sorted shouldBe ids.toArray
    val expected = ids.map(id => id -> (md5Hex(s"$id:42") + id.toString))
      .sortBy(_._2).map(_._1).zipWithIndex
      .map { case (id, i) => (id, i.toLong, i.toLong % 8) }.toArray
    out.sortBy(_._2) shouldBe expected
  }

  test("globalOrderIndex: positions are independent of numParts and of " +
    "input partitioning — partitioning changes the split, never the order") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    def run(parts: Int, inParts: Int): Map[Long, Long] =
      Order.seededShuffle(df.repartition(inParts), col("doc_id"), 7L, 4, parts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(8, 3)
    run(1, 3) shouldBe base
    run(3, 11) shouldBe base
    run(8, 3) shouldBe base // deterministic re-run
  }

  test("seededShuffle: round-robin shards are balanced to within one row " +
    "and different seeds give different permutations") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    val a = Order.seededShuffle(df, col("doc_id"), 1L, 8, 8)
    val sizes = a.groupBy("shard").count().collect().map(_.getLong(1))
    sizes.length shouldBe 8
    (sizes.max - sizes.min) should be <= 1L
    val b = Order.seededShuffle(df, col("doc_id"), 2L, 8, 8)
    val posA = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posB = b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    posA should not be posB
  }

  test("globalOrderIndex: empty input yields an empty indexed frame") {
    val df = Seq.empty[Long].toDF("doc_id")
    Order.seededShuffle(df, col("doc_id"), 42L, 8, 4).count() shouldBe 0L
  }
}
