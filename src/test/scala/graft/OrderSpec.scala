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

  test("ceilLog2: integer bit math, exact at powers of two") {
    Order.ceilLog2(1L) shouldBe 0
    Order.ceilLog2(2L) shouldBe 1
    Order.ceilLog2(3L) shouldBe 2
    Order.ceilLog2(1024L) shouldBe 10
    Order.ceilLog2(1025L) shouldBe 11
    Order.ceilLog2((1L << 50) + 1) shouldBe 51 // float log2 misrounds here
  }

  test("zValue: hand-computed Morton codes, col 0 most significant") {
    // bits=2, ranges [0,3]: bucket == value, z = interleave(b1, b2)
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
    val z = df.select(Order.zValue(Seq(col("a"), col("b")),
      Seq((0L, 3L), (0L, 3L)), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    // (a,b)=(3,0): a bits at positions 1,3 → 0b1010 = 10
    // (a,b)=(0,3): b bits at positions 0,2 → 0b0101 = 5
    // (a,b)=(2,1): a=10,b=01 → 0b1001 = 9
    z shouldBe Array(0L, 10L, 5L, 15L, 9L)
  }

  test("zValue: range shift, null→min bucket, out-of-range clamps") {
    val df = Seq(Some(100L), Some(611L), None, Some(-5L), Some(99999L))
      .toDF("a")
    // range [100, 611]: span 512, ceilLog2=9, shift=9-2=7 at bits=2
    val z = df.select(Order.zValue(Seq(col("a")), Seq((100L, 611L)), bits = 2)
      .as("z")).collect().map(_.getLong(0))
    z shouldBe Array(0L, 3L, 0L, 0L, 3L) // (611-100)>>7=3; clamps at edges
  }

  test("zValue: sorting by z localizes BOTH dimensions (envelope shrink)") {
    // Uniform grid; after sorting by z, contiguous chunks should span a
    // small sub-range of EACH dimension, where an a-sort leaves b global.
    val rows = for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b)
    val df = rows.toDF("a", "b")
    val ranges = Seq((0L, 63L), (0L, 63L))
    val sortedByZ = df.orderBy(Order.zValue(Seq(col("a"), col("b")), ranges,
      bits = 6)).collect().map(r => (r.getLong(0), r.getLong(1)))
    val chunks = sortedByZ.grouped(256).toSeq // 16 chunks of a 4096 grid
    val zSpans = chunks.map { c =>
      val bs = c.map(_._2)
      bs.max - bs.min
    }
    // Each 256-row z-chunk is a 16×16 tile: b spans 15, not 63.
    all(zSpans) should be <= 15L
    val sortedByA = df.orderBy(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val aSpans = sortedByA.grouped(256).toSeq.map { c =>
      val bs = c.map(_._2); bs.max - bs.min
    }
    all(aSpans) shouldBe 63L // linear sort: every chunk spans all of b
  }
}
