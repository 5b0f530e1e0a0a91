package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.Analytics
import graft.engine.expressions.MGBuffer

/** Misra–Gries sketch laws + exact heavy-hitters end-to-end. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  /** Deterministic sample stream from a generator (PropertySpec idiom). */
  private def forAll[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  // ---- MGBuffer unit laws ----

  test("MGBuffer: lower-bound counts and exact undercount tracking") {
    val b = new MGBuffer(2)
    Seq("a", "a", "a", "b", "c", "a", "b").foreach(s => b.add(u(s), 1))
    // Every stored count is a lower bound; undercount per key ≤ decremented.
    val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 1L)
    b.counts.foreach { case (k, c) =>
      val t = truth(k.toString)
      assert(c <= t && c >= t - b.decremented)
    }
    assert(b.counts.size <= 2)
  }

  test("MGBuffer: guarantee — any key above the eviction mass survives") {
    // Zipf-ish stream over 200 keys, capacity 16: heavy eviction.
    val rnd = new Random(7)
    val stream = Seq.fill(20000)(s"k${(rnd.nextGaussian().abs * 40).toInt}")
    val b = new MGBuffer(16)
    stream.foreach(s => b.add(u(s), 1))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) =>
      if (n > b.decremented) {
        assert(b.counts.contains(u(k)), s"key $k with count $n evicted " +
          s"despite decremented=${b.decremented}")
      }
    }
    assert(b.decremented <= stream.size / (16 + 1))
  }

  test("MGBuffer: merge preserves bounds across random merge trees") {
    forAll(Gen.choose(1L, 999999L)) { seed: Long =>
      val rnd = new Random(seed)
      val stream = Seq.fill(2000)(s"k${rnd.nextInt(50)}" * (1 + rnd.nextInt(2)))
      val parts = stream.grouped(100 + rnd.nextInt(400)).toSeq
      val buffers = parts.map { p =>
        val b = new MGBuffer(8); p.foreach(s => b.add(u(s), 1)); b
      }
      val merged = buffers.reduce { (x, y) => x.mergeFrom(y); x }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // Merged decremented still bounds every key's undercount.
      merged.counts.foreach { case (k, c) =>
        val t = truth(k.toString)
        assert(c <= t && c >= t - merged.decremented)
      }
      truth.foreach { case (k, n) =>
        if (n > merged.decremented) assert(merged.counts.contains(u(k)))
      }
    }
  }

  test("MGBuffer: weighted re-offer path (by > evicted min)") {
    val b = new MGBuffer(2)
    b.add(u("a"), 5); b.add(u("b"), 1); b.add(u("c"), 10)
    // c's insert evicts min(10, 1)=1 from all, re-offers 9 into free slot.
    assert(b.counts(u("c")) == 9L)
    assert(b.counts(u("a")) == 4L)
    assert(!b.counts.contains(u("b")))
    assert(b.decremented == 1L)
  }

  // ---- end-to-end ----

  private def skewed(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    // 10 hot keys ~60% of mass; 500-key uniform tail.
    Seq.fill(n)(if (rnd.nextInt(10) < 6) s"hot${rnd.nextInt(10)}"
                else s"cold${rnd.nextInt(500)}")
  }

  test("heavyHitters == exact groupBy-filter, under eviction pressure") {
    val data = skewed(30000, 11)
    val df = data.toDF("k").repartition(7)
    val got = Analytics.heavyHitters(df, col("k"), 10000L, capacity = 64)
      .as[(String, Long)].collect().toMap
    val n = data.size
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000000L >= n.toLong * 10000L }.toMap
    got shouldBe expected
  }

  test("heavyHitters: output is exact counts (not sketch lower bounds)") {
    val data = skewed(20000, 23)
    val df = data.toDF("k").repartition(5)
    val got = Analytics.heavyHitters(df, col("k"), 20000L, capacity = 32)
      .as[(String, Long)].collect().toMap
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (k, c) => assert(c == truth(k)) }
  }

  test("heavyHitters: partitioning-independent") {
    val data = skewed(10000, 42)
    val a = Analytics.heavyHitters(data.toDF("k").repartition(2), col("k"),
      15000L).as[(String, Long)].collect().toMap
    val b = Analytics.heavyHitters(data.toDF("k").repartition(13), col("k"),
      15000L).as[(String, Long)].collect().toMap
    a shouldBe b
  }

  test("heavyHitters: nulls skipped, share over non-null rows") {
    val df = (Seq.fill(80)(Some("x")) ++ Seq.fill(20)(Option.empty[String]) ++
      Seq.fill(5)(Some("y"))).toDF("k")
    val got = Analytics.heavyHitters(df, col("k"), 500000L)
      .as[(String, Long)].collect().toMap
    got shouldBe Map("x" -> 80L) // 80/85 > 50%; y is 5/85; null not a key
  }

  test("heavyHitters: loud failure when capacity defeats the guarantee") {
    val data = (0 until 5000).map(i => s"k${i % 1000}")
    val ex = intercept[IllegalArgumentException] {
      Analytics.heavyHitters(data.toDF("k").repartition(3), col("k"), 100L,
        capacity = 4).collect()
    }
    ex.getMessage should include("MG sketch too small")
  }

  test("heavyHitters: empty input") {
    val df = Seq.empty[String].toDF("k")
    Analytics.heavyHitters(df, col("k"), 1000L).count() shouldBe 0L
  }
}
