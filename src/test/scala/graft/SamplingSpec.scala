package graft

import graft.engine.{Sampling, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.range(0, 9000)
    .select(col("id"),
      element_at(typedlit(Seq("web", "code", "books")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("src"))

  test("capPerKey: exact cap, small keys whole, kept set == k smallest " +
    "md5 ranks, deterministic") {
    val rows = (0L until 40L).map(i => (i, if (i < 35) "big" else "small"))
      .toDF("id", "key")
    val out = Sampling.capPerKey(rows, col("id"), col("key"), 7)
    val kept = out.collect().map(r => r.getLong(0) -> r.getString(1))
    kept.count(_._2 == "big") shouldBe 7
    kept.count(_._2 == "small") shouldBe 5 // under the cap → all kept
    // the 7 kept "big" ids are exactly the 7 smallest md5 ranks
    val expected = rows.filter(col("key") === "big")
      .select(col("id"),
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("rk"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(7)
      .map(_._2).toSet
    kept.filter(_._2 == "big").map(_._1).toSet shouldBe expected
    Sampling.capPerKey(rows, col("id"), col("key"), 7)
      .collect().map(_.getLong(0)).toSet shouldBe kept.map(_._1).toSet
  }

  test("capPerKey: no forced broadcast — AQE broadcasts a small kept set, " +
    "degrades to a shuffled semi join when it can't") {
    val rows = (0L until 200L).map(i => (i, "k" + (i % 10))).toDF("id", "key")
    // small regime: the kept set is tiny, AQE converts the semi join to a
    // runtime broadcast
    val small = Sampling.capPerKey(rows, col("id"), col("key"), 3)
    small.collect()
    assert(small.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // web-scale-keys regime analogue: with broadcast disabled the SAME code
    // path must degrade to a shuffled join — a hard-coded broadcast hint
    // would pin the plan and OOM at k × 10⁷ domains (VERDICT r4 #2)
    val prev = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      scala.util.Try(Option(
        spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")))
        .getOrElse(None).getOrElse(""))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // fresh frame: plans are cached per QueryExecution (conf toggles
      // don't re-plan an existing DataFrame)
      val big = Sampling.capPerKey(rows, col("id"), col("key"), 3)
      big.collect()
      val p = big.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      // and the result is the same either way
      big.collect().map(_.getLong(0)).toSet shouldBe
        small.collect().map(_.getLong(0)).toSet
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._1)
      if (prev._2.nonEmpty)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev._2)
      else spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("temperatureMix: small sources kept whole, big sources flattened, " +
    "monotone in c") {
    val rows = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 909L).map(i => (i, "small"))).toDF("id", "src")
    def kept(c: Double): Map[String, Set[Long]] =
      Sampling.temperatureMix(rows, col("id"), col("src"), c)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val k3 = kept(3.0)
    k3("small").size shouldBe 9 // rate 3/3 = 1.0 → whole
    // big: rate 3/30 = 0.1 → ~90 of 900, binomial 4σ ≈ 36
    k3("big").size.toDouble shouldBe 90.0 +- 40.0
    val k6 = kept(6.0) // rates only rise → strict supersets
    k3("big").subsetOf(k6("big")) shouldBe true
    k3("small").subsetOf(k6("small")) shouldBe true
  }

  test("stratifiedSample: fractions honored within binomial noise") {
    val out = Sampling.stratifiedSample(fixture, col("id"), col("src"),
      Map("web" -> 0.2, "code" -> 0.5, "books" -> 1.0))
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3000 per stratum; 4 sigma ≈ 4*sqrt(3000*p*(1-p))
    counts("web").toDouble shouldBe 600.0 +- 90.0
    counts("code").toDouble shouldBe 1500.0 +- 110.0
    counts("books") shouldBe 3000L // fraction 1.0 keeps everything
  }

  test("stratifiedSample: deterministic, monotone in fraction, salt-sensitive") {
    def ids(f: Double, salt: Long = 0L): Set[Long] =
      Sampling.stratifiedSample(fixture, col("id"), col("src"),
          Map("web" -> f), salt)
        .select("id").collect().map(_.getLong(0)).toSet
    ids(0.3) shouldBe ids(0.3) // pure function of (id, salt)
    assert(ids(0.2).subsetOf(ids(0.5))) // raising f only ADDs rows
    ids(0.3, salt = 1L) should not be ids(0.3) // salt rotates the sample
    // strata not in the map are dropped entirely by default
    Sampling.stratifiedSample(fixture, col("id"), col("src"),
      Map("web" -> 1.0)).groupBy("src").count().count() shouldBe 1
  }

  test("mixFractions: binding stratum taken whole, others scaled to shares") {
    val f = Sampling.mixFractions(
      counts = Map("web" -> 300L, "code" -> 100L, "books" -> 500L),
      shares = Map("web" -> 0.5, "code" -> 0.5, "books" -> 0.0))
    // code binds: 100/0.5 = 200 total → web keeps 0.5*200/300
    f("code") shouldBe 1.0
    f("web") shouldBe (1.0 / 3.0) +- 1e-12
    f("books") shouldBe 0.0
    // a zero-count stratum never divides by zero
    Sampling.mixFractions(Map("a" -> 10L), Map("a" -> 1.0, "b" -> 1.0))("b")
      .shouldBe(0.0)
  }

  test("mixToShares on real documents: realized mix tracks targets") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = Sampling.mixToShares(docs, col("doc_id"), col("source"),
      Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.25))
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.keySet shouldBe Set("src1", "src2", "src3")
    // src1 should end up ~2x src2 and src3 (±small-corpus noise: strata are
    // only ~10-25 docs at sf0.01, so just check ordering and non-emptiness)
    counts.values.foreach(_ should be > 0L)
    counts("src1") should be >= counts("src2")
    counts("src1") should be >= counts("src3")
  }

  test("exactKPerStratum: exact counts, deterministic, salt-disjoint, " +
    "subset law under growing k") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def pick(k: Int, salt: Long = 0L) =
      Sampling.exactKPerStratum(docs, col("doc_id"), col("source"), k, salt)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val k10 = pick(10)
    // exactly k per stratum (every source has >= 10 docs at sf0.01)
    k10.groupBy(_._1).values.foreach(_.size shouldBe 10)
    pick(10) shouldBe k10 // deterministic
    // monotone in k: a larger sample CONTAINS the smaller one (hash ranks
    // are fixed, so growing k only appends)
    val k20 = pick(20)
    k10.subsetOf(k20) shouldBe true
    // a different salt draws a (near-certainly) different sample
    pick(10, salt = 7L) should not be k10
    // sampled ids actually exist in their stratum
    val bySrc = docs.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    k10.subsetOf(bySrc) shouldBe true
  }

  test("assignSplit: disjoint-exhaustive, deterministic, proportions, " +
    "stable under fraction refinement") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val splits = Seq(("train", 0.9), ("val", 0.05), ("test", 0.05))
    val out = Sampling.assignSplit(docs, col("doc_id"), splits)
      .select("doc_id", "split")
    val n = docs.count()
    out.count() shouldBe n // every doc assigned exactly once
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byName.keySet shouldBe Set("train", "val", "test")
    byName("train").toDouble / n shouldBe 0.9 +- 0.03
    byName("val").toDouble / n shouldBe 0.05 +- 0.02
    // deterministic: identical on a re-run
    val again = Sampling.assignSplit(docs, col("doc_id"), splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().foreach(r => again(r.getLong(0)) shouldBe r.getString(1))
    // splitting val into (val, test) never moves a train doc: same cut
    val coarse = Sampling.assignSplit(docs, col("doc_id"),
      Seq(("train", 0.9), ("rest", 0.1))).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().foreach { r =>
      if (r.getString(1) == "train") coarse(r.getLong(0)) shouldBe "train"
      else coarse(r.getLong(0)) shouldBe "rest"
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, col("doc_id"), Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("negativeSamples: k per anchor, never self, valid ids, deterministic " +
    "under repartitioning, seed-sensitive, broad coverage") {
    val ids = spark.range(0, 50).select(col("id"))
    val out = Sampling.negativeSamples(ids, col("id"), k = 5, seed = 11L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    out.length shouldBe 250
    out.groupBy(_._1).values.foreach { g =>
      g.map(_._2).sorted.toSeq shouldBe (1L to 5L) // exactly t = 1..k each
    }
    all(out.map(r => r._1 != r._3)) shouldBe true   // self-pair-free
    all(out.map(_._3)) should (be >= 0L and be < 50L)
    // pure function of (id, t, seed): layout-independent
    val re = Sampling.negativeSamples(ids.repartition(7), col("id"),
        k = 5, seed = 11L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    re shouldBe out
    val other = Sampling.negativeSamples(ids, col("id"), k = 5, seed = 12L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    other should not be out
    // uniform draws: with 250 draws over 49 others, nearly every id is
    // someone's negative (expected miss fraction e^-5.1 ≈ 0.6%)
    out.map(_._3).distinct.length.toDouble should be > 50 * 0.6
  }

  test("negativeSamples: two rows give each other as the only negative; " +
    "singleton corpus rejected") {
    val two = spark.range(0, 2).select(col("id"))
    val out = Sampling.negativeSamples(two, col("id"), k = 2, seed = 1L)
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, _, n) => n shouldBe (1L - a) }
    intercept[IllegalArgumentException] {
      Sampling.negativeSamples(spark.range(0, 1).select(col("id")),
        col("id"), k = 1, seed = 1L)
    }
  }

  /** Independent JVM-side replay of the weightedSample key: MD5 via
    * MessageDigest (not Spark), same (id:salt) input, same quantization. */
  private def esKey(id: Long, w: Long, salt: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(hex, 16) + 1L) / 4294967296.0
    val lnq = math.floor(1e6 * math.log(u)).toLong
    Math.floorDiv(lnq, w)
  }

  test("weightedSample matches an independent MD5 + E-S key replay") {
    val rows = (0L until 50L).map(i => (i, i % 7 + 1))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"), k = 10,
        salt = 7L)
      .as[(Long, Long, Long)].collect().toSeq
    val expected = rows
      .map { case (i, w) => (i, w, esKey(i, w, 7L)) }
      .sortBy { case (i, _, key) => (-key, i) }.take(10)
    got shouldBe expected
  }

  test("weightedSample: a larger weight never lowers a row's key " +
    "(E-S monotonicity) and sub-1 weights fail loudly") {
    val ids = spark.range(0, 100).select(col("id"))
    val k1 = Sampling.weightedSample(ids.withColumn("w", lit(1L)),
        col("id"), col("w"), k = 100)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val k9 = Sampling.weightedSample(ids.withColumn("w", lit(9L)),
        col("id"), col("w"), k = 100)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    k9.foreach { case (id, key) => key should be >= k1(id) }
    val bad = Seq((1L, 0L)).toDF("id", "w")
    intercept[Exception] {
      Sampling.weightedSample(bad, col("id"), col("w"), k = 1).collect()
    }
  }

  test("groupKFold: folds in [0,k), every group on exactly one fold, " +
    "matching the MD5 replay") {
    val df = (0 until 200).map(i => (i.toLong, s"g${i % 23}"))
      .toDF("id", "grp")
    val out = Sampling.groupKFold(df, col("grp"), k = 5, salt = 7L)
      .select(col("grp"), col("fold")).as[(String, Long)].collect()
    all(out.map(_._2)) should (be >= 0L and be < 5L)
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    byGroup.foreach { case (_, folds) => folds should have length 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    byGroup.foreach { case (g, folds) =>
      val hex = md.digest(s"$g:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      folds.head shouldBe java.lang.Long.parseLong(hex, 16) % 5
    }
  }
}
