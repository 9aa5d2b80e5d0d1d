package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packByBudget fills bins contiguously per shard by start offset") {
    // one shard so the packing is easy to eyeball: budget 10
    val docs = Seq((0L, 4L), (8L, 4L), (16L, 4L), (24L, 9L), (32L, 2L)).toDF("id", "nt")
    val out = Packing.packByBudget(docs, "id", col("nt"), budget = 10, shards = 8)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // all ids % 8 == 0 -> same shard; cumulative starts: 0,4,8,12,21
    assert(out == Map(0L -> 0L, 8L -> 0L, 16L -> 0L, 24L -> 1L, 32L -> 2L))
  }

  test("packByBudget shards are independent") {
    val docs = Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "nt")
    val out = Packing.packByBudget(docs, "id", col("nt"), budget = 6, shards = 2)
    // shard 0 holds ids 0,2; shard 1 holds 1,3 — each second doc starts at 5 < 6? no: starts 0 and 5 -> bins 0,0
    val bins = out.select("id", "shard", "bin").as[(Long, Long, Long)].collect().toSet
    assert(bins == Set((0L, 0L, 0L), (2L, 0L, 0L), (1L, 1L, 0L), (3L, 1L, 0L)))
  }

  test("hashSplit is deterministic, exhaustive, and respects percentages roughly") {
    val docs = spark.range(2000).toDF("doc_id")
    val out = Packing.hashSplit(docs, "doc_id", seed = 7, pcts = Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1400 && counts("val") < 400 && counts("test") < 400)
    // deterministic: same assignment on re-evaluation
    val again = Packing.hashSplit(docs, "doc_id", 7, Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("hashSplit rejects percentages that do not sum to 100") {
    intercept[IllegalArgumentException] {
      Packing.hashSplit(spark.range(1).toDF("doc_id"), "doc_id", 1, Seq("a" -> 50, "b" -> 40))
    }
  }

  test("weightedSample keeps per-group rates, deterministically") {
    val docs = spark.range(3000)
      .select($"id".as("doc_id"), concat(lit("g"), ($"id" % 3).cast("string")).as("grp"))
    val out = Packing.weightedSample(docs, "doc_id", "grp", seed = 5,
      ratesE6 = Map("g0" -> 1000000L, "g1" -> 500000L), defaultE6 = 0L)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("g0", 0L) === 1000L) // rate 1.0: everything kept
    assert(!counts.contains("g2")) // rate 0: nothing kept
    assert(counts("g1") > 350 && counts("g1") < 650) // ~half of 1000
    val again = Packing.weightedSample(docs, "doc_id", "grp", 5,
      Map("g0" -> 1000000L, "g1" -> 500000L), 0L)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("weightedSample plan is a pure filter — no shuffle, no join") {
    val docs = spark.range(100)
      .select($"id".as("doc_id"), lit("g").as("grp"))
    val p = Packing.weightedSample(docs, "doc_id", "grp", 1, Map("g" -> 700000L), 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), s"expected shuffle-free filter:\n$p")
  }

  test("temperatureMix derives sqrt-flattened keep rates from the corpus itself") {
    // 400 'big' docs, 100 'small': keep rate for big = sqrt(100/400)
    // = 0.5 exactly; the smallest domain keeps everything
    val docs = spark.range(500)
      .select($"id".as("doc_id"),
        when($"id" < 400, "big").otherwise("small").as("dom"))
    val out = Packing.temperatureMix(docs, "doc_id", "dom", seed = 3)
    val rates = out.select("dom", "rate_e6").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("big") == 500000L && rates("small") == 1000000L)
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(counts("small") == 100L) // rate 1.0: all kept
    assert(counts("big") > 130 && counts("big") < 270) // ~200 of 400
    // deterministic: the same seed reproduces the exact row set
    val again = Packing.temperatureMix(docs, "doc_id", "dom", seed = 3)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("kmvDistinct is exact under k and a sane estimator above it") {
    // group 'small' has 9 distinct ids (< k = 16): the sketch IS the
    // set, the answer is exact; 'big' has 4000: the KMV estimate from
    // the 16th-smallest hash must land within the sketch's error bar
    // (sigma ~ n/sqrt(k-2) ~ 27%; assert a loose 2x band)
    val docs = spark.range(4009)
      .select($"id".as("uid"), when($"id" < 9, "small").otherwise("big").as("grp"))
    val out = Packing.kmvDistinct(docs, "uid", "grp", seed = 5, k = 16)
      .select("grp", "n_kept", "est_distinct").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("small") == ((9L, 9L)))
    val (kept, est) = out("big")
    assert(kept == 16L)
    assert(est > 2000 && est < 8000, s"estimate $est implausible for 4000 distinct")
    // duplicate observations of the same id change nothing (distinct first)
    val doubled = docs.union(docs)
    val again = Packing.kmvDistinct(doubled, "uid", "grp", seed = 5, k = 16)
      .select("grp", "n_kept", "est_distinct").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == out)
  }

  test("weightedSample rejects rates outside [0, 1e6]") {
    intercept[IllegalArgumentException] {
      Packing.weightedSample(spark.range(1).toDF("doc_id").withColumn("g", lit("x")),
        "doc_id", "g", 1, Map("x" -> 2000000L), 0L)
    }
  }

  test("stratifiedCap equals the brute-force per-group hash rank, all strata") {
    // 3 strata: one over quota, one exactly at quota, one under
    val df = ((0 until 40).map(i => (i.toLong, "big")) ++
      (100 until 105).map(i => (i.toLong, "at")) ++
      (200 until 203).map(i => (i.toLong, "small"))).toDF("doc_id", "src")
    val out = Packing.stratifiedCap(df, "doc_id", "src", seed = 3, quota = 5)
      .select("doc_id", "src", "samp_rank").as[(Long, String, Long)].collect().toSet
    // brute force: rank by (md5 hash, id) inside each stratum, keep <= 5
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"src")
      .orderBy(graft.functions.Hashing.md5Long(concat(lit("cap:"), $"doc_id".cast("string")), 3), $"doc_id")
    val brute = df.withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter($"samp_rank" <= 5)
      .select("doc_id", "src", "samp_rank").as[(Long, String, Long)].collect().toSet
    assert(out == brute)
    assert(out.count(_._2 == "big") == 5)    // capped
    assert(out.count(_._2 == "at") == 5)     // exactly quota, all kept
    assert(out.count(_._2 == "small") == 3)  // under quota, all kept
    // determinism across runs
    val again = Packing.stratifiedCap(df, "doc_id", "src", seed = 3, quota = 5)
      .select("doc_id", "src", "samp_rank").as[(Long, String, Long)].collect().toSet
    assert(again == out)
  }

  test("stratifiedCap survives a threshold shortfall via the margin retry") {
    // quota 1 on a 2-row stratum: threshold ~= 2^60 * 2 * 1/2 = full
    // range, so no shortfall is even possible there; force the tight
    // case with a big stratum and quota 1 — margin 2 keeps ~2 rows in
    // expectation and the Chernoff guard must still return EXACTLY the
    // smallest hash. Run several seeds to cross the retry path with
    // high probability.
    val df = (0 until 400).map(i => (i.toLong, "g")).toDF("doc_id", "src")
    (1 to 5).foreach { seed =>
      val got = Packing.stratifiedCap(df, "doc_id", "src", seed = seed, quota = 1)
        .select("doc_id").as[Long].collect().toSeq
      val h = graft.functions.Hashing.md5Long(concat(lit("cap:"), $"doc_id".cast("string")), seed)
      val want = df.withColumn("h", h).orderBy($"h", $"doc_id")
        .select("doc_id").as[Long].head()
      assert(got == Seq(want), s"seed $seed")
    }
  }

  test("packByBudget rejects inputs whose columns clash with the generated ones") {
    // the carried-columns contract: shard/n_tokens/cum/bin are
    // generated, so a caller's column of the same name would be
    // silently overwritten — the guard names the clash instead
    for (c <- Seq("shard", "n_tokens", "cum", "bin")) {
      val docs = Seq((1L, 4, 9L)).toDF("id", "nt", c)
      val e = intercept[IllegalArgumentException] {
        Packing.packByBudget(docs, "id", col("nt"), budget = 10, shards = 2)
      }
      assert(e.getMessage.contains(c) && e.getMessage.contains("rename"), s"$c: ${e.getMessage}")
    }
  }

  test("temperatureMix rejects an input that already has a rate_e6 column") {
    val docs = Seq((1L, "web", 5L)).toDF("doc_id", "dom", "rate_e6")
    val e = intercept[IllegalArgumentException] {
      Packing.temperatureMix(docs, "doc_id", "dom", seed = 3)
    }
    assert(e.getMessage.contains("rate_e6") && e.getMessage.contains("rename"))
  }

  test("stratifiedCap rejects null strata and non-positive quotas") {
    val df = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("doc_id", "src")
    intercept[IllegalArgumentException] {
      Packing.stratifiedCap(df, "doc_id", "src", seed = 1, quota = 2).collect()
    }
    intercept[IllegalArgumentException] {
      Packing.stratifiedCap(df.filter($"src".isNotNull), "doc_id", "src", seed = 1, quota = 0)
    }
  }
}
