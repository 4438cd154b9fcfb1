package graft.operators

import graft.SparkTestSession
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = (0L until 1000L)
    .map(i => (i, s"doc number $i body", if (i % 3 == 0) "en" else "de"))
    .toDF("id", "text", "lang")

  test("assignSplit is deterministic, exhaustive, and near the target fractions") {
    val split = Curation.assignSplit(docs, "id", "v1",
      Seq("test" -> 0.1, "val" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000L)
    // md5 is uniform: 10% ± a loose tolerance on 1000 rows
    assert(counts("test") > 60 && counts("test") < 140)
    assert(counts("val") > 60 && counts("val") < 140)
    // re-running yields the identical assignment (content-addressed)
    val again = Curation.assignSplit(docs, "id", "v1",
      Seq("test" -> 0.1, "val" -> 0.1))
    assert(split.select("id", "split").except(
      again.select("id", "split")).isEmpty)
  }

  test("assignSplit membership is stable under corpus growth") {
    val half = docs.filter(col("id") < 500)
    val fromHalf = Curation.assignSplit(half, "id", "v1",
      Seq("test" -> 0.1)).select("id", "split")
    val fromFull = Curation.assignSplit(docs, "id", "v1",
      Seq("test" -> 0.1)).filter(col("id") < 500).select("id", "split")
    assert(fromHalf.except(fromFull).isEmpty &&
      fromFull.except(fromHalf).isEmpty)
  }

  test("deterministicSample keeps a stable subset at roughly the rate") {
    val s = Curation.deterministicSample(docs, "id", "s1", 0.2)
    val n = s.count()
    assert(n > 120 && n < 280)
    // sample of a sample at a higher rate contains the lower-rate sample
    val s2 = Curation.deterministicSample(docs, "id", "s1", 0.1)
    assert(s2.select("id").except(s.select("id")).isEmpty)
  }

  test("rebalanceClasses hits the target mixture without up-sampling") {
    // 334 en / 666 de; target 50/50 → en is the binding class:
    // T = min(334/0.5, 666/0.5) = 668 → keep all 334 en, ~334 de
    val got = Curation.rebalanceClasses(docs, "id", "lang", "m1",
      Map("en" -> 0.5, "de" -> 0.5))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got("en") == 334L)
    assert(math.abs(got("de") - 334L) < 40)
  }

  test("rebalanceClasses drops classes absent from the target") {
    val got = Curation.rebalanceClasses(docs, "id", "lang", "m1",
      Map("en" -> 1.0))
    assert(got.filter(col("lang") =!= "en").isEmpty)
    assert(got.count() == 334L)
  }

  test("packByTokenBudget fills bins contiguously per shard") {
    val d = Seq((1L, "a", 1000L), (2L, "a", 1000L), (3L, "a", 1000L),
      (4L, "a", 100L), (5L, "b", 5000L), (6L, "b", 10L))
      .toDF("id", "shard", "toks")
    // shard a: offsets 0,1000,2000,3000 → bins 0,0,0,1
    val bins = Curation.packByTokenBudget(d, "id", "toks", "shard", 2048L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(bins(1L) == 0L && bins(2L) == 0L && bins(3L) == 0L)
    assert(bins(4L) == 1L)
    // shard b restarts at offset 0
    assert(bins(5L) == 0L && bins(6L) == 2L)
  }

  test("shuffleDeterministic is a reproducible salted permutation") {
    val once = Curation.shuffleDeterministic(docs, "id", "e1")
      .select("id").as[Long].collect().toSeq
    val again = Curation.shuffleDeterministic(docs, "id", "e1")
      .select("id").as[Long].collect().toSeq
    val otherEpoch = Curation.shuffleDeterministic(docs, "id", "e2")
      .select("id").as[Long].collect().toSeq
    assert(once == again)                       // reproducible
    assert(once.sorted == (0L until 1000L))     // a permutation, no loss
    assert(once != otherEpoch)                  // new salt = new order
    assert(once != (0L until 1000L).toSeq)      // actually shuffled
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val corpus = Seq(
      (1L, "prefix alpha beta gamma delta suffix"), // contains the 4-gram
      (2L, "alpha beta delta gamma"),               // same words, no 4-gram
      (3L, "totally unrelated content here")
    ).toDF("id", "text")
    val got = Curation.decontaminate(corpus, bench, "id", "text", n = 4)
      .select("id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("duplicateNgramRatio measures within-doc repetition") {
    val d = Seq(
      (1L, "spam spam spam spam spam"),   // 4 bigrams, 1 distinct → 0.75
      (2L, "all words here are unique"),  // no repeats → 0.0
      (3L, "x")                           // shorter than n → 0.0
    ).toDF("id", "text")
    val got = d.select(col("id"),
        round(TF.duplicateNgramRatio(col("text"), 2), 4).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.75 && got(2L) == 0.0 && got(3L) == 0.0)
  }

  test("chunkText windows overlap by window minus stride") {
    import graft.functions.{TextFunctions => TF}
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "short text")).toDF("id", "text")
    val got = d.select(col("id"),
        TF.chunkText(col("text"), 4, 2).as("chunks"))
      .as[(Long, Seq[String])].collect().toMap
    // 10 tokens, window 4, stride 2 → ceil(6/2)+1 = 4 chunks
    assert(got(1L) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(got(2L) == Seq("short text"))
  }

  test("unigramNll scores rare-word documents higher") {
    val d = Seq(
      (1L, "common common common common"),
      (2L, "common common common rareword"))
      .toDF("id", "text")
    val got = Curation.unigramNll(d, "id", "text")
      .select("id", "nll").as[(Long, Double)].collect().toMap
    // p(common)=7/8, p(rareword)=1/8; doc 2 mixes in the rare word
    val pc = 7.0 / 8.0; val pr = 1.0 / 8.0
    assert(math.abs(got(1L) - (-math.log(pc))) < 1e-3)
    assert(math.abs(got(2L) -
      ((-3 * math.log(pc) - math.log(pr)) / 4)) < 1e-3)
    assert(got(2L) > got(1L))
  }

  test("keepBestPerCluster keeps highest quality, ties to min id, singletons survive") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0), // cluster {1,2,3}: 2 wins tie vs 3
      (4L, 5.0),                          // singleton
      (5L, 7.0), (6L, 2.0))               // cluster {5,6}: 5 wins
      .toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Curation.keepBestPerCluster(docs, "id", "q", pairs, "a", "b")
      .select("id", "cluster", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1L, 3L), (4L, 4L, 1L), (5L, 5L, 2L)))
  }

  test("hashedLinearScore matches an independent md5-bucket recompute") {
    val weights = Array.tabulate(64)(b => ((b * 37) % 101 - 50) / 100.0)
    val d = Seq((1L, "the quick brown fox"), (2L, "zzz"), (3L, ""))
      .toDF("id", "text")
    val got = d
      .select(col("id"), filter(split(lower(trim(col("text"))), "\\s+"),
        w => length(w) > 0).as("ws"))
      .select(col("id"),
        TF.hashedLinearScore(col("ws"), weights, -0.1).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(hex(0)) * 16 +
        "0123456789abcdef".indexOf(hex(1))) % 64
    }
    def score(words: Seq[String]): Double = {
      val m = words.map(w => weights(bucket(w))).sum / words.size
      1.0 / (1.0 + math.exp(-(m - 0.1)))
    }
    assert(math.abs(got(1L).get -
      score(Seq("the", "quick", "brown", "fox"))) < 1e-12)
    assert(math.abs(got(2L).get - score(Seq("zzz"))) < 1e-12)
    assert(got(3L).isEmpty) // empty doc → null score, not a crash
  }

  test("removeBoilerplate drops recurring lines per source, keeps order") {
    val d = Seq(
      (1L, "s1", "HEAD\nbody one\nFOOT"),
      (2L, "s1", "HEAD\nbody two\nFOOT"),
      (3L, "s1", "HEAD\nbody three\nFOOT"),
      (4L, "s1", "HEAD\nrare line\nFOOT"),
      // s2: HEAD appears there too but only in 1 of 2 docs (50% but df<2
      // is the real guard here: df=1 → never boilerplate)
      (5L, "s2", "HEAD\nonly here"),
      (6L, "s2", "other\ncontent"))
      .toDF("id", "source", "text")
    val got = Curation.removeBoilerplate(d, "id", "text", "source",
        minDocFrac = 0.5)
      .select("id", "n_lines_kept", "n_lines_removed", "text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // s1: HEAD and FOOT in 4/4 docs → removed everywhere; bodies unique
    assert(got(1L) == ((1L, 1L, 2L, "body one")))
    assert(got(4L) == ((4L, 1L, 2L, "rare line")))
    // s2: HEAD df=1 in s2 → kept (boilerplate is per-source)
    assert(got(5L) == ((5L, 2L, 0L, "HEAD\nonly here")))
    assert(got(6L) == ((6L, 2L, 0L, "other\ncontent")))
  }

  test("removeBoilerplate never drops blank lines; all-boiler docs drop out") {
    val d = Seq(
      (1L, "s", "AD\n\nAD"),
      (2L, "s", "AD\n\nAD"),
      (3L, "s", "AD"))
      .toDF("id", "source", "text")
    val got = Curation.removeBoilerplate(d, "id", "text", "source",
        minDocFrac = 0.5)
      .select("id", "n_lines_kept", "text_clean")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // AD is boilerplate (3/3 docs); the blank line survives
    assert(got(1L) == ((1L, 1L, "")))
    assert(got(2L) == ((2L, 1L, "")))
    // doc 3 was only the boilerplate line → no surviving lines → dropped
    assert(!got.contains(3L))
  }

  test("knBigramNll matches an independent brute-force KN recompute") {
    val d = Seq(
      (1L, "a b a b c"),
      (2L, "a b c d"),
      (3L, "x"), // single token: no bigrams, must drop out
      (4L, "d d d a b"))
      .toDF("id", "text")
    val disc = 0.75
    // brute-force reference: build all counts with plain Scala maps
    val docs = Map(1L -> "a b a b c", 2L -> "a b c d", 4L -> "d d d a b")
    val occs = docs.view.mapValues(
      _.split("\\s+").toSeq.sliding(2).map(p => (p(0), p(1))).toSeq).toMap
    val all = occs.values.flatten.toSeq
    val c12 = all.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = all.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1f = c12.keys.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n1p = c12.keys.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val bt = c12.size.toDouble
    def pkn(bg: (String, String)): Double =
      (c12(bg) - disc) / c1(bg._1) +
        disc * n1f(bg._1) / c1(bg._1) * (n1p(bg._2) / bt)
    val want = occs.view.mapValues { bgs =>
      bgs.map(bg => -math.log(pkn(bg)) / math.log(2.0)).sum / bgs.size
    }.toMap
    val got = Curation.knBigramNll(d, "id", "text", disc)
      .select("id", "n_bigrams", "nll_bits")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, h) => id -> (n, h) }.toMap
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no bigrams
    for ((id, bgs) <- occs) {
      assert(got(id)._1 == bgs.size.toLong)
      assert(math.abs(got(id)._2 - want(id)) < 1e-3,
        s"doc $id: got ${got(id)._2}, want ${want(id)}")
    }
    // the discounted probabilities over each context must still sum < 1
    // (the rest is the backoff mass) — sanity that the formula is a
    // proper distribution over SEEN continuations
    for (w1 <- c1.keys) {
      val mass = c12.keys.filter(_._1 == w1).map(pkn).sum
      assert(mass <= 1.0 + 1e-9, s"context $w1 mass $mass > 1")
    }
  }

  test("alphaWordRatio and symbolToWordRatio") {
    val d = Seq((1L, "abc 123 d4f ###"), (2L, "")).toDF("id", "text")
    val got = d.select(col("id"),
        round(TF.alphaWordRatio(col("text")), 4).as("a"),
        round(TF.symbolToWordRatio(col("text")), 4).as("s"))
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0.5, 0.75)))  // 2 of 4 words alphabetic; 3 '#' / 4
    assert(got(2L) == ((0.0, 0.0)))
  }

  test("crossDocRepetitionRatio flags text shared ACROSS docs only") {
    val boiler = "terms and conditions apply to this offer"  // 7 words
    val d = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta"), // unique
      (2L, s"$boiler intro one two three"),
      (3L, s"$boiler other tail words here"),
      // within-doc repetition but nothing shared with other docs:
      (4L, "loop loop loop loop loop loop loop loop loop loop"))
      .toDF("doc_id", "text")
    val got = Curation.crossDocRepetitionRatio(d, "doc_id", "text", 3)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._2 == 0.0)
    // docs 2 and 3 share the boilerplate's five 3-grams out of their
    // 11-word, nine-3-gram texts
    assert(got(2L) == ((9L, 0.5556)) && got(3L) == ((9L, 0.5556)))
    // doc 4's "loop loop loop" grams repeat within the doc but exist in
    // no other doc: cross-doc ratio 0
    assert(got(4L)._2 == 0.0)
  }

  test("weightedSample is deterministic and favours heavy rows") {
    val rows = (0L until 1000L)
      .map(i => (i, if (i < 50) 1000.0 else 1.0)).toDF("id", "w")
    val s1 = Curation.weightedSample(rows, "id", "w", "s1", 100)
      .select("id").as[Long].collect().toSet
    val s2 = Curation.weightedSample(rows, "id", "w", "s1", 100)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 100)
    // nearly every weight-1000 row beats the weight-1 field
    assert((0L until 50L).count(s1) >= 45)
    // a different salt redraws the light tail
    val s3 = Curation.weightedSample(rows, "id", "w", "s2", 100)
      .select("id").as[Long].collect().toSet
    assert(s3 != s1)
  }

  test("profile reports nulls, distincts, min/max per column in one scan") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a")))
      .toDF("k", "v")
    val got = graft.operators.Profiling.profile(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("k") == ((4L, 1L, 2L, "1", "2")))
    assert(got("v") == ((4L, 1L, 2L, "a", "c")))
  }

  test("keySkewReport surfaces the hot key and count quantiles") {
    val rows = ((0 until 900).map(i => s"k${i % 90}") ++  // 90 keys × 10
      Seq.fill(200)("hot"))                               // one huge key
      .toDF("k")
    val got = graft.operators.Profiling.keySkewReport(rows, "k", 3)
      .select("key", "key_rows", "p50", "max_rows", "n_keys")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.head == (("hot", 200L, 10L, 200L, 91L)))
    assert(got.length == 3 && got(1)._2 == 10L)
  }

  test("poissonBootstrap: weights are Poisson(1)-shaped, means bracket truth") {
    val df = (0L until 2000L).map(i => (i, (i % 100).toDouble))
      .toDF("id", "x")
    val reps = graft.operators.Profiling
      .poissonBootstrap(df, "id", "x", replicates = 24, salt = "t")
      .as[(Int, Double, Long)].collect()
    assert(reps.length == 24)
    // total draws per replicate ≈ n (Poisson(1) weights sum to ~n ± 3√n)
    assert(reps.forall(r => math.abs(r._3 - 2000L) < 3 * 45))
    // every replicate mean near the true mean 49.5; resample spread is
    // σ/√n ≈ 0.65, so ±4σ is a generous deterministic bound
    assert(reps.forall(r => math.abs(r._2 - 49.5) < 2.6))
    // and the means genuinely vary across replicates (it IS resampling)
    assert(reps.map(_._2).distinct.length > 12)
    // deterministic: identical on re-run
    val again = graft.operators.Profiling
      .poissonBootstrap(df, "id", "x", replicates = 24, salt = "t")
      .as[(Int, Double, Long)].collect()
    assert(reps.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("permutationTest: planted shift → tiny p; same distribution → big p") {
    val shifted = (0L until 400L).map(i =>
      (i, if (i < 200) "a" else "b",
        (i % 50).toDouble + (if (i < 200) 0.0 else 40.0)))
      .toDF("id", "g", "x")
    val pShift = graft.operators.Profiling
      .permutationTest(shifted, "id", "x", "g", "a", "b", 39, "s")
      .as[(Double, Double, Long)].head()
    assert(pShift._1 > 35.0) // observed diff ≈ 40
    assert(pShift._2 == 1.0 / 40.0) // no relabeling reaches the real shift
    val same = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", (i % 50).toDouble))
      .toDF("id", "g", "x")
    val pSame = graft.operators.Profiling
      .permutationTest(same, "id", "x", "g", "a", "b", 39, "s")
      .as[(Double, Double, Long)].head()
    assert(pSame._2 > 0.2, s"alternating labels should look null: $pSame")
    // deterministic
    val again = graft.operators.Profiling
      .permutationTest(shifted, "id", "x", "g", "a", "b", 39, "s")
      .as[(Double, Double, Long)].head()
    assert(again == pShift)
  }

  test("approx_count_distinct lands within 5% of exact on this shape") {
    val df = (0 until 20000).map(i => (i % 7, i % 3000)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(approx_count_distinct("v").as("a"),
        count_distinct(col("v")).as("e"))
      .as[(Int, Long, Long)].collect()
    got.foreach { case (_, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("importanceResample prefers corpus docs that look like the target") {
    val target = (0L until 20L)
      .map(i => (i, "medical patient diagnosis treatment hospital"))
      .toDF("doc_id", "text")
    val corpus = ((100L until 110L)
      .map(i => (i, "patient treatment at the hospital ward")) ++
      (200L until 210L)
        .map(i => (i, "football match score goal referee stadium")))
      .toDF("doc_id", "text")
    val kept = Curation.importanceResample(corpus, target,
        "doc_id", "text", keepFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // exactly the medical-ish half survives
    assert(kept == (100L until 110L).toSet)
  }

  test("leakageSafeSplit keeps near-duplicates on the same split side") {
    // 60 clusters of 3 near-identical docs + 80 singletons. Digit-dense
    // bodies: every 12-char shingle of a doc contains its cluster digits,
    // so cross-cluster Jaccard ~ 0 while the one-char-suffix variants
    // inside a cluster stay near 1.
    def body(c: Int) =
      s"tok${c}a tok${c}b tok${c}c tok${c}d tok${c}e tok${c}f tok${c}g"
    val rows = (0 until 60).flatMap { c =>
      Seq((c * 10L, body(c)), (c * 10L + 1, body(c) + "!"),
        (c * 10L + 2, body(c) + "!!"))
    } ++ (0 until 80).map { i =>
      val u = 9000 + i
      (u.toLong, s"unq${u}a unq${u}b unq${u}c unq${u}d unq${u}e")
    }
    val docs = rows.toDF("doc_id", "text")
    val split = Curation.leakageSafeSplit(docs, "doc_id", "text",
      n = 12, threshold = 0.5, salt = "t1",
      fractions = Seq("test" -> 0.2, "val" -> 0.2))
    val byId = split.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId.size == 60 * 3 + 80)
    // every member of a cluster shares the cluster label AND the split
    (0 until 60).foreach { c =>
      val trio = Seq(c * 10L, c * 10L + 1, c * 10L + 2).map(byId)
      assert(trio.toSet.size == 1, s"cluster $c split across sides: $trio")
    }
    // all three splits actually populated (hash spread over 140 clusters)
    assert(byId.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("stratifiedSample: largest-remainder allocation sums to k exactly") {
    // strata sizes 3/3/4, k=5: quotas 1.5/1.5/2 -> base 1/1/2, remainders
    // 5/5/0 (×10 scale) — the single leftover seat goes to the remainder
    // tie broken by stratum name, so sA gets it: allocations 2/1/2
    val df = (Seq.fill(3)("sA") ++ Seq.fill(3)("sB") ++ Seq.fill(4)("sC"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toDF("stratum", "id")
    val got = Curation.stratifiedSample(df, "stratum", "id", 5, "t1")
    val alloc = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(alloc == Map("sA" -> 2L, "sB" -> 1L, "sC" -> 2L))
    assert(got.count() == 5)
    // content-addressed: identical draw regardless of partitioning
    val re = Curation.stratifiedSample(df.repartition(7), "stratum", "id",
      5, "t1")
    assert(re.collect().toSeq == got.collect().toSeq)
    // allocation never exceeds population even for tiny strata
    val skew = (Seq.fill(99)("big") ++ Seq("tiny")).zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toDF("stratum", "id")
    val a2 = Curation.stratifiedSample(skew, "stratum", "id", 10, "t1")
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a2.values.sum == 10 && a2.getOrElse("tiny", 0L) <= 1)
  }
}
