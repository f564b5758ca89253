package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.{Boilerplate, Decontaminate, LanguageModel, Mixture, Sampling, SequencePack, TextAnalysis}

/** Invariant tests for the corpus-curation operators (decontamination,
  * repetition signals, sequence packing, deterministic sampling); the
  * value-level ground truth is the DuckDB oracle gate.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c d e f g h i j"),        // 10 distinct tokens
    (1L, "a b c d e f g h i j"),        // exact dup of 0
    (2L, "x x x x x x x x"),            // maximal repetition
    (3L, "p q r s t u v w a b c d e f g h k l m n")) // shares 8-gram a..h
    .toDF("doc_id", "text")

  test("decontaminate: exact dup and embedded 8-gram flagged; others clean") {
    val out = Decontaminate.contaminatedDocs(
      docs.filter(col("doc_id") =!= 0), docs.filter(col("doc_id") === 0), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L), "exact duplicate must be contaminated")
    assert(out.contains(3L), "doc embedding a benchmark 8-gram must be flagged")
    assert(!out.contains(2L), "unrelated doc must not be flagged")
    // doc 1 shares all 3 distinct 8-shingles of doc 0
    assert(out(1L) == 3L && out(3L) == 1L)
  }

  test("hard negatives: in-band only, near-dups excluded, per-query top-k") {
    import graft.analytics.Similarity
    // query 0 has: an exact duplicate (sim 1.0, must be excluded), two
    // in-band semi-hard candidates, and an orthogonal vector (below lo)
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),   // near-dup: sim 1.0 >= hi
      2L -> Seq(1.0f, 1.0f, 0.0f, 0.0f),   // sim ~0.707 — above hi=0.6
      3L -> Seq(1.0f, 2.0f, 0.0f, 0.0f),   // sim ~0.447 in band
      4L -> Seq(1.0f, 3.0f, 0.0f, 0.0f),   // sim ~0.316 in band
      5L -> Seq(0.0f, 0.0f, 1.0f, 0.0f))   // sim 0.0 below lo=0.1
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(
      vecs.filter(col("vec_id") === 0), vecs, k = 5, lo = 0.1, hi = 0.6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._3).toSet == Set(3L, 4L),
      s"expected only the in-band vectors, got ${out.toSeq}")
    assert(out.forall(r => r._4 >= 0.1 && r._4 < 0.6))
    // ranked by similarity descending, ranks contiguous from 1
    assert(out.sortBy(_._2).map(_._3).toSeq == Seq(3L, 4L))
    // k caps the per-query set
    val capped = Similarity.hardNegatives(
      vecs.filter(col("vec_id") === 0), vecs, k = 1, lo = 0.1, hi = 0.6)
      .collect()
    assert(capped.length == 1 && capped.head.getLong(2) == 3L)
  }

  test("repetition signals: distinct text scores 0, repeated text scores high") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.dupTokenFrac(col("text")).as("dup"),
      TextAnalysis.topTokenFrac(col("text")).as("top"),
      TextAnalysis.dup2gramFrac(col("text")).as("g2"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(0L) == ((0.0, 0.1, 0.0)))
    assert(r(2L)._1 == 0.875 && r(2L)._2 == 1.0 && r(2L)._3 > 0.8)
  }

  test("passage dedup: cross-doc windows drop, unique docs survive intact") {
    // width 4: docs 0 and 1 share their first window; doc 2 is unique
    val d = Seq(
      (0L, "a b c d e f g h"),     // windows: [a b c d], [e f g h]
      (1L, "a b c d x y z w"),     // shares window [a b c d]
      (2L, "p q r s t u v w")      // fully unique
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(d, width = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == (("e f g h", 2L, 1L)))
    assert(out(1L) == (("x y z w", 2L, 1L)))
    assert(out(2L) == (("p q r s t u v w", 2L, 0L)))
    // a fully-boilerplate doc stays present with empty text
    val all = Seq((0L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val kept = Boilerplate.removeBoilerplate(all, width = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(0L -> "", 1L -> ""))
  }

  test("LM score: corpus-typical transitions outrank novel ones") {
    // "a b" appears 3x, so docs made of common bigrams score higher
    // than a doc of one-off transitions; identical docs score equal
    val d = Seq(
      (0L, "a b a b a b"),
      (1L, "a b a b a b"),
      (2L, "q r s t u v"))
      .toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == out(1L), "identical docs must score identically")
    assert(out(0L)._1 == 5 && out(2L)._1 == 5, "n-1 bigrams per doc")
    assert(out(0L)._3 > out(2L)._3,
      "common-transition doc must outscore the novel-transition doc")
  }

  test("sequence packing: offsets stay under budget, packs fill in doc order") {
    val many = spark.range(100).select(col("id").as("doc_id"),
      lit("w " * 99 + "w").as("text")) // 100 tokens each
    val packed = SequencePack.pack(many,
      TextAnalysis.tokenCount(col("text")), budget = 256, shards = 4)
    val rows = packed.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => r.getAs[Long]("pack_offset") >= 0 &&
      r.getAs[Long]("pack_offset") < 256))
    // within a shard, pack ids are non-decreasing in doc order
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("pack_id"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
    // 25 docs/shard × 100 tokens / 256 budget → packs 0..9 per shard
    assert(rows.map(_.getAs[Long]("pack_id")).max == 9)
  }

  test("mixture repeat factors hit target token proportions in expectation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val weights = docs.select(col("source")).distinct().collect()
      .map(_.getString(0)).map(s => s ->
        (if (s.stripPrefix("src").toInt % 2 == 0) 4L else 1L)).toMap
    val out = Mixture.repeatFactors(docs, weights, budgetFactor = 3).cache()
    // deterministic: a rerun assigns identical factors
    val again = Mixture.repeatFactors(docs, weights, budgetFactor = 3)
    assert(out.collect().toSet == again.collect().toSet)
    // realized per-source token share tracks the target share
    val realized = out.groupBy(col("source"))
      .agg(sum(col("n_tokens") * col("n_repeats")).as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = realized.values.sum.toDouble
    val wsum = weights.values.sum.toDouble
    weights.foreach { case (s, w) =>
      val target = w / wsum
      val got = realized.getOrElse(s, 0L) / total
      assert(math.abs(got - target) < 0.02,
        s"source $s realized share $got vs target $target")
    }
    out.unpersist(); ()
  }

  test("temperature mixture flattens shares toward sqrt; budget holds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Mixture.temperatureFactors(docs, budgetFactor = 2).cache()
    val natural = docs
      .select(col("lang"),
        graft.analytics.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = natural.values.sum.toDouble
    val realized = out.groupBy(col("lang"))
      .agg(sum(col("n_tokens") * col("n_repeats")).as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rTotal = realized.values.sum.toDouble
    // q_l ∝ sqrt(p_l): every realized share must land close to the
    // sqrt-normalized target, i.e. ABOVE natural for low-resource
    // languages and BELOW for the head
    val sSum = natural.values.map(t => math.sqrt(t.toDouble)).sum
    natural.foreach { case (l, t) =>
      val target = math.sqrt(t.toDouble) / sSum
      val got = realized.getOrElse(l, 0L) / rTotal
      assert(math.abs(got - target) < 0.02,
        s"lang $l realized share $got vs sqrt target $target")
    }
    // total assembled tokens track the 2x budget
    assert(math.abs(rTotal / total - 2.0) < 0.05, s"budget: ${rTotal / total}")
    // deterministic rerun
    assert(out.collect().toSet ==
      Mixture.temperatureFactors(docs, budgetFactor = 2).collect().toSet)
    out.unpersist(); ()
  }

  test("keepBest: one representative per cluster, max quality wins") {
    import graft.analytics.{Dedup, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs,
      TextAnalysis.prefixFingerprint(col("text"), 8), 0.9)
    val clusters = Dedup.dedupClusters(docs, pairs)
      .select(col("doc_id"), col("cluster_id"))
    val q = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val kept = Dedup.keepBest(clusters.join(q, "doc_id")).cache()
    // exactly one representative per cluster; every doc appears once
    val perCluster = kept.groupBy(col("cluster_id"))
      .agg(sum(col("kept")).as("n")).collect()
    assert(perCluster.forall(_.getLong(1) == 1L))
    assert(kept.count() == docs.count())
    // the representative's quality is the cluster max
    val bad = kept.filter(col("kept") === 1).as("r")
      .join(kept.as("o"), col("r.cluster_id") === col("o.cluster_id"))
      .filter(col("o.quality") > col("r.quality")).count()
    assert(bad == 0, "a kept doc was outranked in its own cluster")
    kept.unpersist(); ()
  }

  test("packMixture equals the two-step repeatFactors → explode → pack composition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val weights = docs.select(col("source")).distinct().collect()
      .map(_.getString(0)).map(s => s ->
        (if (s.stripPrefix("src").toInt % 2 == 0) 4L else 1L)).toMap
    val fused = Mixture.packMixture(docs, weights,
      budgetFactor = 3, budget = 1024, shards = 4)
    // independent two-step: materialize the factor table, explode the
    // copies, then run the pack window over (doc_id, copy)
    val copies = Mixture.repeatFactors(docs, weights, budgetFactor = 3)
      .filter(col("n_repeats") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_repeats"))).as("copy"))
    copies.createOrReplaceTempView("mix_copies")
    val twoStep = spark.sql(
      """SELECT doc_id, source, copy, doc_id % 4 AS shard, n_tokens,
        | CAST(floor((cum - n_tokens)/1024) AS BIGINT) AS pack_id,
        | (cum - n_tokens) % 1024 AS pack_offset
        |FROM (SELECT *, SUM(n_tokens) OVER (PARTITION BY doc_id % 4
        |  ORDER BY doc_id, copy ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM mix_copies)""".stripMargin)
    val a = fused.collect().map(_.toSeq).toSet
    val b = twoStep.collect().map(_.toSeq).toSet
    assert(a == b, s"fused ${a.size} rows != two-step ${b.size} rows")
    // every copy of every surviving document is placed exactly once
    val expected = Mixture.repeatFactors(docs, weights, budgetFactor = 3)
      .agg(sum(col("n_repeats"))).head().getLong(0)
    assert(a.size.toLong == expected)
  }

  test("incremental packing equals batch packing; replayed epochs are idempotent") {
    val many = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", array_repeat(lit("w"), (col("id") % 37 + 3).cast("int")))
        .as("text"))
    val tc = size(split(col("text"), " "))
    val batch = SequencePack.pack(many, tc, budget = 64, shards = 4)
      .collect().map(_.toSeq).toSet
    // feed in three doc-ordered waves, threading bases
    var bases = Map.empty[Long, Long]
    val waves = Seq(0L -> 40L, 40L -> 70L, 70L -> 100L)
    val incremental = waves.flatMap { case (lo, hi) =>
      val (assigned, advanced) = SequencePack.packIncrement(
        many.filter(col("doc_id") >= lo && col("doc_id") < hi), tc,
        budget = 64, shards = 4, bases)
      val rows = assigned.collect().map(_.toSeq)
      bases = advanced
      rows
    }.toSet
    assert(incremental == batch,
      "incremental assignment diverged from batch packing")
    // replaying an epoch against its predecessor's bases reproduces it
    val (replay, _) = SequencePack.packIncrement(
      many.filter(col("doc_id") >= 40L && col("doc_id") < 70L), tc,
      budget = 64, shards = 4,
      waves.take(1).foldLeft(Map.empty[Long, Long]) { case (b, (lo, hi)) =>
        SequencePack.packIncrement(
          many.filter(col("doc_id") >= lo && col("doc_id") < hi), tc,
          budget = 64, shards = 4, b)._2
      })
    assert(replay.collect().map(_.toSeq).toSet ==
      incremental.filter(r => {
        val id = r.head.asInstanceOf[Long]; id >= 40L && id < 70L
      }))
  }

  test("incremental dedup: bloom prefilter has no false negatives; verify is exact") {
    import graft.analytics.Dedup
    val history = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    val fresh = Seq((10L, "alpha beta"), (11L, "epsilon zeta"),
      (12L, "gamma delta"), (13L, "eta theta")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(fresh, history, col("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(10L -> 1, 11L -> 0, 12L -> 1, 13L -> 0))
  }

  test("tf-idf: rare distinctive terms outrank common ones, rank deterministic") {
    import graft.analytics.TfIdf
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "the bird flew over the house")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // 'the' appears in every doc (df=3, tf=2) — the doc-specific nouns
    // (df=1) must outrank it: idf_q6(df=1)=2e6 so score 2e6 > the's 2e6
    // tie is broken... tf('the')=2 × idf(3+1/3+1=1e6)=2e6 ties the nouns'
    // 1×2e6 — term-asc tiebreak then ranks alphabetically first
    assert(top((1L, 1)) == "cat" || top((1L, 1)) == "mat" ||
      top((1L, 1)) == "on" || top((1L, 1)) == "sat" || top((1L, 1)) == "the")
    // determinism: two runs produce identical rankings
    val again = TfIdf.topTerms(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(top == again)
    // every doc gets exactly k rows when it has >= k distinct terms
    assert(top.keys.count(_._1 == 1L) == 2)
  }

  test("cluster profile: sizes sum to corpus, majority label counted right") {
    import graft.analytics.Ivf
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 7),
      (2L, Array(0.9f, 0.1f), 7),
      (3L, Array(0.8f, 0.0f), 8),
      (4L, Array(0.0f, 1.0f), 9),
      (5L, Array(0.1f, 0.9f), 9)).toDF("vec_id", "embedding", "label")
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val prof = Ivf.clusterProfile(vecs, cents).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))).toMap
    assert(prof(0) == ((3L, 2L, 7, 2L)), s"cluster 0 wrong: $prof")
    assert(prof(1) == ((2L, 1L, 9, 2L)), s"cluster 1 wrong: $prof")
    assert(prof.values.map(_._1).sum == 5L, "cluster sizes must sum to corpus")
  }

  test("ccnet buckets: tiles partition each language, head has top scores") {
    import graft.analytics.LanguageModel
    val docs = Seq(
      (1L, "a b a b a b", "en"), (2L, "a b a b c", "en"),
      (3L, "c c q z q", "en"), (4L, "a b a", "en"),
      (5L, "z q w x y", "en"), (6L, "a b c a b", "en")).toDF(
      "doc_id", "text", "lang")
    val b = LanguageModel.ccnetBuckets(docs, 3).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(4), r.getLong(5))))
      .toMap
    assert(b.keySet == Set("head", "middle", "tail"))
    assert(b.values.map(_._1).sum == 6L, "tiles must partition the corpus")
    // tiles are score-ordered: head's min >= middle's max >= ...
    assert(b("head")._2 >= b("middle")._3 && b("middle")._2 >= b("tail")._3)
  }

  test("BPE merges: frequency-greedy, lexicographic ties, deterministic") {
    import graft.analytics.Vocabulary
    val docs = Seq((1L, "low lower lowest"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    // pair counts over {low:2, lower:1, lowest:2}: (l,o)=5 ties (o,w)=5,
    // 'l' < 'o' wins; then (lo,w)=5; then (low,e)=3
    val m = Vocabulary.bpeMerges(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq((1, "lo", 5L), (2, "low", 5L), (3, "lowe", 3L)),
      s"unexpected merge table: ${m.toSeq}")
    // determinism across runs
    val m2 = Vocabulary.bpeMerges(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m.toSeq == m2.toSeq)
  }

  test("sampling: deterministic, rate-monotone, splits partition the corpus") {
    val ids = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val r40 = Sampling.stratifiedSample(ids, col("lang"), col("doc_id"),
      Map("en" -> 40)).collect().map(_.getLong(0)).toSet
    val r80 = Sampling.stratifiedSample(ids, col("lang"), col("doc_id"),
      Map("en" -> 80)).collect().map(_.getLong(0)).toSet
    assert(r40.subsetOf(r80), "lower rate must be a subset of higher rate")
    assert(r80.forall(_ % 2 == 0), "unlisted stratum must be dropped")
    // rate ~ requested percentage of the en stratum (500 docs)
    assert(math.abs(r40.size - 200) < 60 && math.abs(r80.size - 400) < 60)

    val splits = ids.select(Sampling.splitColumn(col("doc_id"),
      Seq("valid" -> 5, "test" -> 10, "train" -> 100)).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 1000, "splits must partition the corpus")
    assert(splits.keySet == Set("valid", "test", "train"))
    assert(splits("train") > splits("test") && splits("test") >= splits("valid"))
  }

  test("budgetSelect: greedy by density, budget honored, boundary exact") {
    // densities descend with doc_id (quality fixed, tokens grow), so the
    // greedy keep-set is a doc_id prefix and the budget line is exact
    val d = spark.range(1, 21).select(col("id").as("doc_id"),
      lit("s").as("source"), lit(1.0).as("q"),
      (col("id") * 10).cast("long").as("nt")) // tokens 10,20,…,200
    def selectedIds(budget: Long): Seq[Long] =
      Sampling.budgetSelect(d, col("q"), col("nt"), budget)
        .collect().map(_.getLong(0)).sorted.toSeq
    // 10+20+30+40 = 100 fits exactly; doc 5 (50 tokens) must not enter
    assert(selectedIds(100) == Seq(1L, 2L, 3L, 4L))
    // 120: docs 1..4 fill 100, slack 20 admits nothing (next is 50) —
    // the boundary bucket takes docs only while the cumulative fits
    assert(selectedIds(120) == Seq(1L, 2L, 3L, 4L))
    // full corpus fits: everything selected
    assert(selectedIds(100000) == (1L to 20L))
    // budget is a hard ceiling at every level
    Seq(35L, 100L, 777L, 2100L).foreach { b =>
      val total = Sampling.budgetSelect(d, col("q"), col("nt"), b)
        .agg(sum("n_tokens")).collect()(0).getLong(0)
      assert(total <= b, s"budget $b exceeded: $total")
    }
    // equal-density ties (one bucket): lowest doc_ids win the slack
    val tie = spark.range(1, 11).select(col("id").as("doc_id"),
      lit("s").as("source"), lit(1.0).as("q"), lit(10L).as("nt"))
    assert(Sampling.budgetSelect(tie, col("q"), col("nt"), 35)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("leakFreeSplit: a cluster never straddles splits") {
    val clustered = spark.range(300).select(col("id").as("doc_id"),
      (col("id") % 60).as("cluster_id")) // 60 clusters of 5
    val out = Sampling.leakFreeSplit(clustered, col("cluster_id"),
      Seq("valid" -> 10, "test" -> 20, "train" -> 100))
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(perCluster.forall(_ == 1L), "every cluster maps to ONE split")
    val splits = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("valid", "test", "train"))
    assert(out.count() == 300)
  }

  test("sourceCaps keeps exactly the top-N per source, best quality first") {
    val d = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 4).cast("string")).as("source"),
      // quality descends with doc_id so the expected keep-set is exact
      (lit(100) - col("id")).cast("double").as("q"))
    val got = Sampling.sourceCaps(d, col("q"), cap = 5).collect()
    assert(got.length == 20, "4 sources x cap 5")
    got.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 5))
      // within a source the kept docs are the 5 lowest doc_ids (highest q)
      val kept = rs.map(_.getLong(0)).sorted
      val all = (0L until 100L).filter(i => s"s${i % 4}" == rs.head.getString(1))
      assert(kept.sameElements(all.sorted.take(5)))
    }
  }

  test("chunking: window/stride starts, sizes and overlap fingerprints") {
    val d = Seq((7L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (8L, "solo")).toDF("doc_id", "text")
    val got = graft.analytics.Chunking.chunk(d, window = 8, stride = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    // 20 tokens, stride 6 → starts 0,6,12,18; sizes 8,8,8,2
    val doc7 = got.filter(_._1 == 7L)
    assert(doc7.map(_._3).sameElements(Seq(0L, 6L, 12L, 18L)))
    assert(doc7.map(_._2).sameElements(Seq(0L, 1L, 2L, 3L)))
    assert(doc7.map(_._4).sameElements(Seq(8L, 8L, 8L, 2L)))
    // overlap: chunk 1 starts at token 7 ("t7") — windows genuinely overlap
    assert(doc7.map(_._5).distinct.length == 4, "chunks must differ")
    // a 1-token doc still yields exactly one chunk
    val doc8 = got.filter(_._1 == 8L)
    assert(doc8.length == 1 && doc8.head._4 == 1L)
  }

  test("BpeEncode: trainer-identical replace semantics, incl. overlap skip") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    def enc(text: String): Seq[String] = {
      val d = Seq((0L, text)).toDF("doc_id", "text")
      graft.analytics.Vocabulary.bpeTokenize(d, merges)
        .collect()(0).getSeq[String](1)
    }
    assert(enc("abc") == Seq("abc"))           // cascading merges
    assert(enc("cab dab") == Seq("c", "ab", "d", "ab"))
    // the replace contract: " a b a b " fuses only the FIRST pair per
    // pass (the second match's leading sentinel was consumed), exactly
    // what chained SQL replace does
    assert(enc("abab") == Seq("ab", "a", "b"))
    // ...and a doubled boundary space blocks nothing across words
    assert(enc("ab ab") == Seq("ab", "ab"))
    // reference check vs literal java replace on the sentineled string
    def viaReplace(word: String): Seq[String] = {
      var s = " " + word.toCharArray.mkString(" ") + " "
      merges.foreach { case (x, y) =>
        s = s.replace(s" $x $y ", s" $x$y ")
      }
      s.split(" ").filter(_.nonEmpty).toSeq
    }
    for (w <- Seq("abab", "aabbcc", "abcabc", "babab", "cabab"))
      assert(enc(w) == viaReplace(w), s"word $w diverged from replace")
  }

  test("quality classifier: GD separates classes, trajectory deterministic") {
    import graft.analytics.QualityClassifier
    val d = ((0 until 30).map(i => (i.toLong, "en",
      "good well written prose here")) ++
      (30 until 60).map(i => (i.toLong, "xx",
        "zz yy xx ww vv uu"))).toDF("doc_id", "lang", "text")
    val m = QualityClassifier.train(d, col("lang") === "en",
      buckets = 16, iters = 3, lr = 0.5)
    assert(m.docs == 60)
    val scored = QualityClassifier.score(d, m, buckets = 16)
      .select(col("lang"), col("quality_margin")).collect()
    val en = scored.filter(_.getString(0) == "en").map(_.getDouble(1))
    val xx = scored.filter(_.getString(0) == "xx").map(_.getDouble(1))
    assert(en.min > xx.max,
      s"classes must separate: en min ${en.min} vs xx max ${xx.max}")
    // exact-integer gradients → the weight trajectory is reproducible
    val again = QualityClassifier.train(d, col("lang") === "en",
      buckets = 16, iters = 3, lr = 0.5)
    assert(m.weights.toSeq == again.weights.toSeq && m.bias == again.bias)
  }

  test("DSIR: target-like docs score positive, off-domain negative") {
    // target (en) docs use one vocabulary, raw-only (xx) docs another;
    // a fresh en-vocab doc must score positive, an xx-vocab doc negative
    val base = (0 until 20).map(i => (i.toLong, "en",
      "alpha beta gamma delta epsilon zeta")) ++
      (20 until 40).map(i => (i.toLong, "xx",
        "uno dos tres cuatro cinco seis"))
    val probe = Seq((100L, "qq", "alpha beta gamma delta"),
      (101L, "qq", "uno dos tres cuatro"))
    val df = (base ++ probe).toDF("doc_id", "lang", "text")
    val got = graft.analytics.Dsir.importanceScores(df, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(100L)._1 > 0 && got(100L)._2, "target-vocab doc must be selected")
    assert(got(101L)._1 < 0 && !got(101L)._2, "off-domain doc must score negative")
    // scores are exact integer sums: rerun bit-identical
    val again = graft.analytics.Dsir.importanceScores(df, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.view.mapValues(_._1).toMap == again)
  }

  test("Misra-Gries: exact within capacity, bounded error beyond it") {
    import graft.expressions.GraftFunctions
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    // skewed stream: 'hot' 60×, 'warm' 25×, 10 tail terms 3× each
    val terms = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 10).flatMap(i => Seq.fill(3)(s"tail$i")))
    val n = terms.length
    val df = spark.createDataset(scala.util.Random.shuffle(terms))(
      org.apache.spark.sql.Encoders.STRING).toDF("term").repartition(8)

    // capacity 64 > 12 distinct => exact
    val exact = df.agg(GraftFunctions.misraGries(col("term"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count")).as[(String, Long)]
      .collect().toMap
    assert(exact("hot") == 60 && exact("warm") == 25 &&
      exact("tail0") == 3 && exact.size == 12)

    // capacity 4: counters are underestimates within N/(capacity+1),
    // and every term above that threshold is present
    val cap = 4
    val sketched = df.coalesce(1) // deterministic single-stream MG bound
      .agg(GraftFunctions.misraGries(col("term"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count")).as[(String, Long)]
      .collect().toMap
    assert(sketched.size <= cap)
    val err = n / (cap + 1)
    sketched.foreach { case (t, c) =>
      val truth = exact(t)
      assert(c <= truth && c >= truth - err, s"$t: sketch $c vs true $truth")
    }
    assert(sketched.contains("hot") && sketched.contains("warm"))

    // mergeability: 8-partition partials merge within the same bound
    val merged = df.agg(GraftFunctions.misraGries(col("term"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count")).as[(String, Long)]
      .collect().toMap
    assert(merged.contains("hot"))
    assert(merged("hot") <= 60 && merged("hot") >= 60 - err)
  }
}
