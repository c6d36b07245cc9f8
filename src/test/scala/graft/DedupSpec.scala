package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Scale-shape and approximation-quality audits for the embedding
  * near-dup path (the one dedup op where candidate generation could
  * silently regress to an all-pairs nested loop).
  */
class DedupSpec extends AnyFunSuite {
  import TestSession._

  test("d05 candidate generation is an equi-join, never a nested loop") {
    val plan = Dedup.d05EmbeddingDup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "d05 plan fell back to a nested-loop join")
    assert(!plan.contains("CartesianProduct"),
      "d05 plan contains a cartesian product")
  }

  test("d05 LSH gate recalls most of the exact top-50 (measured, documented)") {
    // Exact brute-force top-50 (test-only; the operator itself never
    // does this) vs the gated result. Measured recall at sf0.001 is
    // 0.74 with T=10 tables × B=5 bits on this near-random corpus
    // (top-50 sims only 0.41–0.51); the floor below is deliberately
    // loose so the spec pins "gate works" without pinning the corpus.
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exact = a.join(b, col("va") < col("vb"))
      .withColumn("sim", graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")))
      .orderBy(col("sim").desc, col("va"), col("vb")).limit(50)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gated = Dedup.d05EmbeddingDup(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & gated).size / 50.0
    assert(recall >= 0.6, s"d05 recall@50 dropped to $recall")
  }

  test("d02 collects doc lists through the BOUNDED aggregate only") {
    // The doc lists must come from collect_capped (buffer physically
    // stops at cap elements), never a plain collect_list whose buffer
    // would hold a hyper-frequent gram's full doc list before any
    // filter could drop it.
    val plan = Dedup.d02NgramJaccard(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("collect_capped"),
      "d02 must aggregate doc lists via collect_capped")
    assert(!plan.contains("collect_list"),
      "unbounded collect_list reappeared in d02's plan")
  }

  test("collect_capped == collect_list for under-cap groups; hard-stops at cap") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val df = spark.range(0, 1000)
      .selectExpr("id % 10 AS k", "id AS v") // 100 values per key
    val capped = df.groupBy(col("k"))
      .agg(GraftFunctions.collectCapped(col("v"), 101).as("docs"))
      .select(col("k"), size(col("docs")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped.values.forall(_ == 100), s"under-cap groups must collect fully: $capped")
    val hardStop = df.groupBy(col("k"))
      .agg(GraftFunctions.collectCapped(col("v"), 7).as("docs"))
      .select(size(col("docs")).as("n"))
      .collect().map(_.getInt(0))
    assert(hardStop.forall(_ == 7), s"buffer must stop exactly at cap: ${hardStop.toSeq}")
    // under-cap content equals collect_list's content (as sets)
    val content = df.filter(col("k") === 3).groupBy(col("k"))
      .agg(GraftFunctions.collectCapped(col("v"), 101).as("docs"))
      .selectExpr("array_sort(docs) AS docs").collect().head.getSeq[Long](0)
    assert(content == (3L until 1000L by 10L).toSeq)
  }

  test("d07 boilerplate accounting is consistent and bounded") {
    val rows = Dedup.d07Boilerplate(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents")
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 5).count())
    rows.foreach { r =>
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_boiler_grams") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Boolean]("kept") == (ratio <= 0.2))
    }
    // exact-duplicate documents share all grams → their shared grams
    // have df >= 2; with >=3 copies they MUST be flagged boilerplate
    val copies = Dedup.d01DedupExact(spark, sf).filter(col("n_copies") >= 3).count()
    if (copies > 0) assert(rows.exists(_.getAs[Long]("n_boiler_grams") > 0))
  }

  test("s06 multi-probe scans at least the single bucket, at most the corpus") {
    val rows = graft.operators.Similarity.s06AnnMultiprobe(spark, sf).collect()
    val n = Tables(spark, sf, "embeddings").count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_candidates_mp") >= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_candidates_mp") < n)
      val frac = r.getAs[Double]("scan_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // multi-probe must actually widen the net for some vector
    assert(rows.exists(r =>
      r.getAs[Long]("n_candidates_mp") > r.getAs[Long]("n_candidates")))
  }

  test("s07 multi-probe top-5 recalls a solid share of the exact top-5") {
    val exact = graft.operators.Similarity.s01CosineTopk(spark, sf)
      .filter(col("rnk") <= 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val probed = graft.operators.Similarity.s07AnnMultiprobeTopk(spark, sf)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(probed.size == 50) // 10 queries × top-5
    val recall = (exact & probed).size.toDouble / exact.size
    // 9/256 of the corpus scanned per query; on this near-random
    // corpus the measured recall is ~0.2-0.4 — assert the gate beats
    // the ~3.5% random-scan baseline by a wide margin
    assert(recall >= 0.1, s"s07 recall@5 dropped to $recall")
  }

  test("s08 k-means partitions the corpus and cells are coherent") {
    val cells = graft.operators.Similarity.s08AnnKmeans(spark, sf).collect()
    assert(cells.length <= 8 && cells.nonEmpty)
    // every vector lands in exactly one cell
    assert(cells.map(_.getAs[Long]("n_vectors")).sum ==
      Tables(spark, sf, "embeddings").count())
    cells.foreach { r =>
      val s = r.getAs[Double]("avg_sim")
      assert(s >= -1.0 && s <= 1.0)
    }
    // Lloyd iteration produces meaningful clusters: members are on
    // average closer to their centroid than random pairs are to each
    // other (~0.0 on this corpus)
    val weighted = cells.map(r =>
      r.getAs[Double]("avg_sim") * r.getAs[Long]("n_vectors")).sum /
      cells.map(_.getAs[Long]("n_vectors")).sum
    assert(weighted > 0.05, s"mean member-centroid sim $weighted looks unclustered")
  }

  test("d05 top pair is symmetric-ordered and ranked densely") {
    val rows = Dedup.d05EmbeddingDup(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("pair_rank")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
  }

  test("d06 fixpoint runs under reliable checkpointing with identical clusters") {
    def key(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    // cap 0 forces the DISTRIBUTED fixpoint (the default stats gate
    // would solve this small subgraph driver-side, where
    // checkpointing never engages)
    System.setProperty("graft.cc.localEdgeCap", "0")
    try {
      val default = key(Dedup.d06DupClusters(spark, sf).collect())
      System.setProperty("graft.cc.reliableCheckpoint", "true")
      try {
        val reliable = key(Dedup.d06DupClusters(spark, sf).collect())
        assert(reliable == default,
          "reliable-checkpoint run diverged from the localCheckpoint run")
        assert(spark.sparkContext.getCheckpointDir.nonEmpty,
          "reliable run must have installed a checkpoint dir")
      } finally System.clearProperty("graft.cc.reliableCheckpoint")
    } finally System.clearProperty("graft.cc.localEdgeCap")
  }

  test("d13 incremental probe: accounting sound, flagged docs share a d06 cluster with the corpus") {
    val rows = Dedup.d13IncrementalLsh(spark, sf).collect()
    val batchN = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 3).count()
    assert(rows.length == batchN, "one decision row per batch doc")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("n_corpus_dups") == 0L &&
          r.getAs[Long]("n_batch_dups_earlier") == 0L))
      if (!r.isNullAt(r.fieldIndex("best_corpus_match")))
        assert(r.getAs[Long]("best_corpus_match") % 5 != 0,
          "corpus match must come from the corpus side of the split")
    }
    // a verified batch→corpus pair is an edge of d06's full graph, so
    // every corpus-flagged batch doc must share its dup-cluster label
    // with at least one corpus doc
    val labels = Dedup.dupLabels(spark, sf, 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label"))
    val labelOf = labels.toMap
    val corpusLabels = labels.collect { case (d, l) if d % 5 != 0 => l }.toSet
    val flagged = rows.filter(_.getAs[Long]("n_corpus_dups") > 0)
    assert(flagged.nonEmpty, "expected cross-split near-dups in testdata")
    flagged.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(corpusLabels.contains(labelOf(id)),
        s"batch doc $id flagged against the corpus but its cluster has no corpus member")
    }
  }

  test("d14 prefix join equals the brute-force exact Jaccard join (no false negatives)") {
    val got = Dedup.d14PrefixJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // ground truth: all-pairs exact word-Jaccard (test-only; the
    // operator must reproduce it exactly without ever planning it)
    val t = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        array_distinct(split(lower(trim(col("text"))), "\\s+")).as("ts"))
    val naive = t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        size(array_intersect(col("a.ts"), col("b.ts"))).cast("long").as("c"),
        size(col("a.ts")).cast("long").as("na"), size(col("b.ts")).cast("long").as("nb"))
      .filter(col("c") * 20 >= (col("na") + col("nb") - col("c")) * 19)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(got == naive,
      s"prefix join missed ${(naive -- got).size} pairs / invented ${(got -- naive).size}")
    assert(naive.nonEmpty, "expected >= tau pairs in testdata")
  }

  test("d06 driver union-find (stats gate) matches the distributed fixpoint") {
    def key(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    val local = key(Dedup.d06DupClusters(spark, sf).collect()) // default cap → local path
    System.setProperty("graft.cc.localEdgeCap", "0")
    try {
      val distributed = key(Dedup.d06DupClusters(spark, sf).collect())
      assert(local == distributed,
        "driver-side union-find labels diverged from the distributed fixpoint")
    } finally System.clearProperty("graft.cc.localEdgeCap")
  }

  test("d10 semantic dedup: accounting consistent, pair join never a cartesian") {
    val df = Dedup.d10SemanticDedup(spark, sf)
    // k-means probes are bounded K-row broadcasts; the within-cluster
    // PAIR join must plan as an equi-join on cell_id, never a
    // corpus-wide cartesian
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "d10 pair generation planned a cartesian product")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum ==
      Tables(spark, sf, "embeddings").count(),
      "every vector must be assigned to exactly one cluster")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_vectors") - r.getAs[Long]("n_dropped"))
      // each pair names at most one distinct loser
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_dup_pairs"))
    }
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0,
      "expected near-dup pairs at SEM_TAU on this corpus")
  }

  test("s10/s11 PQ: full coverage; ADC self-retrieval ranks every query first") {
    import graft.operators.Similarity
    val cb = Similarity.s10PqCodebook(spark, sf).collect()
    assert(cb.map(_.getAs[Long]("n_vectors")).sum ==
      8 * Tables(spark, sf, "embeddings").count(),
      "every (vector, subspace) must hold exactly one code")
    assert(cb.forall(_.getAs[Double]("avg_sqdist") > 0.0))
    // ADC(q, q) = sum of q's own-code table entries, and q's codes are
    // argmin per subspace — so no vector can beat the query itself.
    // (Corpus-independent, unlike recall on this near-random corpus.)
    val (codebook, asn) = Similarity.pqModel(spark, sf)
    val q = asn.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("sp"), col("sub"))
    val qtab = q.join(broadcast(codebook), Seq("sp"))
      .withColumn("qd2", round(Similarity.pqDist2, 6))
      .select(col("qid"), col("sp"), col("code"), col("qd2"))
    val adc = asn.select(col("vec_id"), col("sp"), col("code"))
      .join(broadcast(qtab), Seq("sp", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .as("adcsum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adcsum"), col("vec_id"))
    val top1 = adc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("vec_id"), col("adcsum")).collect()
    // rank-1 ADC must equal the query's own ADC (self or an exact tie)
    val selfAdc = adc.filter(col("qid") === col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDecimal(2))).toMap
    top1.foreach { r =>
      assert(r.getDecimal(2) == selfAdc(r.getLong(0)),
        s"query ${r.getLong(0)}: rank-1 ADC beats the query's own code word")
    }
  }

  test("p13 fuzzy contamination flags train docs against the eval slice only") {
    val rows = Dedup.p13FuzzyContamination(spark, sf).collect()
    assert(rows.nonEmpty, "expected contamination flags on this corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 13 != 0, "flagged doc must be train-side")
      assert(r.getAs[Long]("best_match") % 13 == 0, "best match must be bench-side")
      assert(r.getAs[Int]("best_agree") >= 14, "below the verify gate")
      assert(r.getAs[Double]("est_jaccard") == r.getAs[Int]("best_agree") / 16.0)
      assert(r.getAs[Long]("n_bench_hits") >= 1)
    }
  }

  test("d18 deletion-blocking finds EXACTLY the brute-force lev<=1 pairs, with no nested-loop join") {
    val got = Dedup.d18FuzzyNameJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("n_lev1"),
        Option(r.getAs[String]("nearest"))))
    // brute force the same semantics in-driver on the bounded name set
    val names = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(
        j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = names.map { case (k, n) =>
      val ms = names.filter(o => o._1 != k && lev(n, o._2) <= 1).map(_._2)
      (k, ms.length.toLong, if (ms.isEmpty) None else Some(ms.min))
    }
    assert(got.toSeq.sortBy(_._1) == want.toSeq.sortBy(_._1))
    assert(got.exists(_._2 > 0), "fixture should contain lev-1 neighbours")
    // the candidate join must be a hash/sort equi-join on block keys
    val plan = Dedup.d18FuzzyNameJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "d18 candidate generation fell back to all-pairs")
  }

  test("d12 cluster apply keeps the longest member of every cluster") {
    val rows = graft.operators.Dedup.d12ClusterApply(spark, sf).collect()
    assert(rows.nonEmpty)
    val lens = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") == r.getAs[Long]("cluster_size") - 1)
      assert(lens(r.getAs[Long]("keep_doc_id")) == r.getAs[Long]("keep_len"))
    }
    // representatives cover the corpus exactly once per cluster
    assert(rows.map(_.getAs[Long]("cluster_size")).sum == lens.size)
    // multi-doc clusters must exist and keep their longest member
    val multi = rows.filter(_.getAs[Long]("cluster_size") > 1)
    assert(multi.nonEmpty, "expected near-dup clusters in testdata")
    val labels = graft.operators.Dedup.dupLabels(spark, sf, 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label")).toMap
    multi.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val members = labels.collect { case (d, l) if l == cid => d }
      val best = members.map(d => (lens(d), -d)).max
      assert(r.getAs[Long]("keep_len") == best._1 &&
        r.getAs[Long]("keep_doc_id") == -best._2,
        s"cluster $cid kept the wrong representative")
    }
  }

  test("d11 dup spans: exact-duplicate docs are 100% span-duplicated, bounds hold") {
    val rows = graft.operators.Dedup.d11DupSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("n_windows"))
      assert(r.getAs[Long]("n_dup_spans") <= r.getAs[Long]("n_dup_windows"))
    }
    assert(rows.map(_.getAs[Long]("n_dup_windows")).sum > 0,
      "testdata's near-dup docs share aligned spans; none detected")
    // hash-independent ground truth: one flagged shared span must be a
    // literal substring of BOTH docs' texts (no md5 in this path)
    val shared = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, greatest(0, length(text) - 64) div 16),
          |  i -> substr(text, i * 16 + 1, 64))""".stripMargin)).as("span"))
      .filter(length(col("span")) === 64)
    val pair = shared.as("a")
      .join(shared.as("b"), col("a.span") === col("b.span") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        col("a.span").as("span"))
      .head()
    val (ida, idb, span) =
      (pair.getLong(0), pair.getLong(1), pair.getString(2))
    val texts = Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(ida, idb))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(texts(ida).contains(span) && texts(idb).contains(span))
    // and d11 must have counted both ends of that shared span
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(ida).getAs[Long]("n_dup_windows") > 0)
    assert(byId(idb).getAs[Long]("n_dup_windows") > 0)
  }

  test("d15 CDC chunking is shift-invariant: a prefix edit keeps most chunks; aligned blocks lose all") {
    import graft.operators.Dedup
    val base = Tables(spark, sf, "documents")
      .filter(col("n_chars") >= 500).limit(20)
      .select(col("doc_id"), col("source"), col("text"))
    val edited = base.withColumn("text", concat(lit("EDIT! "), col("text")))
    def hashes(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      Dedup.cdcSegment(d)
        .select(col("doc_id"), md5(col("chunk").cast("binary")).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (ho, he) = (hashes(base), hashes(edited))
    val survived = ho.intersect(he).size.toDouble / ho.size
    assert(survived > 0.6,
      f"only $survived%.2f of CDC chunks survived a 6-char prefix edit")
    // the aligned-block scheme (d11/m02's stride convention) loses
    // EVERY block hash under the same edit — the contrast CDC exists for
    def aligned(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      d.select(col("doc_id"), explode(expr(
          "transform(sequence(0, (length(text) - 1) div 64), " +
            "i -> md5(cast(substring(text, cast(i*64+1 AS INT), 64) as binary)))"))
          .as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (ao, ae) = (aligned(base), aligned(edited))
    val alignedSurvived = ao.intersect(ae).size.toDouble / ao.size
    assert(alignedSurvived < 0.1,
      f"aligned blocks unexpectedly robust: $alignedSurvived%.2f")
    assert(survived > alignedSurvived + 0.5)
  }
}
