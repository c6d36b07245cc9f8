package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over `embeddings` (float[64] vectors): exact
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketing as the scale path.
  *
  * The query side is a bounded, broadcast set — the "cross join" is
  * k·n with the small side broadcast, i.e. a map-side loop, not a
  * shuffle. At 100 TB the corpus stays partitioned and is scanned
  * once per batch of queries.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  /** s01: exact cosine top-10 neighbours for query vectors vec_id<10.
    * Uses the native codegen'd CosineSimExpr (bit-identical to the
    * `aggregate(zip_with(...))` formulation, ~lambda-free hot loop).
    */
  def s01CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("label"))
    val pairs = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("rnk"), col("cid"), col("label"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  // deploy-tunable (s02/s06/s07 queries and oracles regenerate in
  // lockstep from this value at class init — see Dedup.EMB_PLANES)
  private val PLANES: Int = {
    val p = sys.props.getOrElse("graft.lsh.query.planes", "8").toInt
    require(p >= 1 && p <= 24, s"graft.lsh.query.planes out of range: $p"); p
  }

  /** s02: random-hyperplane LSH — 8 deterministic hyperplanes
    * (md5-derived ±1 sign vectors, [[graft.functions.Hyperplanes]])
    * → 256 buckets; per-vector bucket id + candidate count. The
    * projection is a row-local sequential fold over the embedding
    * array (no explode/groupBy shuffle — the only shuffle left is the
    * bucket-size aggregation), and the md5 signs make the bucket ids
    * reproducible in DuckDB, so the whole output is exactly
    * hash-checked.
    */
  def s02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    // scoped persist: bucketed feeds the size roll-up AND the final
    // join — one pass over the projection folds instead of two; the
    // cache is released after the query's terminal action (Caches)
    val bucketed = graft.Caches.scoped(emb(spark, dir)
      .select(col("vec_id"), col("label"),
        graft.functions.Hyperplanes.bucketCol("embedding", 0, PLANES).as("bucket")))
    val sizes = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("bucket_size"))
    bucketed.join(sizes, Seq("bucket"))
      .withColumn("n_candidates", col("bucket_size") - 1)
      .select(col("vec_id"), col("label"), col("bucket"), col("bucket_size"), col("n_candidates"))
      .orderBy(col("vec_id"))
  }

  /** s06: multi-probe LSH — the recall knob on s02's buckets. Each
    * vector probes its own bucket PLUS the 8 single-bit-flip
    * neighbours (the closest buckets in hamming space — where a
    * near-miss neighbour most likely landed), trading ~9× scan cost
    * for recall without rebuilding the index. Emits per-vector scan
    * accounting: single-bucket vs multi-probe candidate counts and
    * the corpus fraction scanned. Same md5-derived hyperplanes as
    * s02, so DuckDB reproduces every bucket id exactly.
    */
  def s06AnnMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    // scoped persist: bucketed is read three times (sizes, probes,
    // label join) — cache the narrow table, not the projection folds;
    // released after the terminal action
    val bucketed = graft.Caches.scoped(emb(spark, dir)
      .select(col("vec_id"), col("label"),
        graft.functions.Hyperplanes.bucketCol("embedding", 0, PLANES).as("bucket")))
    val sizes = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("bucket_size"))
    val total = bucketed.agg(count(lit(1)).as("n_total"))
    val flips = lit(0) +: (0 until PLANES).map(p => lit(1 << p))
    val probes = bucketed
      .select(col("vec_id"), col("bucket"), explode(array(flips: _*)).as("flip"))
      .select(col("vec_id"), col("bucket"),
        col("bucket").bitwiseXOR(col("flip")).as("probe_bucket"))
    val scanned = probes
      .join(sizes.withColumnRenamed("bucket", "probe_bucket"), Seq("probe_bucket"), "left")
      .groupBy(col("vec_id"), col("bucket"))
      .agg(sum(coalesce(col("bucket_size"), lit(0L))).as("n_scanned"))
    scanned
      .join(sizes, Seq("bucket"))
      .join(broadcast(total))
      .join(bucketed.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(
        col("vec_id"), col("label"), col("bucket"),
        (col("bucket_size") - 1).as("n_candidates"),
        (col("n_scanned") - 1).as("n_candidates_mp"),
        (col("n_scanned").cast("double") / col("n_total").cast("double")).as("scan_frac"))
      .orderBy(col("vec_id"))
  }

  /** s07: multi-probe ANN SEARCH — the end-to-end query path on the
    * s02/s06 bucket index: each query probes its own hyperplane
    * bucket plus the 8 one-bit-flip neighbours, exact cosine runs
    * only inside the probed buckets, top-5 per query. Queries are a
    * bounded broadcast set; the corpus stays partitioned and is
    * touched only where bucket ids match — ~9/256 of it per query at
    * scale. Exactly oracle-checked on the same md5 hyperplanes.
    */
  def s07AnnMultiprobeTopk(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    // no persist here: the probe side's vec_id filter prunes before
    // the projection folds run, and caching this table would pin the
    // full embedding arrays for one extra fold pass saved
    val bucketed = e
      .select(col("vec_id"), col("label"), col("embedding"),
        graft.functions.Hyperplanes.bucketCol("embedding", 0, PLANES).as("bucket"))
    val flips = lit(0) +: (0 until PLANES).map(p => lit(1 << p))
    val probes = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(array(flips: _*)).as("flip"),
        col("bucket"))
      .select(col("qid"), col("qe"),
        col("bucket").bitwiseXOR(col("flip")).as("probe_bucket"))
    val hits = bucketed
      .join(broadcast(probes),
        col("bucket") === col("probe_bucket") && col("vec_id") =!= col("qid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    hits.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("vec_id").as("cid"), col("label"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s03: IVF-style ANN — coarse quantization by per-label centroids
    * (stand-in for k-means cells), queries probe only their nearest
    * cell, exact cosine inside the cell. The corpus is scanned once to
    * build cells; each query touches |cell| ≈ n/k vectors instead of
    * n — the 100 TB ANN pattern. Exactly oracle-checked: every stage
    * (decimal-accumulated per-dimension mean → FLOAT centroid, probe
    * argmax, in-cell top-5) is deterministic — order-independent by
    * construction — and mirrored in DuckDB SQL.
    *
    * Recall caveat (measured): on this near-random synthetic corpus
    * (within-label cosine ≈ cross-label) single-cell probing recalls
    * ~12% of the exact top-5 — an honest property of IVF on weakly
    * clustered data; raise nprobe or use s02's LSH when recall
    * matters more than scan cost.
    */
  def s03AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    // coarse cells: per-dimension mean per label (the "centroid")
    val flat = e.select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
    // decimal-accumulated mean (house exactness pattern): a raw
    // double avg() depends on partial-merge order and is only
    // PROBABILISTICALLY equal across engines/runs; decimal sum is
    // exact and order-independent, one IEEE division after
    val centroids = flat.groupBy(col("label"), col("i"))
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"),
        expr("transform(pairs, p -> CAST(p.cx AS FLOAT))").as("centroid"))
    // queries probe their nearest centroid cell
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val probe = q.crossJoin(broadcast(centroids))
      .withColumn("csim", GraftFunctions.cosineSim(col("qe"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("c_label"))))
      .filter(col("rn") === 1)
      .select(col("qid"), col("qe"), col("c_label").as("probe_label"))
    // exact search inside the probed cell only
    val cell = e.select(col("vec_id").as("cid"), col("label"), col("embedding").as("ce"))
    val hits = cell.join(broadcast(probe),
        col("label") === col("probe_label") && col("qid") =!= col("cid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    hits.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("cid"), col("probe_label"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s12: kNN-GRAPH build — every vector's top-3 cosine neighbors,
    * IVF-blocked: vectors compare only within their k-means cell
    * (the shared deterministic [[kmeansAssignments]] stage), so the
    * pair space is Σ|cell|² instead of n². With K scaled ∝ n (cells
    * of ~constant size) the build stays linear in n — the standard
    * distributed kNN-graph recipe feeding SemDeDup-style pruning and
    * graph-based ANN indexes. Exactly oracled: assignment, in-cell
    * ranking (bit-identical cosine, ties to smaller id) and rounding
    * are all mirrored in the DuckDB twin.
    */
  def s12KnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val a = graft.Caches.scoped(kmeansAssignments(spark, dir)
      .select(col("vec_id"), col("embedding"), col("cell_id")))
    val q = a.select(col("cell_id"), col("vec_id").as("qid"),
      col("embedding").as("qe"))
    val pairs = q.join(
        a.select(col("cell_id"), col("vec_id").as("cid"), col("embedding")),
        Seq("cell_id"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  private val KMEANS_K = 8

  /** The deterministic 2-round Lloyd assignment stage behind s08 —
    * shared with d10's SemDeDup pass. Returns one row per vector:
    * (vec_id, embedding, cell_id, sim-to-final-centroid). Every stage
    * is a bounded broadcast (K centroids) against the partitioned
    * corpus; [[kmeansSqlCtes]] is its DuckDB twin.
    */
  private[operators] def kmeansAssignments(
      spark: SparkSession, dir: String,
      corpus: Option[DataFrame] = None): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus.getOrElse(emb(spark, dir))
    val seeds = e
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(KMEANS_K)
    val init = seeds
      .withColumn("cell_id",
        (row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1).cast("int"))
      .select(col("cell_id"), col("embedding").as("centroid"))
    // spread before the K-way distance fan-out (single local scan
    // task would otherwise run every cosine single-threaded)
    val eWide = Tables.spread(e.select(col("vec_id"), col("embedding")))
    // argmax as a hash aggregate, not a window sort: max_by gets
    // map-side partial combine, so the n×K scored rows reduce to n
    // BEFORE the exchange (the window form shuffle-sorts all n×K).
    // Ordering struct (sim, -cell_id) reproduces the row_number
    // order (sim DESC, cell_id ASC) exactly, ties included.
    def assign(centroids: org.apache.spark.sql.DataFrame) = {
      val scored = eWide.crossJoin(broadcast(centroids))
        .withColumn("sim", GraftFunctions.cosineSim(col("embedding"), col("centroid")))
      scored.groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("embedding"), col("cell_id"), col("sim")),
          struct(col("sim"), (-col("cell_id")).as("nc"))).as("b"))
        .select(col("vec_id"), col("b.embedding").as("embedding"),
          col("b.cell_id").as("cell_id"), col("b.sim").as("sim"))
    }
    def recompute(assigned: org.apache.spark.sql.DataFrame) =
      assigned.select(col("cell_id"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
        // decimal-accumulated mean — order-independent, unlike avg()
        .groupBy(col("cell_id"), col("i"))
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
          .cast("double") / count(lit(1))).as("cx"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
        .select(col("cell_id"),
          expr("transform(pairs, p -> CAST(p.cx AS FLOAT))").as("centroid"))
    assign(recompute(assign(init)))
  }

  /** DuckDB CTE chain mirroring [[pqModel]] bit-for-bit — terminal
    * CTEs: `subs` (vec_id, sp, sub), `cent1` (sp, code, cent — the
    * trained codebook), `a2` (vec_id, sp, code, d2 — final codes).
    * `p` prefixes every CTE name so the chain can compose with
    * [[kmeansSqlCtes]] (which also defines `cent1`/`a2`) in one
    * statement — s14's IVF-PQ oracle.
    */
  private[operators] def pqSqlCtes(p: String = ""): String =
    s"""${p}sps AS (SELECT unnest([${(0 until PQ_S).mkString(", ")}]) AS sp),
       |${p}subs AS (
       |  SELECT e.vec_id, s.sp,
       |    e.embedding[s.sp*$PQ_SUBDIM+1 : s.sp*$PQ_SUBDIM+$PQ_SUBDIM] AS sub
       |  FROM embeddings e CROSS JOIN ${p}sps s),
       |${p}pqseeds AS (
       |  SELECT vec_id, embedding, md5(vec_id::VARCHAR) AS h
       |  FROM embeddings ORDER BY h, vec_id LIMIT $PQ_K),
       |${p}pqinit AS (
       |  SELECT sp2.sp,
       |    (ROW_NUMBER() OVER (PARTITION BY sp2.sp ORDER BY h, vec_id) - 1)::INT AS code,
       |    s.embedding[sp2.sp*$PQ_SUBDIM+1 : sp2.sp*$PQ_SUBDIM+$PQ_SUBDIM] AS cent
       |  FROM ${p}pqseeds s CROSS JOIN ${p}sps sp2),
       |${p}pd1 AS (
       |  SELECT u.vec_id, u.sp, c.code,
       |    list_sum(list_transform(range(1, ${PQ_SUBDIM + 1}),
       |      i -> (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE) *
       |           (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE))) AS d2
       |  FROM ${p}subs u JOIN ${p}pqinit c ON u.sp = c.sp),
       |${p}pa1 AS (
       |  SELECT vec_id, sp, code FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp
       |      ORDER BY d2, code) AS rn FROM ${p}pd1) WHERE rn = 1),
       |${p}pflat AS (
       |  SELECT a.sp, a.code, t.i, u.sub[t.i]::DOUBLE AS x
       |  FROM ${p}pa1 a JOIN ${p}subs u ON a.vec_id = u.vec_id AND a.sp = u.sp
       |  CROSS JOIN range(1, ${PQ_SUBDIM + 1}) t(i)),
       |${p}pcm AS (
       |  SELECT sp, code, i,
       |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
       |  FROM ${p}pflat GROUP BY 1, 2, 3),
       |${p}cent1 AS (
       |  SELECT sp, code, list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS cent
       |  FROM ${p}pcm GROUP BY sp, code),
       |${p}pd2 AS (
       |  SELECT u.vec_id, u.sp, c.code,
       |    list_sum(list_transform(range(1, ${PQ_SUBDIM + 1}),
       |      i -> (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE) *
       |           (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE))) AS d2
       |  FROM ${p}subs u JOIN ${p}cent1 c ON u.sp = c.sp),
       |${p}a2 AS (
       |  SELECT vec_id, sp, code, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp
       |      ORDER BY d2, code) AS rn FROM ${p}pd2) WHERE rn = 1)""".stripMargin

  /** Shared CTE chain of the frozen-quantizer append oracles (s15,
    * st22): k-means trains on the 80% base, `cent2` restates the
    * stored centroids decimal-exactly, `probes` the query probe set,
    * `newasn` the holdout assigned to the FROZEN centroids, and
    * `post_corpus` the corpus after the append. Batch-structure
    * independent by construction — per-vector frozen assignment is
    * the reason micro-batched and bulk appends serve identically.
    */
  private[graft] def annAppendSqlCtes: String =
    s"""ebase AS (
       |  SELECT * FROM embeddings WHERE vec_id % 5 <> 4),
       |${kmeansSqlCtes("ebase")},
       |flat2 AS (
       |  SELECT cell_id, i, a2.embedding[i]::DOUBLE AS x
       |  FROM a2 CROSS JOIN range(1, 65) t(i)),
       |cm2 AS (
       |  SELECT cell_id, i,
       |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
       |  FROM flat2 GROUP BY 1, 2),
       |cent2 AS (
       |  SELECT cell_id,
       |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
       |  FROM cm2 GROUP BY cell_id),
       |probes AS (
       |  SELECT qid, cell_id FROM (
       |    SELECT q.vec_id AS qid, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${cosSql("q.embedding", "c.centroid")} DESC, c.cell_id)
       |        AS probe_rank
       |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
       |    CROSS JOIN cent2 c) WHERE probe_rank <= 2),
       |newasn AS (
       |  SELECT vec_id, embedding, cell_id FROM (
       |    SELECT n.vec_id, n.embedding, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        ${cosSql("n.embedding", "c.centroid")} DESC, c.cell_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id % 5 = 4) n
       |    CROSS JOIN cent2 c) WHERE rn = 1),
       |post_corpus AS (
       |  SELECT vec_id, embedding, cell_id FROM a2
       |  UNION ALL SELECT vec_id, embedding, cell_id FROM newasn)""".stripMargin

  /** DuckDB CTE chain mirroring [[kmeansAssignments]] bit-for-bit —
    * terminal CTE `a2` has (vec_id, embedding, cell_id, sim). Spliced
    * into the s08 and d10 oracles so retuning K can never
    * de-synchronize a gate from its oracle.
    */
  private[operators] def kmeansSqlCtes(src: String = "embeddings"): String =
    s"""seeds AS (
       |  SELECT vec_id, embedding, md5(vec_id::VARCHAR) AS h
       |  FROM $src ORDER BY h, vec_id LIMIT $KMEANS_K),
       |init AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1)::INT AS cell_id,
       |    embedding AS centroid
       |  FROM seeds),
       |s1 AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id,
       |    ${cosSql("e.embedding", "c.centroid")} AS sim
       |  FROM $src e CROSS JOIN init c),
       |a1 AS (
       |  SELECT vec_id, embedding, cell_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, cell_id) AS rn FROM s1) WHERE rn = 1),
       |flat1 AS (
       |  SELECT cell_id, i, a1.embedding[i]::DOUBLE AS x
       |  FROM a1 CROSS JOIN range(1, 65) t(i)),
       |cm1 AS (
       |  SELECT cell_id, i,
       |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
       |  FROM flat1 GROUP BY 1, 2),
       |cent1 AS (
       |  SELECT cell_id,
       |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
       |  FROM cm1 GROUP BY cell_id),
       |s2 AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id,
       |    ${cosSql("e.embedding", "c.centroid")} AS sim
       |  FROM $src e CROSS JOIN cent1 c),
       |a2 AS (
       |  SELECT vec_id, embedding, cell_id, sim FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, cell_id) AS rn FROM s2) WHERE rn = 1)""".stripMargin

  /** Build the STORED IVF index at `idxDir`: postings = the final
    * k-means assignments written PARTITIONED BY cell (one directory
    * per cell — the physical layout that makes serving a
    * partition-pruned read), centroids = decimal-exact per-cell means
    * of the stored postings, committed as a versioned snapshot (the
    * index is itself time-travelable metadata). Build cost = the
    * k-means passes + one clustered write; it runs ONCE per corpus
    * version, amortized over every query batch after.
    */
  private[graft] def buildAnnIndex(spark: SparkSession, dir: String,
      idxDir: String, corpus: Option[DataFrame] = None,
      meta: Option[DataFrame] = None): Unit = graft.BenchPhase.land {
    val base = kmeansAssignments(spark, dir, corpus)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
    // metadata columns (filter attributes) ride INSIDE the posting
    // files — the vector-store "metadata filtering" layout: a
    // filtered serve never joins back to the raw table
    val a = meta.fold(base)(m => base.join(m, "vec_id"))
    // cluster by cell BEFORE the partitioned write (guide §6 — the
    // Iceberg write.distribution-mode=hash shape, the same move
    // compactAnnIndex already makes): with M pre-write tasks each
    // holding rows of most cells, partitionBy fans out up to M×cells
    // files; clustered, each cell lands as one file regardless of M.
    // At sf0.1 AQE already coalesces the tiny assignment output to one
    // task (8 files either way, measured), so this is cost-neutral
    // locally (A/B within noise) and exists for the many-task shape
    a.repartition(spark.sessionState.conf.numShufflePartitions,
        col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$idxDir/postings")
    val stored = spark.read.parquet(s"$idxDir/postings")
    val cents = stored.select(col("cell_id"), posexplode(col("embedding")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .groupBy(col("cell_id"), col("i"))
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .select(col("cell_id"),
        expr("transform(pairs, p -> CAST(p.cx AS FLOAT))").as("centroid"))
    graft.sources.Snapshots.commit(cents, s"$idxDir/centroids")
  }

  // ---- exactly-once append machinery --------------------------------
  // The append ledger (`<idxDir>/_append_ledger`, one committed batch
  // tag per line) is the SnapshotSink pattern applied to the raw
  // partitioned posting layout: a replayed batch whose tag is already
  // ledgered is a no-op, and a batch that crashed AFTER landing files
  // but BEFORE its ledger line converges on replay because every file
  // a tag lands carries a name derived from the tag (`ann-<tag>-<i>`)
  // — the replay first clears the tag's residue, re-lands the same
  // set, then commits the line. Same JVM-monitor + FileChannel lock
  // shape as Snapshots.withManifestLock.
  private def appendLedgerPath(idxDir: String) =
    java.nio.file.Paths.get(idxDir, "_append_ledger")

  private[graft] def committedAppendTags(idxDir: String): Set[String] = {
    val p = appendLedgerPath(idxDir)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala
        .map(_.trim).filter(_.nonEmpty).toSet
    }
  }

  private val appendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withAppendLock[A](idxDir: String)(f: => A): A = {
    val key = java.nio.file.Paths.get(idxDir)
      .toAbsolutePath.normalize.toString
    val monitor = appendLocks.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      import java.nio.file.StandardOpenOption._
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(idxDir, "_append.lock"), CREATE, WRITE)
      try { val l = ch.lock(); try f finally l.release() }
      finally ch.close()
    }
  }

  /** APPEND a batch of new vectors into a stored ANN index without
    * rebuilding it — the production ingest path of every IVF store
    * (FAISS `add`, the reason a billion-vector index absorbs arrivals
    * online): the coarse quantizer is FROZEN (the committed
    * centroids), each new vector is assigned to its nearest existing
    * cell by the same argmax-as-aggregate the trainer uses, and the
    * assignments land as APPENDED files under their cell partitions —
    * existing postings are never rewritten, the write cost is
    * ∝ batch, and serves pick the new vectors up through the same
    * partition-pruned read. (Quantizer drift is the documented
    * trade: cells grow unevenly until the next scheduled re-train —
    * s08's build — exactly how production IVF indexes operate.)
    *
    * With `batchTag` the append is EXACTLY-ONCE: the tag owns its
    * posting file names, a ledgered tag replays as a no-op, and a
    * crashed half-landed attempt is cleared and re-landed
    * deterministically before the ledger line commits (see the
    * ledger comment above). A concurrent reader can observe a
    * mid-move torn batch (raw parquet listing has no commit point) —
    * the documented trade vs the versioned store; the streaming
    * drain → serve sequence never reads mid-append.
    */
  private[graft] def appendAnnIndex(spark: SparkSession, idxDir: String,
      batch: DataFrame, batchTag: Option[String] = None): Unit = graft.BenchPhase.land {
    if (batchTag.exists(committedAppendTags(idxDir).contains)) return
    GraftFunctions.register(spark)
    val cents = graft.sources.Snapshots.read(spark, s"$idxDir/centroids")
    val scored = Tables.spread(batch.select(col("vec_id"), col("embedding")))
      .crossJoin(broadcast(cents))
      .withColumn("sim",
        GraftFunctions.cosineSim(col("embedding"), col("centroid")))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("embedding"), col("cell_id"), col("sim")),
        struct(col("sim"), (-col("cell_id")).as("nc"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.cell_id").as("cell_id"))
    // NOT clustered by cell before the write (unlike the build): a
    // micro-batch is already narrow (stream-width partitions), the
    // extra per-batch shuffle measured SLOWER than the few files it
    // saves, and compaction (s18) is the designated layout fixer
    batchTag match {
      case None =>
        assigned.write.mode(SaveMode.Append).partitionBy("cell_id")
          .parquet(s"$idxDir/postings")
      case Some(tag) =>
        val safe = tag.replaceAll("[^A-Za-z0-9_=.-]", "_")
        val staging = s"$idxDir/_staging/$safe"
        assigned.write.mode(SaveMode.Overwrite).partitionBy("cell_id")
          .parquet(staging)
        withAppendLock(idxDir) {
          if (!committedAppendTags(idxDir).contains(tag)) {
            landStaged(staging, s"$idxDir/postings", safe)
            import java.nio.file.StandardOpenOption._
            java.nio.file.Files.write(appendLedgerPath(idxDir),
              s"$tag\n".getBytes("UTF-8"), CREATE, APPEND)
            ()
          }
        }
        deleteDirTree(java.nio.file.Paths.get(staging))
    }
  }

  /** Tombstoned vec_ids of a stored index, if any — the delete side
    * of the online-index story (see [[deleteFromAnnIndex]]).
    */
  private def annTombstones(spark: SparkSession,
      idxDir: String): Option[DataFrame] = {
    val d = java.nio.file.Paths.get(s"$idxDir/deletes")
    if (java.nio.file.Files.exists(d)) Some(spark.read.parquet(d.toString))
    else None
  }

  /** DELETE vectors from a stored ANN index — the GDPR/right-to-be-
    * forgotten path every production vector store needs (FAISS
    * `remove_ids`, the MoR `positionDeletes` economics applied to
    * postings): the ids land as TOMBSTONES under `deletes/` — no
    * posting file is rewritten, cost ∝ deleted ids — and every serve
    * anti-joins them out until the next [[compactAnnIndex]] bakes
    * them in and clears the ledger. `batchTag` rides the same
    * exactly-once append ledger as [[appendAnnIndex]]: a replayed
    * delete batch is a no-op. The tombstone set stays bounded by
    * deletions-since-last-compaction (the LSM posture), so the
    * serve-side anti-join broadcast is safe by construction.
    */
  private[graft] def deleteFromAnnIndex(spark: SparkSession, idxDir: String,
      ids: DataFrame, batchTag: Option[String] = None): Unit = graft.BenchPhase.land {
    if (batchTag.exists(committedAppendTags(idxDir).contains)) return
    val tombs = ids.select(col("vec_id")).distinct()
    batchTag match {
      case None =>
        tombs.write.mode(SaveMode.Append).parquet(s"$idxDir/deletes")
      case Some(tag) =>
        val safe = tag.replaceAll("[^A-Za-z0-9_=.-]", "_")
        val staging = s"$idxDir/_staging/del-$safe"
        tombs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
        withAppendLock(idxDir) {
          if (!committedAppendTags(idxDir).contains(tag)) {
            import java.nio.file.{Files, Paths, StandardCopyOption}
            import scala.jdk.CollectionConverters._
            val target = Paths.get(s"$idxDir/deletes")
            Files.createDirectories(target)
            val parts = {
              val l = Files.list(Paths.get(staging))
              try l.iterator().asScala
                .filter(_.toString.endsWith(".parquet"))
                .toList.sortBy(_.getFileName.toString)
              finally l.close()
            }
            parts.zipWithIndex.foreach { case (p, i) =>
              Files.move(p, target.resolve(s"del-$safe-$i.parquet"),
                StandardCopyOption.REPLACE_EXISTING)
            }
            import java.nio.file.StandardOpenOption._
            Files.write(appendLedgerPath(idxDir),
              s"$tag\n".getBytes("UTF-8"), CREATE, APPEND)
            ()
          }
        }
        deleteDirTree(java.nio.file.Paths.get(staging))
    }
  }

  /** Move a staged per-cell parquet layout into the live postings
    * under the tag's deterministic names. Clears the tag's residue
    * first so a crash-replay converges on the same file set.
    */
  private def landStaged(staging: String, postings: String,
      safe: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val postRoot = Paths.get(postings)
    if (Files.exists(postRoot)) {
      val walk = Files.walk(postRoot)
      try walk.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(s"ann-$safe-"))
        .toList.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    val stageRoot = Paths.get(staging)
    val cellDirs = Files.list(stageRoot).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("cell_id="))
      .toList.sortBy(_.getFileName.toString)
    cellDirs.foreach { cd =>
      val target = postRoot.resolve(cd.getFileName.toString)
      Files.createDirectories(target)
      val parts = Files.list(cd).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .toList.sortBy(_.getFileName.toString)
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.move(p, target.resolve(s"ann-$safe-$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private def deleteDirTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      val all = try walk.iterator().asScala.toList finally walk.close()
      all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    }
  }

  /** Serve a query batch from the STORED index only: broadcast the
    * committed centroids, probe `nprobe` cells per query, and read
    * JUST the probed posting partitions (the `isin` on the partition
    * column plans as partition pruning — SimilaritySpec pins
    * PartitionCount == probed cells). The raw embeddings table is
    * never touched for corpus vectors.
    */
  private[graft] def annServe(spark: SparkSession, idxDir: String,
      queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val cents = graft.sources.Snapshots.read(spark, s"$idxDir/centroids")
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("psim", GraftFunctions.cosineSim(col("qe"), col("centroid")))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cell_id"))))
      .filter(col("probe_rank") <= nprobe)
      .select(col("qid"), col("qe"), col("cell_id"))
    // bounded driver list: |queries| × nprobe cell ids — the probe set
    val cells = probes.select(col("cell_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val stored = spark.read.parquet(s"$idxDir/postings")
      .filter(col("cell_id").isin(cells.map(c => c: Any): _*))
    // tombstoned vectors never serve (bounded by deletions since the
    // last compaction — the LSM posture — so broadcast is safe)
    val postings = annTombstones(spark, idxDir) match {
      case Some(t) => stored.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => stored
    }
    val hits = postings.join(broadcast(probes),
        postings("cell_id") === probes("cell_id") && col("vec_id") =!= col("qid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("embedding")))
      .select(col("qid"), col("vec_id").as("cid"),
        postings("cell_id").as("cell_id"), col("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    hits.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("cid"), col("cell_id"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s13: STORED ANN INDEX — build once, serve many (a10's
    * stored-sketch pattern for vectors): [[buildAnnIndex]] lands the
    * k-means postings clustered by cell + versioned centroids;
    * [[annServe]] answers a query batch from the store alone —
    * broadcast centroid probe (nprobe=2), PARTITION-PRUNED posting
    * read, exact in-cell cosine top-5. At 100 TB the serve cost is
    * centroid-broadcast + the probed cells' bytes, independent of
    * corpus size — the separation (expensive clustered build,
    * metadata-pruned serves) is what production vector stores sell.
    * Every stage deterministic; the oracle rebuilds index + probe +
    * serve in SQL.
    */
  def s13AnnServe(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-index")
    buildAnnIndex(spark, dir, idxDir)
    val q = emb(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    annServe(spark, idxDir, q, nprobe = 2, topK = 5)
  }

  /** s15: ONLINE INDEX APPEND — the ingest half of the s13 story
    * (build-once-serve-many becomes build-once-ABSORB-ARRIVALS-serve
    * -many, FAISS `add` / every production vector store's streaming
    * ingest): the index is trained on the 80% of the corpus already
    * present (`vec_id % 5 != 4`), served once, then the remaining 20%
    * arrives and [[appendAnnIndex]] assigns each new vector to its
    * nearest FROZEN centroid and appends it under its cell partition —
    * no retrain, no posting rewrite, write cost ∝ batch. The same
    * queries served again now see the new vectors through the
    * unchanged partition-pruned read path. Both phases are gated
    * bit-for-bit: the oracle trains the k-means chain on the SAME 80%
    * (`kmeansSqlCtes` over a base CTE), restates the stored centroids
    * decimal-exactly, assigns the holdout batch to them with the
    * identical argmax, and serves both phases — so the frozen-
    * quantizer append semantics (probes unchanged, candidates grown)
    * are what's checked, not just row counts. At 100 TB: arrivals
    * cost ∝ batch and serve cost stays probed-cells-sized; the
    * documented trade is quantizer drift until the next scheduled
    * retrain — exactly how production IVF indexes operate.
    */
  def s15AnnAppend(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-append")
    val e = emb(spark, dir)
    buildAnnIndex(spark, dir, idxDir,
      corpus = Some(e.filter(col("vec_id") % 5 =!= 4)))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pre = annServe(spark, idxDir, q, nprobe = 2, topK = 5)
      .withColumn("phase", lit("pre"))
    val preRows = pre.collect() // materialize BEFORE the append lands
    appendAnnIndex(spark, idxDir, e.filter(col("vec_id") % 5 === 4),
      batchTag = Some("s15-holdout"))
    val post = annServe(spark, idxDir, q, nprobe = 2, topK = 5)
      .withColumn("phase", lit("post"))
    import spark.implicits._
    val preDf = spark.createDataFrame(
      spark.sparkContext.parallelize(preRows.toSeq), pre.schema)
    preDf.unionByName(post)
      .select(col("phase"), col("qid"), col("rnk"), col("cid"),
        col("cell_id"), col("sim_r"))
      .orderBy(col("phase").desc, col("qid"), col("rnk"))
  }

  /** Rewrite the posting layout so every cell directory holds exactly
    * ONE parquet file — the maintenance half of the online-append
    * story (FAISS re-adds into a fresh index; LSM stores and Iceberg
    * call it compaction, q53's pattern applied to the vector index):
    * each tagged append lands its own small files per cell, and after
    * enough micro-batches a serve reads dozens of tiny postings where
    * one would do. `repartition(cell_id)` puts each cell's rows in
    * exactly one task, so the partitioned rewrite emits one file per
    * cell; the swap happens under the append lock (no append can
    * interleave), and the ledger is untouched — already-committed
    * batch tags replay as no-ops against the compacted layout, so
    * exactly-once survives compaction. Same documented trade as the
    * append path: a concurrent READER could observe the swap window
    * (raw layout, no commit point); maintenance runs fenced.
    */
  private[graft] def compactAnnIndex(spark: SparkSession, idxDir: String): Unit =
    graft.BenchPhase.land {
    // the WHOLE read-rewrite-swap runs under the append lock: an
    // append committing between a staging build and the swap would be
    // dropped by the swap, and — its tag already ledgered — would
    // replay as a no-op forever (permanent silent loss). Holding the
    // lock across the rewrite trades append latency during compaction
    // for the no-interleave guarantee the exactly-once ledger assumes.
    withAppendLock(idxDir) {
      val staging = s"$idxDir/_compact_staging"
      val stored = spark.read.parquet(s"$idxDir/postings")
      // bake tombstones in: deleted vectors leave the layout for
      // good, and the tombstone set resets to empty afterwards
      val live0 = annTombstones(spark, idxDir) match {
        case Some(t) => stored.join(broadcast(t), Seq("vec_id"), "left_anti")
        case None => stored
      }
      // width-pinned (one task per cell, cells spread over the width)
      // instead of AQE-coalesced to one serial writer — same move as
      // Transforms.land (guide §2.6/§6)
      live0.repartition(spark.sessionState.conf.numShufflePartitions,
          col("cell_id"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell_id").parquet(staging)
      import java.nio.file.{Files, Paths}
      val live = Paths.get(s"$idxDir/postings")
      val old = Paths.get(s"$idxDir/_postings_old")
      deleteDirTree(old)
      Files.move(live, old)
      Files.move(Paths.get(staging), live)
      deleteDirTree(old)
      deleteDirTree(Paths.get(s"$idxDir/deletes"))
    }
  }

  /** Per-cell parquet file count of the stored posting layout —
    * bounded driver listing (K cell directories). */
  private def postingFileCounts(idxDir: String): Map[Int, Long] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(s"$idxDir/postings")
    val cells = Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("cell_id="))
      .toList
    cells.map { cd =>
      val n = Files.list(cd).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
      cd.getFileName.toString.stripPrefix("cell_id=").toInt -> n.toLong
    }.toMap
  }

  /** s18: INDEX COMPACTION — the maintenance op that keeps the online
    * ANN index (s13 build + s15/st22 appends) servable over time:
    * tagged micro-batch appends accrete small posting files per cell,
    * and [[compactAnnIndex]] rewrites each cell to exactly one file
    * WITHOUT changing a single served answer. The entry builds on the
    * 80% base, lands the holdout as TWO tagged appends (so cells hold
    * base + 2 append files), serves, compacts, serves again — and
    * returns per-cell (n_vectors, n_files) with two invariants
    * computed in-result: `n_files` = 1 per cell (pinned by the
    * one-task-per-cell rewrite), `serve_matches` = the pre/post serve
    * row sets compare equal (both bounded: |queries|×topK rows), and
    * `files_shrank` = the pre-compaction layout really had more files
    * than cells (the op wasn't vacuous). The oracle restates per-cell
    * vector counts from the frozen-quantizer chain ([[annAppendSqlCtes]]
    * `post_corpus`) and the three pinned invariants. At 100 TB:
    * compaction cost ∝ index bytes (not corpus bytes), runs per cell
    * in parallel, and the serve path it protects stays probed-cells-
    * sized — the same economics as q53's table compaction.
    */
  def s18IndexCompact(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-compact")
    val e = emb(spark, dir)
    buildAnnIndex(spark, dir, idxDir,
      corpus = Some(e.filter(col("vec_id") % 5 =!= 4)))
    val hold = e.filter(col("vec_id") % 5 === 4)
    appendAnnIndex(spark, idxDir, hold.filter(col("vec_id") % 2 === 0),
      batchTag = Some("s18-even"))
    appendAnnIndex(spark, idxDir, hold.filter(col("vec_id") % 2 === 1),
      batchTag = Some("s18-odd"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pre = annServe(spark, idxDir, q, nprobe = 2, topK = 5).collect().toSeq
    val before = postingFileCounts(idxDir)
    compactAnnIndex(spark, idxDir)
    val after = postingFileCounts(idxDir)
    val post = annServe(spark, idxDir, q, nprobe = 2, topK = 5).collect().toSeq
    val matches = pre.sortBy(_.toString) == post.sortBy(_.toString)
    val shrank = before.values.sum > after.keys.size
    import spark.implicits._
    val files = after.toSeq.map { case (c, n) => (c, n) }
      .toDF("cell_id", "n_files")
    spark.read.parquet(s"$idxDir/postings")
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_vectors"))
      .join(broadcast(files), "cell_id")
      .withColumn("serve_matches", lit(matches))
      .withColumn("files_shrank", lit(shrank))
      .orderBy(col("cell_id"))
  }

  /** s19: QUANTIZER-DRIFT MONITOR — the metric that closes the
    * online-index loop (s13 build → s15/st22 append → s18 compact →
    * WHEN to retrain): frozen-quantizer appends grow cells unevenly
    * (the documented trade of every production IVF store), and the
    * operational question is whether the skew has reached the point
    * where serve cost (∝ probed-cell size) justifies an s08 rebuild.
    * Per cell: base size, appended count, growth ratio; globally:
    * skew = max(total)/mean(total) and the retrain recommendation at
    * the 1.5 threshold. All counts come from the postings' partition
    * footprint — the monitor reads INDEX metadata-sized data, never
    * the corpus. The oracle restates every cell from the
    * frozen-assignment chain ([[annAppendSqlCtes]]). At 100 TB this
    * is a #cells-row aggregate — the cheap continuous check that
    * schedules the expensive rebuild.
    */
  def s19IndexDrift(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-drift")
    val e = emb(spark, dir)
    buildAnnIndex(spark, dir, idxDir,
      corpus = Some(e.filter(col("vec_id") % 5 =!= 4)))
    val baseCounts = spark.read.parquet(s"$idxDir/postings")
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_base"))
      .collect().map(r => (r.getInt(0), r.getLong(1))) // bounded: K cells
    appendAnnIndex(spark, idxDir, e.filter(col("vec_id") % 5 === 4),
      batchTag = Some("s19-holdout"))
    import spark.implicits._
    val base = baseCounts.toSeq.toDF("cell_id", "n_base")
    val per = spark.read.parquet(s"$idxDir/postings")
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_total"))
      .join(broadcast(base), "cell_id")
      .withColumn("n_new", col("n_total") - col("n_base"))
      .withColumn("growth_r", round(
        col("n_new").cast("double") / col("n_base").cast("double"), 6))
    val sk = per.agg(round(
      max(col("n_total")).cast("double") /
        (sum(col("n_total")).cast("double") /
          count(lit(1)).cast("double")), 6).as("skew"))
    per.crossJoin(broadcast(sk))
      .withColumn("retrain_recommended", col("skew") > lit(1.5))
      .select(col("cell_id"), col("n_base"), col("n_new"), col("n_total"),
        col("growth_r"), col("skew"), col("retrain_recommended"))
      .orderBy(col("cell_id"))
  }

  /** s20: VECTOR DELETION from the stored ANN index — the GDPR path
    * that completes the index lifecycle (build s13 / append s15 /
    * compact s18 / drift s19 / DELETE): [[deleteFromAnnIndex]] lands
    * the ids as tombstones (no posting rewritten, cost ∝ deleted
    * ids, exactly-once via the shared append ledger), every serve
    * anti-joins them out, and the next [[compactAnnIndex]] BAKES
    * them in and clears the tombstone set — the MoR positionDeletes
    * economics applied to postings. Gated phases: the pre-delete
    * serve, then the post-delete serve where every `vec_id % 7 = 3`
    * candidate is gone and ranks re-close over the survivors (the
    * oracle re-runs the full k-means serve chain with the same
    * exclusion); three invariants computed in-result and pinned
    * TRUE: a REPLAYED delete batch is a no-op (ledgered tag),
    * compaction changes no served answer, and compaction cleared the
    * tombstones. At 100 TB: deleting a user's vectors writes one
    * tombstone file, serves stay probed-cells-sized, and the cost of
    * physical erasure is deferred to the next scheduled compaction —
    * exactly how production vector stores honor erasure requests.
    */
  def s20AnnDelete(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-del")
    buildAnnIndex(spark, dir, idxDir)
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def serve(): DataFrame = annServe(spark, idxDir, q, nprobe = 2, topK = 5)
    val pre = serve().withColumn("phase", lit("a_pre"))
    val preRows = pre.collect() // materialize BEFORE the delete lands
    val del = e.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    deleteFromAnnIndex(spark, idxDir, del, batchTag = Some("s20-del"))
    // ONE post-delete serve: the unphased comparison basis and the
    // phased result rows come from the same served batch (the second
    // serve of identical index state re-paid the whole probe chain)
    val postServed = serve().collect()
    val post = spark.createDataFrame(
        spark.sparkContext.parallelize(postServed.toSeq),
        org.apache.spark.sql.types.StructType(
          pre.schema.filterNot(_.name == "phase")))
      .withColumn("phase", lit("b_post"))
    val postRows = post.collect()
    def sig(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted
    // replayed delete batch: ledgered tag short-circuits — no change
    deleteFromAnnIndex(spark, idxDir, del, batchTag = Some("s20-del"))
    val replayNoop = sig(serve().collect().toSeq) == sig(postServed.toSeq)
    compactAnnIndex(spark, idxDir)
    val compactMatches = sig(serve().collect().toSeq) == sig(postServed.toSeq)
    val cleared = !java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idxDir/deletes"))
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize((preRows ++ postRows).toSeq), pre.schema)
    all.withColumn("replay_noop", lit(replayNoop))
      .withColumn("compact_matches", lit(compactMatches))
      .withColumn("tombstones_cleared", lit(cleared))
      .select(col("phase"), col("qid"), col("rnk"), col("cid"),
        col("cell_id"), col("sim_r"), col("replay_noop"),
        col("compact_matches"), col("tombstones_cleared"))
      .orderBy(col("phase"), col("qid"), col("rnk"))
  }

  /** s08: TRUE k-means coarse quantization — the real IVF index build
    * that s03's per-label cells stand in for. Deterministic
    * end-to-end: init = the K vectors with smallest md5(vec_id) (a
    * seedless, engine-reproducible draw), then two Lloyd iterations
    * with cosine assignment (argmax sim, ties to the smaller cell id)
    * and decimal-accumulated per-dimension-mean centroids cast to
    * FLOAT (order-independent — same parity pattern as s03). Every
    * stage is a bounded broadcast (K centroids) against the
    * partitioned corpus, so iteration cost is K·n map work + one
    * small aggregate per round at any scale. Output = per-cell size
    * and mean member-to-centroid similarity, decimal-summed for
    * order-independent cross-engine parity.
    */
  def s08AnnKmeans(spark: SparkSession, dir: String): DataFrame = {
    val round2 = kmeansAssignments(spark, dir)
    round2.groupBy(col("cell_id"))
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(round(col("sim"), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("sim_sum"))
      .select(col("cell_id"), col("n_vectors"),
        (col("sim_sum").cast("double") / col("n_vectors").cast("double")).as("avg_sim"))
      .orderBy(col("cell_id"))
  }

  private val PQ_S = 8       // subspaces
  private val PQ_SUBDIM = 8  // dims per subspace (8 × 8 = 64)
  private val PQ_K = 16      // codes per subspace codebook

  /** Per-subspace slices of a vector column as (sp, <as>) structs. */
  private def pqSlices(vec: org.apache.spark.sql.Column, as: String) =
    explode(array((0 until PQ_S).map(s =>
      struct(lit(s).as("sp"),
        slice(vec, s * PQ_SUBDIM + 1, PQ_SUBDIM).as(as))): _*))

  // fixed-order sequential fold — the same double arithmetic DuckDB's
  // ordered list_sum performs, so argmin decisions agree bit-for-bit
  private[graft] val pqDist2 = expr(
    """aggregate(zip_with(sub, cent,
      |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
      |            (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
      |  0D, (acc, v) -> acc + v)""".stripMargin)

  /** The shared PQ training pipeline behind s10/s11: returns
    * (codebook: (sp, code, cent), assignments: (vec_id, sp, sub,
    * code, d2)) after one Lloyd refinement from the md5-seeded init —
    * deterministic end-to-end; [[pqSqlCtes]] is its DuckDB twin.
    */
  /** The corpus split into PQ subvectors: (vec_id, sp, sub). Spread
    * BEFORE the ×S explode + S·K distance folds: a local single-file
    * scan is one task and the whole assignment CPU would run
    * single-threaded (cluster scans are already wide → no-op).
    */
  private[graft] def pqSubs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(emb(spark, dir).select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), pqSlices(col("embedding"), "sub").as("x"))
      .select(col("vec_id"), col("x.sp").as("sp"), col("x.sub").as("sub"))

  /** Assign every subvector to its nearest codebook cell — argmin as
    * a hash aggregate (see kmeansAssignments.assign): the n×S×K
    * scored rows partial-combine to n×S before the exchange. min_by
    * over struct(d2, code) == row_number(d2 ASC, code ASC).
    */
  private[graft] def pqAssign(spark: SparkSession, dir: String,
      centroids: DataFrame): DataFrame = {
    val scored = pqSubs(spark, dir).join(broadcast(centroids), Seq("sp"))
      .withColumn("d2", pqDist2)
    scored.groupBy(col("vec_id"), col("sp"))
      .agg(min_by(
        struct(col("sub"), col("code"), col("d2")),
        struct(col("d2"), col("code"))).as("b"))
      .select(col("vec_id"), col("sp"), col("b.sub").as("sub"),
        col("b.code").as("code"), col("b.d2").as("d2"))
  }

  private[graft] def pqModel(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    val seeds = e
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(PQ_K)
    val init = seeds
      .withColumn("code",
        (row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1).cast("int"))
      .select(col("code"), pqSlices(col("embedding"), "cent").as("x"))
      .select(col("x.sp").as("sp"), col("code"), col("x.cent").as("cent"))
    def assign(centroids: DataFrame): DataFrame =
      pqAssign(spark, dir, centroids)
    def recompute(assigned: DataFrame): DataFrame = assigned
      .select(col("sp"), col("code"), posexplode(col("sub")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .groupBy(col("sp"), col("code"), col("i"))
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy(col("sp"), col("code"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .select(col("sp"), col("code"),
        expr("transform(pairs, p -> CAST(p.cx AS FLOAT))").as("cent"))
    val codebook = recompute(assign(init))
    (codebook, assign(codebook))
  }

  /** s10: Product-Quantization codebook build (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search") — the
    * compression leg of the IVF-PQ design that makes 100 TB ANN
    * feasible: each vector splits into [[PQ_S]] subvectors, each
    * subspace trains its own [[PQ_K]]-code k-means codebook, and a
    * vector stores as S small codes (here 4×3 bits vs 64 floats —
    * a 64× memory cut) queried via per-subspace distance tables.
    * This entry builds the codebooks and reports per-cell population
    * + mean quantization error (the distortion a deployment watches
    * when sizing S/K).
    *
    * Same determinism recipe as s08: md5-seeded init (the 8 smallest
    * md5(vec_id) vectors seed every subspace), L2 assignment as a
    * fixed-order double fold (ties to the smaller code),
    * decimal-accumulated centroid means cast to FLOAT — so the DuckDB
    * oracle reproduces codebooks, codes, and distortions bit-for-bit.
    * Scale shape: every stage is the corpus against a broadcast
    * S·K-row codebook; the explode is ×S on narrow subvectors.
    */
  def s10PqCodebook(spark: SparkSession, dir: String): DataFrame = {
    val (_, finalAsn) = pqModel(spark, dir)
    finalAsn.groupBy(col("sp"), col("code"))
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(round(col("d2"), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("d2sum"))
      .select(col("sp"), col("code"), col("n_vectors"),
        (col("d2sum").cast("double") / col("n_vectors").cast("double"))
          .as("avg_sqdist"))
      .orderBy(col("sp"), col("code"))
  }

  /** s11: PQ asymmetric-distance search (ADC) — the query-time half
    * of IVF-PQ: per query, ONE tiny distance table (query subvector →
    * each of the S·K codebook cells, here 32 doubles) replaces all
    * float math; every corpus vector is then scored by summing S
    * table lookups on its stored codes — an exhaustive scan of the
    * COMPRESSED domain (no corpus float I/O), which is why PQ scans
    * billions of vectors from RAM at 100 TB corpus scale. Join shape:
    * codes ⋈ broadcast(query tables) on (sp, code) — shuffle-free on
    * the corpus side. Per-pair ADC distance is an S-term decimal sum
    * of rounded table entries (order-independent → cross-engine
    * exact); top-5 per query gated bit-for-bit.
    *
    * Approximation honesty (measured): on THIS near-random corpus
    * ADC recall@5 vs exact L2 is only ~0.1 — the exact top-5 margin
    * is smaller than the quantization noise of a 32-bit code, as
    * expected for structure-free vectors (compare d05's 0.4-sim "near
    * dups"). The invariant that IS corpus-independent — a query's own
    * code word minimizes its ADC distance (its codes are argmin by
    * construction), i.e. self-retrieval at rank 1 — is spec-proven.
    * Real embedding spaces with cluster structure are the ones PQ is
    * built for; S/K are the deploy knobs.
    */
  def s11PqSearch(spark: SparkSession, dir: String): DataFrame = {
    val (rawCodebook, _) = pqModel(spark, dir)
    // two consumers (query tables + corpus assignment) would each
    // re-run PQ training: cache the 32-row codebook, train once
    val codebook = graft.Caches.scoped(rawCodebook)
    codebook.queryExecution.toRdd.count()
    val asn = pqAssign(spark, dir, codebook)
    val e = emb(spark, dir)
    val qsubs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), pqSlices(col("embedding"), "sub").as("x"))
      .select(col("qid"), col("x.sp").as("sp"), col("x.sub").as("sub"))
    val qtab = qsubs.join(broadcast(codebook), Seq("sp"))
      .withColumn("qd2", round(pqDist2, 6))
      .select(col("qid"), col("sp"), col("code"), col("qd2"))
    val adc = asn.select(col("vec_id"), col("sp"), col("code"))
      .join(broadcast(qtab), Seq("sp", "code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .as("adcsum"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adcsum"), col("vec_id"))
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("vec_id").as("cid"),
        col("adcsum").cast("double").as("adc_dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s14: IVF-PQ — the two halves composed into the production
    * vector-search architecture (Jégou et al. 2011's IVFADC: an
    * inverted file restricts the search to probed cells, product
    * quantization scores the candidates from codes alone): the
    * coarse quantizer is the shared deterministic k-means
    * ([[kmeansAssignments]] — same cells as s08/s13), the fine
    * quantizer the shared [[pqModel]] codebook. Query time: probe
    * the top-2 cells by centroid similarity (centroids restated
    * decimal-exact from the final assignments, the s13 recipe), take
    * ONLY vectors in probed cells as candidates — the IVF reduction:
    * ~nprobe/K of the corpus ever scored — then rank them by ADC
    * (one tiny per-query distance table over the S·K codebook; an
    * S-term decimal sum per candidate, no corpus float I/O). At
    * 100 TB: the candidate join is posting-list-sized, the scoring
    * is code-arithmetic — the reason IVF-PQ serves billion-vector
    * indexes from RAM. Every stage bit-matched by the composed
    * DuckDB oracle (kmeans CTEs + prefixed PQ CTEs in one
    * statement).
    */
  def s14IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val coarse = graft.Caches.scoped(kmeansAssignments(spark, dir))
    val (rawCodebook, _) = pqModel(spark, dir)
    // the trained codebook (S·K = 32 rows) feeds TWO consumers — the
    // query distance tables and the corpus assignment pass — and each
    // would otherwise re-run the whole PQ training chain; cache it
    // eagerly (RDD-level populate so the release listener is not
    // consumed — the d14 lesson; same for `coarse`, which centroids,
    // queries and candidates all consume). The two training chains
    // are INDEPENDENT (coarse k-means vs PQ codebook), so their
    // populate actions run CONCURRENTLY (guide §2.6 — actions are
    // only sequential because the driver calls them sequentially;
    // each chain is many small stages, so the other chain's tasks
    // back-fill the scheduler gaps).
    val codebook = graft.Caches.scoped(rawCodebook)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try scala.concurrent.Await.result(scala.concurrent.Future.sequence(Seq(
      scala.concurrent.Future { coarse.queryExecution.toRdd.count(); () },
      scala.concurrent.Future { codebook.queryExecution.toRdd.count(); () })),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
    val asn = pqAssign(spark, dir, codebook)
    val cents = coarse.select(col("cell_id"), posexplode(col("embedding")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .groupBy(col("cell_id"), col("i"))
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .select(col("cell_id"),
        expr("transform(pairs, p -> CAST(p.cx AS FLOAT))").as("centroid"))
    val queries = coarse.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("psim", GraftFunctions.cosineSim(col("qe"), col("centroid")))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cell_id"))))
      .filter(col("probe_rank") <= 2)
      .select(col("qid"), col("cell_id"))
    val cand = coarse.select(col("vec_id"), col("cell_id"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell_id"))
    val qsubs = emb(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), pqSlices(col("embedding"), "sub").as("x"))
      .select(col("qid"), col("x.sp").as("sp"), col("x.sub").as("sub"))
    val qtab = qsubs.join(broadcast(codebook), Seq("sp"))
      .withColumn("qd2", round(pqDist2, 6))
      .select(col("qid"), col("sp"), col("code"), col("qd2"))
    val adc = cand
      .join(asn.select(col("vec_id"), col("sp"), col("code")), Seq("vec_id"))
      .join(broadcast(qtab), Seq("qid", "sp", "code"))
      .groupBy(col("qid"), col("vec_id"), col("cell_id"))
      .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .as("adcsum"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adcsum"), col("vec_id"))
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("vec_id").as("cid"), col("cell_id"),
        col("adcsum").cast("double").as("adc_dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s04: TF-IDF relevance search — score every document against a
    * fixed query term set (tf × ln(N/df) per term, fixed-order scalar
    * sum so the double arithmetic is cross-engine exact), top-20.
    * Conditional per-term aggregates — no terms-table join, one pass
    * over the token explosion; corpus stats (N, df) are one-row
    * broadcast sides. The inverted-index form of the same ranking is
    * the d02 index; this is the query-time half.
    */
  def s04TfidfSearch(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("vector", "filter", "merge")
    val d = graft.Tables(spark, dir, "documents")
    val toks = d.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    val tfAggs = terms.map(t =>
      count(when(col("token") === t, 1)).as(s"tf_$t"))
    // scoped persist: tf (a narrow per-doc table) feeds both the df
    // roll-up and the final scoring join — one pass over the token
    // explosion instead of two; released after the terminal action
    val tf = graft.Caches.scoped(
      toks.groupBy(col("doc_id")).agg(tfAggs.head, tfAggs.tail: _*))
    val dfAggs = terms.map(t =>
      count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t"))
    val dfs = tf.agg(dfAggs.head, dfAggs.tail: _*)
    val n = d.agg(count(lit(1)).as("n_docs"))
    // idf rounded to 9 dp BEFORE combining: Spark's log() and
    // DuckDB's ln() are different libm implementations that can
    // disagree by 1 ulp for some N/df (first seen at sf0.1); the
    // integer-tf multiply and 3-term fixed-order sum after are exact
    val score = terms.map(t =>
      col(s"tf_$t").cast("double") *
        round(log(col("n_docs").cast("double") / col(s"df_$t").cast("double")), 9))
      .reduce(_ + _)
    tf.join(broadcast(dfs)).join(broadcast(n))
      .withColumn("score", score)
      .filter(col("score") > 0.0)
      .select((col("doc_id") +: terms.map(t => col(s"tf_$t"))) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** s05: higher-order array functions over the vector column —
    * transform / filter / aggregate (sequential fold, deterministic
    * across engines) / element min-max; per-vector feature stats with
    * no explode shuffle (row-local array work, embarrassingly
    * parallel at 100 TB).
    */
  def s05VectorStats(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("n_dims"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        expr("size(filter(embedding, x -> x < 0))").cast("long").as("n_neg"),
        round(expr(
          "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"),
          6).as("l2_norm_r"),
        round(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)) / size(embedding)"),
          6).as("mean_r"),
        array_max(col("embedding")).cast("double").as("vmax"),
        array_min(col("embedding")).cast("double").as("vmin"))
      .orderBy(col("vec_id"))

  /** s16: SCALAR QUANTIZATION (SQ8) search — the third production
    * vector-compression family next to IVF (s03/s08) and PQ
    * (s10/s11), and the simplest (FAISS `ScalarQuantizer`): each
    * dimension is quantized independently to an 8-bit code against
    * the corpus-wide per-dimension [min, max] — a 4x memory
    * compression (64xFLOAT → 64 bytes) with NO trained codebook, so
    * the "model" is one 64-row stats aggregate. Codes are
    * floor-quantized (`floor((x-mn)·256/(mx-mn))` clamped to 255 —
    * floor, not round, so the boundary behavior is bit-reproducible
    * across engines), search is asymmetric: the float query scores
    * midpoint-reconstructed corpus vectors for a top-20 candidate
    * cut, then ONLY those 20 are re-ranked with the original floats
    * for the exact top-5 — the scan runs on the compressed
    * representation, full-precision vectors are touched for 20 rows
    * per query. The oracle rebuilds stats→codes→reconstruction→both
    * rankings in SQL; every arithmetic expression is shaped
    * identically on both engines (same IEEE op order), so the gate is
    * bit-exact. At 100 TB: the stats pass is one 64-row aggregate,
    * the compressed scan streams 4x fewer bytes, and the exact reads
    * are 20 rows per query — compose with IVF pruning (s13) for the
    * full production layout.
    */
  def s16Sq8Search(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    val stats = e.select(posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg(min(col("col").cast("double")).as("mn"),
        max(col("col").cast("double")).as("mx"))
      .orderBy(col("pos"))
      .collect() // bounded: exactly 64 dimension rows
    val mnArr = array(stats.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val mxArr = array(stats.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    val coded = e.withColumn("mn", mnArr).withColumn("mx", mxArr)
      .withColumn("codes", expr(
        """transform(embedding, (x, i) ->
          |  CASE WHEN mx[i] = mn[i] THEN 0
          |    ELSE CAST(LEAST(CAST(255 AS DOUBLE),
          |      FLOOR((CAST(x AS DOUBLE) - mn[i]) * 256.0D
          |        / (mx[i] - mn[i]))) AS INT) END)""".stripMargin))
      .withColumn("rec", expr(
        """CAST(transform(codes, (q, i) ->
          |  mn[i] + (CAST(q AS DOUBLE) + 0.5D) * (mx[i] - mn[i]) / 256.0D)
          |AS ARRAY<FLOAT>)""".stripMargin))
      .select(col("vec_id").as("cid"), col("rec"),
        col("embedding").as("ce"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cand = coded.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sq_sim", GraftFunctions.cosineSim(col("qe"), col("rec")))
    val w1 = Window.partitionBy(col("qid"))
      .orderBy(col("sq_sim").desc, col("cid"))
    val top = cand.withColumn("crnk", row_number().over(w1))
      .filter(col("crnk") <= 20)
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("ce")))
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    top.withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sq_sim"), 6).as("sq_sim_r"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s17: FILTERED ANN — metadata filtering inside the vector index,
    * the feature every production vector store ships (Qdrant/
    * Weaviate/Milvus "filtered search"; FAISS leaves it to the
    * caller): the query asks for nearest neighbors WITHIN ITS OWN
    * LABEL, and the filter column lives IN the posting files (built
    * once via [[buildAnnIndex]]'s meta join), so the serve is still
    * index-only — broadcast centroid probe, partition-pruned posting
    * read, label predicate applied IN-CELL before the exact top-5.
    * nprobe=3 (one more than s13) because filtering thins cells —
    * the classic filtered-search recall trade, priced explicitly.
    * Queries whose label is rare enough to empty all probed cells
    * return fewer than 5 rows — honest filtered-search semantics.
    * The oracle rebuilds index + label join + probe + filtered serve
    * in SQL. At 100 TB the filter costs zero extra I/O (it rides the
    * posting bytes already read); pre- vs post-filter selection is a
    * per-query planner choice this layout leaves open.
    */
  def s17FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idxDir = graft.TempDirs.scratch("graft-ann-filtered")
    val e = emb(spark, dir)
    buildAnnIndex(spark, dir, idxDir,
      meta = Some(e.select(col("vec_id"), col("label"))))
    val cents = graft.sources.Snapshots.read(spark, s"$idxDir/centroids")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("psim", GraftFunctions.cosineSim(col("qe"), col("centroid")))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("psim").desc, col("cell_id"))))
      .filter(col("probe_rank") <= 3)
      .select(col("qid"), col("qe"), col("qlabel"), col("cell_id"))
    // bounded driver list: |queries| × nprobe cell ids
    val cells = probes.select(col("cell_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val postings = spark.read.parquet(s"$idxDir/postings")
      .filter(col("cell_id").isin(cells.map(c => c: Any): _*))
    val hits = postings.join(broadcast(probes),
        postings("cell_id") === probes("cell_id") &&
          col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("embedding")))
      .select(col("qid"), col("vec_id").as("cid"), col("label"),
        postings("cell_id").as("cell_id"), col("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    hits.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("cid"), col("label"),
        col("cell_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s21: Johnson–Lindenstrauss RANDOM-PROJECTION dimensionality
    * reduction — 64-dim embeddings sketched to K=16 dims through a
    * deterministic ±1 sign matrix (md5-derived,
    * [[graft.functions.Hyperplanes]] table 40 — the Achlioptas
    * database-friendly JL construction; the 1/√K scale is omitted
    * because cosine is scale-invariant). Each probe's top-10 is
    * ranked by PROJECTED cosine and reported next to the exact
    * 64-dim cosine plus membership in the exact top-10 — the
    * neighborhood-preservation claim JL makes, measured instead of
    * assumed. The projection is a row-local sequential fold (zero
    * shuffle: 100 TB of embeddings project as embarrassingly
    * parallel map work, shipping 4× fewer bytes into every
    * downstream ANN/dedup stage); the identical sign literals and
    * fold order are restated in DuckDB, so every cell is exactly
    * hash-checked. Ref: the reference's embedding/vector-pipeline
    * surface (docs/architecture/lakehouse.md ML-feature bullet).
    */
  def s21RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val K = 16
    val T = 40 // hyperplane table id — disjoint from s02 (0) and d05
    def projArr(vec: String): Column = expr("array(" +
      (0 until K).map(p => graft.functions.Hyperplanes.projExpr(vec, T, p))
        .mkString(", ") + ")")
    def dot(a: String, b: String): Column = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qp", projArr("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("cp", projArr("ce"))
    val pairs = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("proj_sim",
        dot("qp", "cp") / (sqrt(dot("qp", "qp")) * sqrt(dot("cp", "cp"))))
      .withColumn("exact_sim", GraftFunctions.cosineSim(col("qe"), col("ce")))
    val wProj = Window.partitionBy(col("qid"))
      .orderBy(col("proj_sim").desc, col("cid"))
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("exact_sim").desc, col("cid"))
    pairs
      .withColumn("proj_rank", row_number().over(wProj))
      .withColumn("exact_rank", row_number().over(wExact))
      .filter(col("proj_rank") <= 10)
      .select(col("qid"), col("proj_rank"), col("cid"),
        round(col("proj_sim"), 6).as("proj_sim_r"),
        round(col("exact_sim"), 6).as("exact_sim_r"),
        (col("exact_rank") <= 10).as("in_exact_top10"))
      .orderBy(col("qid"), col("proj_rank"))
  }

  /** s22: MAXIMUM-INNER-PRODUCT search via the norm-augmentation
    * reduction (Bachrach et al., the Xbox/MSR trick): relevance =
    * dot(query, weight·vec) with a per-doc popularity weight (md5
    * uniform in [0.5, 2) — the corpus is unit-norm, so unscaled MIPS
    * would degenerate to cosine). Augment each candidate to
    * [x/M ; √(1−|x|²/M²)] with M = the corpus max norm (ONE global
    * max aggregate) and the query to [q ; 0]: every augmented
    * candidate has norm 1, so COSINE order in the augmented space IS
    * inner-product order — the entire cosine-ANN stack (s02 LSH, s03
    * IVF, s10 PQ…) serves MIPS unchanged after this row-local map.
    * The gate ranks top-5 by raw inner product and reports the
    * augmented-space cosine AND its rank next to it (equal by the
    * reduction — pinned by data, not asserted by code) plus the
    * augmented norm. All arithmetic restated in DuckDB in the same
    * IEEE op order.
    */
  def s22MipsReduction(spark: SparkSession, dir: String): DataFrame = {
    def dot(a: String, b: String): Column = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val e = emb(spark, dir)
    val cand = e.select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ce"))
      .withColumn("wt", lit(0.5) + lit(1.5) *
        (conv(substring(md5(concat(lit("wt:"), col("cid").cast("string"))),
          1, 8), 16, 10).cast("double") / lit(4294967296.0)))
      .withColumn("cs", expr("transform(ce, x -> x * wt)"))
      .withColumn("cnorm2", dot("cs", "cs"))
    val m = cand.agg(max(sqrt(col("cnorm2"))).as("m_norm"))
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qe"))
    val pairs = cand.crossJoin(broadcast(m))
      .join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("rel", dot("qe", "cs"))
      // augmented space: dot([q;0],[x/M;pad]) = rel/M; |aug| carries
      // the explicit pad term so the norm-1 claim is COMPUTED
      .withColumn("ratio2",
        col("cnorm2") / (col("m_norm") * col("m_norm")))
      .withColumn("aug_norm", sqrt(col("ratio2") + (lit(1.0) - col("ratio2"))))
      .withColumn("aug_cos", (col("rel") / col("m_norm")) /
        (col("aug_norm") * sqrt(dot("qe", "qe"))))
    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("cid"))
    val wAug = Window.partitionBy(col("qid"))
      .orderBy(col("aug_cos").desc, col("cid"))
    pairs
      .withColumn("rnk", row_number().over(wRel))
      .withColumn("aug_rank", row_number().over(wAug))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("wt"), 6).as("wt_r"),
        round(col("rel"), 6).as("rel_r"),
        round(col("aug_cos"), 6).as("aug_cos_r"),
        col("aug_rank"),
        round(col("aug_norm"), 6).as("aug_norm_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s22_mips_reduction" -> (s22MipsReduction _),
    "s21_random_projection" -> (s21RandomProjection _),
    "s19_index_drift" -> (s19IndexDrift _),
    "s18_index_compact" -> (s18IndexCompact _),
    "s20_ann_delete" -> (s20AnnDelete _),
    "s17_filtered_ann" -> (s17FilteredAnn _),
    "s16_sq8_search" -> (s16Sq8Search _),
    "s01_cosine_topk" -> (s01CosineTopk _),
    "s02_ann_lsh" -> (s02AnnLsh _),
    "s03_ann_ivf" -> (s03AnnIvf _),
    "s06_ann_multiprobe" -> (s06AnnMultiprobe _),
    "s07_ann_multiprobe_topk" -> (s07AnnMultiprobeTopk _),
    "s08_ann_kmeans" -> (s08AnnKmeans _),
    "s12_knn_graph" -> (s12KnnGraph _),
    "s13_ann_serve" -> (s13AnnServe _),
    "s14_ivf_pq" -> (s14IvfPq _),
    "s15_ann_append" -> (s15AnnAppend _),
    "s04_tfidf_search" -> (s04TfidfSearch _),
    "s05_vector_stats" -> (s05VectorStats _),
    "s09_ann_recall" -> (s09AnnRecall _),
    "s10_pq_codebook" -> (s10PqCodebook _),
    "s11_pq_search" -> (s11PqSearch _)
  )

  // cosine(a, b) in DuckDB list arithmetic — the same formulation the
  // native CosineSimExpr matches bit-for-bit (established by s01)
  /** s09: recall evaluation of the LSH ladder — "measure, don't
    * guess" for the ANN trade-off: per query, recall@5 of (a) the
    * single-bucket probe and (b) the s07 multi-probe against the
    * exact cosine top-5. At scale this is the harness that justifies
    * the probe budget: the exact pass runs on a sampled query set
    * (here the 10 fixed queries), never the full corpus, while the
    * candidate generation is the same bucket-equi-join the production
    * path uses. Oracle recomputes all three top-5 sets and the
    * intersection counts exactly.
    */
  def s09AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    // scoped persist: three corpus-wide passes read this table (exact
    // pairs, single-probe, multi-probe) — cache the narrow projection
    // once instead of re-running the hyperplane folds per pass;
    // released after the query's terminal action (Caches)
    val bucketed = graft.Caches.scoped(e.select(col("vec_id"), col("embedding"),
      graft.functions.Hyperplanes.bucketCol("embedding", 0, PLANES).as("bucket")))
    val q = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    def top5(pairs: DataFrame): DataFrame = pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"))
    val exact5 = top5(e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("ce"))))
    def probed5(nProbes: Int): DataFrame = {
      val flips = lit(0) +: (0 until (nProbes - 1)).map(p => lit(1 << p))
      val probes = q
        .select(col("qid"), col("qe"), explode(array(flips: _*)).as("flip"),
          col("qbucket"))
        .select(col("qid"), col("qe"),
          col("qbucket").bitwiseXOR(col("flip")).as("probe_bucket"))
      top5(bucketed
        .join(broadcast(probes),
          col("bucket") === col("probe_bucket") && col("vec_id") =!= col("qid"))
        .withColumn("sim", GraftFunctions.cosineSim(col("qe"), col("embedding")))
        .withColumnRenamed("vec_id", "cid"))
    }
    def hits(cand: DataFrame, as: String): DataFrame = exact5
      .join(cand, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as(as))
    q.select(col("qid"))
      .join(hits(probed5(1), "n_hit_single"), Seq("qid"), "left")
      .join(hits(probed5(PLANES + 1), "n_hit_mp"), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hit_single"), lit(0L)).as("n_hit_single"),
        coalesce(col("n_hit_mp"), lit(0L)).as("n_hit_mp"))
      .withColumn("recall_single", col("n_hit_single").cast("double") / 5.0)
      .withColumn("recall_mp", col("n_hit_mp").cast("double") / 5.0)
      .orderBy(col("qid"))
  }

  private[graft] def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) / " +
      s"(sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) * " +
      s"sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))))"

  /** DuckDB list literal of the K s21 projections of `vec` — the
    * SAME sign literals and left-fold order as the Spark side.
    */
  private def s21ProjSqlArr(vec: String): String =
    "[" + (0 until 16).map(p =>
      graft.functions.Hyperplanes.projSql(vec, 40, p)).mkString(", ") + "]"

  val oracles: Map[String, String] = Map(
    // s22: weights, scaled vectors, the global max norm, and both
    // rankings restated with the same IEEE op order; aug_rank must
    // equal rnk in the data (the reduction's claim), not by fiat
    "s22_mips_reduction" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve,
        |    0.5 + 1.5 * ((('0x' || substr(md5('wt:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT)::DOUBLE / 4294967296.0) AS wt
        |  FROM embeddings),
        |cand AS (
        |  SELECT vec_id AS cid, wt, list_transform(ve, x -> x * wt) AS cs FROM base),
        |c2 AS (
        |  SELECT cid, wt, cs,
        |    list_reduce(list_transform(range(1, 65), i -> cs[i] * cs[i]), (a, b) -> a + b) AS cnorm2
        |  FROM cand),
        |m AS (SELECT MAX(sqrt(cnorm2)) AS m_norm FROM c2),
        |q AS (SELECT vec_id AS qid, ve AS qe FROM base WHERE vec_id < 5),
        |pairs AS (
        |  SELECT qid, cid, wt, cnorm2, m_norm,
        |    list_reduce(list_transform(range(1, 65), i -> qe[i] * cs[i]), (a, b) -> a + b) AS rel,
        |    list_reduce(list_transform(range(1, 65), i -> qe[i] * qe[i]), (a, b) -> a + b) AS qnorm2
        |  FROM c2, q, m WHERE qid <> cid),
        |aug AS (
        |  SELECT qid, cid, wt, rel,
        |    sqrt((cnorm2 / (m_norm * m_norm)) + (1.0 - (cnorm2 / (m_norm * m_norm)))) AS aug_norm,
        |    (rel / m_norm) / (sqrt((cnorm2 / (m_norm * m_norm)) + (1.0 - (cnorm2 / (m_norm * m_norm)))) * sqrt(qnorm2)) AS aug_cos
        |  FROM pairs),
        |ranked AS (
        |  SELECT qid, cid, wt, rel, aug_cos, aug_norm,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rnk,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY aug_cos DESC, cid) AS aug_rank
        |  FROM aug)
        |SELECT qid, rnk, cid, round(wt, 6) AS wt_r, round(rel, 6) AS rel_r,
        |  round(aug_cos, 6) AS aug_cos_r, aug_rank,
        |  round(aug_norm, 6) AS aug_norm_r
        |FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // s21: projected vectors restated element-by-element with the
    // identical md5 sign literals; proj cosine over the 16-dim lists,
    // exact cosine in the s01 formulation; both ranks re-derived
    "s21_random_projection" ->
      s"""WITH p AS (
         |  SELECT vec_id, embedding, ${s21ProjSqlArr("embedding")} AS pv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, pv AS qp FROM p WHERE vec_id < 5),
         |c AS (SELECT vec_id AS cid, embedding AS ce, pv AS cp FROM p),
         |pairs AS (
         |  SELECT qid, cid,
         |    list_reduce(list_transform(range(1, 17), i -> qp[i] * cp[i]), (a, b) -> a + b) /
         |    (sqrt(list_reduce(list_transform(range(1, 17), i -> qp[i] * qp[i]), (a, b) -> a + b)) *
         |     sqrt(list_reduce(list_transform(range(1, 17), i -> cp[i] * cp[i]), (a, b) -> a + b))) AS proj_sim,
         |    list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
         |    (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE))) *
         |     sqrt(list_sum(list_transform(ce, x -> x::DOUBLE * x::DOUBLE)))) AS exact_sim
         |  FROM c, q WHERE qid <> cid),
         |ranked AS (
         |  SELECT qid, cid, proj_sim, exact_sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY proj_sim DESC, cid) AS proj_rank,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY exact_sim DESC, cid) AS exact_rank
         |  FROM pairs)
         |SELECT qid, proj_rank, cid,
         |  round(proj_sim, 6) AS proj_sim_r,
         |  round(exact_sim, 6) AS exact_sim_r,
         |  exact_rank <= 10 AS in_exact_top10
         |FROM ranked WHERE proj_rank <= 10
         |ORDER BY qid, proj_rank""".stripMargin,
    // s16: stats → floor-codes → midpoint reconstruction → SQ scan
    // top-20 → exact re-rank top-5, every arithmetic expression
    // shaped identically to the Spark side (same IEEE op order)
    "s16_sq8_search" ->
      s"""WITH dims AS (
         |  SELECT i, MIN(embedding[i]::DOUBLE) AS mn,
         |    MAX(embedding[i]::DOUBLE) AS mx
         |  FROM embeddings CROSS JOIN range(1, 65) t(i)
         |  GROUP BY i),
         |codes AS (
         |  SELECT e.vec_id, d.i,
         |    CASE WHEN d.mx = d.mn THEN 0
         |      ELSE CAST(LEAST(CAST(255 AS DOUBLE),
         |        FLOOR((e.embedding[d.i]::DOUBLE - d.mn) * 256.0
         |          / (d.mx - d.mn))) AS INT) END AS q
         |  FROM embeddings e CROSS JOIN dims d),
         |recon AS (
         |  SELECT c.vec_id,
         |    list_transform(
         |      list(d.mn + (CAST(c.q AS DOUBLE) + 0.5) * (d.mx - d.mn)
         |        / 256.0 ORDER BY c.i),
         |      v -> v::FLOAT) AS rec
         |  FROM codes c JOIN dims d ON c.i = d.i
         |  GROUP BY c.vec_id),
         |qs AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id < 10),
         |cand AS (
         |  SELECT q.qid, r.vec_id AS cid,
         |    ${cosSql("q.qe", "r.rec")} AS sq_sim
         |  FROM qs q JOIN recon r ON r.vec_id <> q.qid),
         |top AS (
         |  SELECT qid, cid, sq_sim, ROW_NUMBER() OVER (
         |    PARTITION BY qid ORDER BY sq_sim DESC, cid) AS crnk
         |  FROM cand),
         |exact AS (
         |  SELECT t.qid, t.cid, t.sq_sim,
         |    ${cosSql("qe.embedding", "ce.embedding")} AS sim
         |  FROM top t
         |  JOIN embeddings qe ON qe.vec_id = t.qid
         |  JOIN embeddings ce ON ce.vec_id = t.cid
         |  WHERE t.crnk <= 20),
         |ranked AS (
         |  SELECT qid, cid, sq_sim, sim, ROW_NUMBER() OVER (
         |    PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM exact)
         |SELECT qid, rnk, cid, round(sq_sim, 6) AS sq_sim_r,
         |  round(sim, 6) AS sim_r
         |FROM ranked WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    // s09: the same three top-5 sets (exact / own-bucket / multiprobe)
    // and intersection counts, on the shared md5 hyperplane buckets
    "s09_ann_recall" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding,
         |    (${graft.functions.Hyperplanes.bucketSql("embedding", 0, PLANES)}) AS bucket
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
         |  FROM bucketed WHERE vec_id < 10),
         |hits_all AS (
         |  SELECT q.qid, b.vec_id AS cid,
         |    ${cosSql("q.qe", "b.embedding")} AS sim
         |  FROM bucketed b CROSS JOIN q WHERE b.vec_id <> q.qid),
         |exact5 AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rnk FROM hits_all) WHERE rnk <= 5),
         |probes AS (
         |  SELECT qid, qe, xor(qbucket, flip) AS probe_bucket
         |  FROM q CROSS JOIN (
         |    SELECT unnest([${(0 +: (0 until PLANES).map(1 << _).toList).mkString(", ")}]) AS flip)),
         |hits_mp AS (
         |  SELECT p.qid, b.vec_id AS cid,
         |    ${cosSql("p.qe", "b.embedding")} AS sim
         |  FROM bucketed b JOIN probes p
         |    ON b.bucket = p.probe_bucket AND b.vec_id <> p.qid),
         |mp5 AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rnk FROM hits_mp) WHERE rnk <= 5),
         |hits_single AS (
         |  SELECT q.qid, b.vec_id AS cid,
         |    ${cosSql("q.qe", "b.embedding")} AS sim
         |  FROM bucketed b JOIN q
         |    ON b.bucket = q.qbucket AND b.vec_id <> q.qid),
         |single5 AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rnk FROM hits_single) WHERE rnk <= 5),
         |hs AS (
         |  SELECT e.qid, COUNT(*) AS n FROM exact5 e
         |  JOIN single5 s ON e.qid = s.qid AND e.cid = s.cid GROUP BY 1),
         |hm AS (
         |  SELECT e.qid, COUNT(*) AS n FROM exact5 e
         |  JOIN mp5 m ON e.qid = m.qid AND e.cid = m.cid GROUP BY 1)
         |SELECT q.qid,
         |  COALESCE(hs.n, 0) AS n_hit_single,
         |  COALESCE(hm.n, 0) AS n_hit_mp,
         |  CAST(COALESCE(hs.n, 0) AS DOUBLE) / 5.0 AS recall_single,
         |  CAST(COALESCE(hm.n, 0) AS DOUBLE) / 5.0 AS recall_mp
         |FROM q LEFT JOIN hs ON q.qid = hs.qid
         |LEFT JOIN hm ON q.qid = hm.qid
         |ORDER BY q.qid""".stripMargin,
    // s08: the full 2-iteration Lloyd pipeline mirrored — md5-seeded
    // init, cosine argmax assignment, FLOAT-cast mean centroids.
    // s10/s11: codebooks, codes and distances reproduced bit-for-bit —
    // same seeds, same fixed-order L2 fold, same decimal sums
    // s14: both model chains in ONE statement — kmeans CTEs (a2 =
    // cell assignments) + s13's centroid restatement + the probe,
    // then the PQ chain under a pq_ prefix + s11's ADC, restricted
    // to the probed-cell candidates
    "s14_ivf_pq" ->
      s"""WITH ${kmeansSqlCtes()},
         |flat2 AS (
         |  SELECT cell_id, i, a2.embedding[i]::DOUBLE AS x
         |  FROM a2 CROSS JOIN range(1, 65) t(i)),
         |cm2 AS (
         |  SELECT cell_id, i,
         |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
         |  FROM flat2 GROUP BY 1, 2),
         |cent2 AS (
         |  SELECT cell_id,
         |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
         |  FROM cm2 GROUP BY cell_id),
         |probes AS (
         |  SELECT qid, cell_id FROM (
         |    SELECT q.vec_id AS qid, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosSql("q.embedding", "c.centroid")} DESC, c.cell_id)
         |        AS probe_rank
         |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
         |    CROSS JOIN cent2 c) WHERE probe_rank <= 2),
         |cand AS (
         |  SELECT p.qid, d.vec_id, d.cell_id
         |  FROM probes p JOIN a2 d
         |    ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |${pqSqlCtes("pq_")},
         |qtab AS (
         |  SELECT u.vec_id AS qid, u.sp, c.code,
         |    round(list_sum(list_transform(range(1, ${PQ_SUBDIM + 1}),
         |      i -> (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE) *
         |           (u.sub[i]::DOUBLE - c.cent[i]::DOUBLE))), 6) AS qd2
         |  FROM pq_subs u JOIN pq_cent1 c ON u.sp = c.sp
         |  WHERE u.vec_id < 10),
         |adc AS (
         |  SELECT cd.qid, cd.vec_id, cd.cell_id,
         |    SUM(CAST(t.qd2 AS DECIMAL(18,6))) AS adcsum
         |  FROM cand cd
         |  JOIN pq_a2 a ON a.vec_id = cd.vec_id
         |  JOIN qtab t ON t.qid = cd.qid AND t.sp = a.sp AND t.code = a.code
         |  GROUP BY 1, 2, 3)
         |SELECT qid,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adcsum, vec_id) AS rnk,
         |  vec_id AS cid, cell_id, CAST(adcsum AS DOUBLE) AS adc_dist
         |FROM adc
         |QUALIFY rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "s10_pq_codebook" ->
      s"""WITH ${pqSqlCtes()}
         |SELECT sp, code, COUNT(*) AS n_vectors,
         |  CAST(SUM(CAST(round(d2, 6) AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_sqdist
         |FROM a2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s11_pq_search" ->
      s"""WITH ${pqSqlCtes()},
         |qsubs AS (SELECT vec_id AS qid, sp, sub FROM subs WHERE vec_id < 10),
         |qtab AS (
         |  SELECT q.qid, q.sp, c.code,
         |    round(list_sum(list_transform(range(1, ${PQ_SUBDIM + 1}),
         |      i -> (q.sub[i]::DOUBLE - c.cent[i]::DOUBLE) *
         |           (q.sub[i]::DOUBLE - c.cent[i]::DOUBLE))), 6) AS qd2
         |  FROM qsubs q JOIN cent1 c ON q.sp = c.sp),
         |adc AS (
         |  SELECT t.qid, a.vec_id AS cid,
         |    SUM(CAST(t.qd2 AS DECIMAL(18,6))) AS adcsum
         |  FROM a2 a JOIN qtab t ON a.sp = t.sp AND a.code = t.code
         |  WHERE a.vec_id <> t.qid
         |  GROUP BY 1, 2)
         |SELECT qid,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adcsum, cid) AS rnk,
         |  cid, CAST(adcsum AS DOUBLE) AS adc_dist
         |FROM adc
         |QUALIFY rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "s08_ann_kmeans" ->
      s"""WITH ${kmeansSqlCtes()}
         |SELECT cell_id, COUNT(*) AS n_vectors,
         |  CAST(SUM(CAST(round(sim, 6) AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_sim
         |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,
    // s13: the whole index lifecycle rebuilt in SQL — final-assignment
    // centroids (decimal-exact means cast FLOAT), nprobe=2 probe,
    // in-probed-cell exact top-5; bit-level check of build AND serve
    // s17: s13's chain with the label joined into the postings and
    // the same-label predicate applied in-cell before the top-5;
    // nprobe=3
    "s17_filtered_ann" ->
      s"""WITH ${kmeansSqlCtes()},
         |flat2 AS (
         |  SELECT cell_id, i, a2.embedding[i]::DOUBLE AS x
         |  FROM a2 CROSS JOIN range(1, 65) t(i)),
         |cm2 AS (
         |  SELECT cell_id, i,
         |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
         |  FROM flat2 GROUP BY 1, 2),
         |cent2 AS (
         |  SELECT cell_id,
         |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
         |  FROM cm2 GROUP BY cell_id),
         |al AS (
         |  SELECT a2.vec_id, a2.embedding, a2.cell_id, e.label
         |  FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id),
         |probes AS (
         |  SELECT qid, qlabel, cell_id FROM (
         |    SELECT q.vec_id AS qid, q.label AS qlabel, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosSql("q.embedding", "c.centroid")} DESC, c.cell_id)
         |        AS probe_rank
         |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
         |    CROSS JOIN cent2 c) WHERE probe_rank <= 3),
         |hits AS (
         |  SELECT p.qid, d.vec_id AS cid, d.label, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN al d ON d.cell_id = p.cell_id
         |    AND d.label = p.qlabel AND d.vec_id <> p.qid),
         |served AS (
         |  SELECT qid, cid, label, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM hits)
         |SELECT qid, rnk, cid, label, cell_id, round(sim, 6) AS sim_r
         |FROM served WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "s13_ann_serve" ->
      s"""WITH ${kmeansSqlCtes()},
         |flat2 AS (
         |  SELECT cell_id, i, a2.embedding[i]::DOUBLE AS x
         |  FROM a2 CROSS JOIN range(1, 65) t(i)),
         |cm2 AS (
         |  SELECT cell_id, i,
         |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
         |  FROM flat2 GROUP BY 1, 2),
         |cent2 AS (
         |  SELECT cell_id,
         |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
         |  FROM cm2 GROUP BY cell_id),
         |probes AS (
         |  SELECT qid, cell_id FROM (
         |    SELECT q.vec_id AS qid, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosSql("q.embedding", "c.centroid")} DESC, c.cell_id)
         |        AS probe_rank
         |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
         |    CROSS JOIN cent2 c) WHERE probe_rank <= 2),
         |hits AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN a2 d ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |served AS (
         |  SELECT qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM hits)
         |SELECT qid, rnk, cid, cell_id, round(sim, 6) AS sim_r
         |FROM served WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    // s20: both serve phases re-run the full k-means serve chain —
    // the post phase excludes the tombstoned ids from the CANDIDATES
    // (ranks re-close over survivors); the three lifecycle
    // invariants (replay no-op, compaction serve-invariant,
    // tombstones cleared) are engine-computed and pinned TRUE
    "s20_ann_delete" ->
      s"""WITH ${kmeansSqlCtes()},
         |flat2 AS (
         |  SELECT cell_id, i, a2.embedding[i]::DOUBLE AS x
         |  FROM a2 CROSS JOIN range(1, 65) t(i)),
         |cm2 AS (
         |  SELECT cell_id, i,
         |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
         |  FROM flat2 GROUP BY 1, 2),
         |cent2 AS (
         |  SELECT cell_id,
         |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
         |  FROM cm2 GROUP BY cell_id),
         |probes AS (
         |  SELECT qid, cell_id FROM (
         |    SELECT q.vec_id AS qid, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosSql("q.embedding", "c.centroid")} DESC, c.cell_id)
         |        AS probe_rank
         |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
         |    CROSS JOIN cent2 c) WHERE probe_rank <= 2),
         |hits_pre AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN a2 d ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |hits_post AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN a2 d ON d.cell_id = p.cell_id AND d.vec_id <> p.qid
         |  WHERE d.vec_id % 7 <> 3),
         |served AS (
         |  SELECT 'a_pre' AS phase, qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM hits_pre
         |  UNION ALL
         |  SELECT 'b_post', qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
         |  FROM hits_post)
         |SELECT phase, qid, rnk, cid, cell_id, round(sim, 6) AS sim_r,
         |  TRUE AS replay_noop, TRUE AS compact_matches,
         |  TRUE AS tombstones_cleared
         |FROM served WHERE rnk <= 5
         |ORDER BY phase, qid, rnk""".stripMargin,
    // s19: per-cell base/appended counts restate from the frozen-
    // assignment chain; skew and the 1.5-threshold flag from the
    // same totals
    "s19_index_drift" ->
      s"""WITH $annAppendSqlCtes,
         |basec AS (SELECT cell_id, COUNT(*) AS n_base FROM a2 GROUP BY 1),
         |newc AS (SELECT cell_id, COUNT(*) AS n_new FROM newasn GROUP BY 1),
         |per AS (
         |  SELECT b.cell_id, b.n_base,
         |    COALESCE(n.n_new, 0) AS n_new,
         |    b.n_base + COALESCE(n.n_new, 0) AS n_total
         |  FROM basec b LEFT JOIN newc n ON b.cell_id = n.cell_id),
         |sk AS (
         |  SELECT ROUND(CAST(MAX(n_total) AS DOUBLE) /
         |    (CAST(SUM(n_total) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
         |    AS skew
         |  FROM per)
         |SELECT cell_id, n_base, n_new, n_total,
         |  ROUND(CAST(n_new AS DOUBLE) / CAST(n_base AS DOUBLE), 6)
         |    AS growth_r,
         |  skew, skew > 1.5 AS retrain_recommended
         |FROM per CROSS JOIN sk
         |ORDER BY cell_id""".stripMargin,
    // s18: per-cell vector counts restate from the frozen-quantizer
    // chain's post-append corpus; one-file-per-cell, serve
    // invariance and non-vacuousness are pinned by construction
    "s18_index_compact" ->
      s"""WITH $annAppendSqlCtes
         |SELECT cell_id, COUNT(*) AS n_vectors,
         |  CAST(1 AS BIGINT) AS n_files,
         |  TRUE AS serve_matches, TRUE AS files_shrank
         |FROM post_corpus GROUP BY cell_id ORDER BY cell_id""".stripMargin,
    // s15: the k-means chain trains on the SAME 80% base (src CTE),
    // the stored centroids restate decimal-exactly, the holdout
    // batch assigns to them frozen, and BOTH serve phases rank
    // bit-for-bit — probes shared, candidates grown by the append
    "s15_ann_append" ->
      s"""WITH $annAppendSqlCtes,
         |hits_pre AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN a2 d ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |hits_post AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN post_corpus d
         |    ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |served AS (
         |  SELECT 'pre' AS phase, qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM hits_pre
         |  UNION ALL
         |  SELECT 'post', qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
         |  FROM hits_post)
         |SELECT phase, qid, rnk, cid, cell_id, round(sim, 6) AS sim_r
         |FROM served WHERE rnk <= 5
         |ORDER BY phase DESC, qid, rnk""".stripMargin,
    // s12: the same cells, the same in-cell all-pairs ranking — edge
    // list equality is a full bit-level check of the graph build
    "s12_knn_graph" ->
      s"""WITH ${kmeansSqlCtes()},
         |knn_pairs AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS cid,
         |    ${cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM a2 q JOIN a2 d
         |    ON q.cell_id = d.cell_id AND d.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT qid, cid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM knn_pairs)
         |SELECT qid, rnk, cid, round(sim, 6) AS sim_r
         |FROM ranked WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin,
    // s02: DuckDB recomputes the SAME md5-derived hyperplane buckets
    // (identical sign literals, identical sequential fold) — exact
    // hash check of the ANN bucket path.
    "s02_ann_lsh" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, label,
         |    (${graft.functions.Hyperplanes.bucketSql("embedding", 0, PLANES)}) AS bucket
         |  FROM embeddings),
         |sizes AS (
         |  SELECT bucket, COUNT(*) AS bucket_size FROM bucketed GROUP BY bucket)
         |SELECT b.vec_id, b.label, b.bucket, s.bucket_size,
         |  s.bucket_size - 1 AS n_candidates
         |FROM bucketed b JOIN sizes s USING (bucket)
         |ORDER BY b.vec_id""".stripMargin,
    "s06_ann_multiprobe" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, label,
         |    (${graft.functions.Hyperplanes.bucketSql("embedding", 0, PLANES)}) AS bucket
         |  FROM embeddings),
         |sizes AS (
         |  SELECT bucket, COUNT(*) AS bucket_size FROM bucketed GROUP BY bucket),
         |total AS (SELECT COUNT(*) AS n_total FROM bucketed),
         |probes AS (
         |  SELECT vec_id, bucket, xor(bucket, flip) AS probe_bucket
         |  FROM bucketed CROSS JOIN (
         |    SELECT unnest([${(0 +: (0 until PLANES).map(1 << _).toList).mkString(", ")}]) AS flip)),
         |scanned AS (
         |  SELECT p.vec_id, p.bucket,
         |    CAST(SUM(COALESCE(s.bucket_size, 0)) AS BIGINT) AS n_scanned
         |  FROM probes p LEFT JOIN sizes s ON p.probe_bucket = s.bucket
         |  GROUP BY p.vec_id, p.bucket)
         |SELECT b.vec_id, b.label, sc.bucket,
         |  sz.bucket_size - 1 AS n_candidates,
         |  sc.n_scanned - 1 AS n_candidates_mp,
         |  CAST(sc.n_scanned AS DOUBLE)/CAST(t.n_total AS DOUBLE) AS scan_frac
         |FROM scanned sc
         |JOIN sizes sz ON sc.bucket = sz.bucket
         |JOIN bucketed b ON sc.vec_id = b.vec_id
         |CROSS JOIN total t
         |ORDER BY b.vec_id""".stripMargin,
    "s07_ann_multiprobe_topk" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, label, embedding,
         |    (${graft.functions.Hyperplanes.bucketSql("embedding", 0, PLANES)}) AS bucket
         |  FROM embeddings),
         |probes AS (
         |  SELECT vec_id AS qid, embedding AS qe, xor(bucket, flip) AS probe_bucket
         |  FROM bucketed CROSS JOIN (
         |    SELECT unnest([${(0 +: (0 until PLANES).map(1 << _).toList).mkString(", ")}]) AS flip)
         |  WHERE vec_id < 10),
         |hits AS (
         |  SELECT p.qid, b.vec_id AS cid, b.label,
         |    list_sum(list_transform(range(1, len(p.qe)+1),
         |      i -> p.qe[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
         |    (sqrt(list_sum(list_transform(p.qe, x -> x::DOUBLE * x::DOUBLE))) *
         |     sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS sim
         |  FROM bucketed b JOIN probes p
         |    ON b.bucket = p.probe_bucket AND b.vec_id <> p.qid)
         |SELECT qid,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk,
         |  cid, label, round(sim, 6) AS sim_r
         |FROM hits
         |QUALIFY rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    // s03: full IVF pipeline mirrored — per-dimension mean centroids
    // (cast to FLOAT, same as the Spark side), nearest-centroid probe,
    // exact cosine inside the probed cell only.
    "s03_ann_ivf" ->
      """WITH flat AS (
        |  SELECT label, i, embedding[i]::DOUBLE AS x
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |cmeans AS (
        |  SELECT label, i,
        |    CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE)/COUNT(*) AS cx
        |  FROM flat GROUP BY label, i),
        |centroids AS (
        |  SELECT label AS c_label,
        |    list_transform(list(cx ORDER BY i), c -> c::FLOAT) AS centroid
        |  FROM cmeans GROUP BY label),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, q.qe, c.c_label,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
        |      (list_sum(list_transform(range(1, len(q.qe)+1),
        |         i -> q.qe[i]::DOUBLE * c.centroid[i]::DOUBLE)) /
        |       (sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE))) *
        |        sqrt(list_sum(list_transform(c.centroid, x -> x::DOUBLE * x::DOUBLE))))) DESC,
        |      c.c_label) AS rn
        |  FROM q CROSS JOIN centroids c),
        |probe AS (
        |  SELECT qid, qe, c_label AS probe_label FROM scored WHERE rn = 1),
        |hits AS (
        |  SELECT p.qid, e.vec_id AS cid, p.probe_label,
        |    list_sum(list_transform(range(1, len(p.qe)+1),
        |      i -> p.qe[i]::DOUBLE * e.embedding[i]::DOUBLE)) /
        |    (sqrt(list_sum(list_transform(p.qe, x -> x::DOUBLE * x::DOUBLE))) *
        |     sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS sim
        |  FROM probe p JOIN embeddings e
        |    ON e.label = p.probe_label AND e.vec_id <> p.qid)
        |SELECT qid,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk,
        |  cid, probe_label, round(sim, 6) AS sim_r
        |FROM hits
        |QUALIFY rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "s05_vector_stats" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(len(list_filter(embedding, x -> x < 0)) AS BIGINT) AS n_neg,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm_r,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        |    / len(embedding), 6) AS mean_r,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "s04_tfidf_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id,
        |    COUNT(CASE WHEN token = 'vector' THEN 1 END) AS tf_vector,
        |    COUNT(CASE WHEN token = 'filter' THEN 1 END) AS tf_filter,
        |    COUNT(CASE WHEN token = 'merge' THEN 1 END) AS tf_merge
        |  FROM toks GROUP BY doc_id),
        |dfs AS (
        |  SELECT
        |    COUNT(DISTINCT CASE WHEN token = 'vector' THEN doc_id END) AS df_vector,
        |    COUNT(DISTINCT CASE WHEN token = 'filter' THEN doc_id END) AS df_filter,
        |    COUNT(DISTINCT CASE WHEN token = 'merge' THEN doc_id END) AS df_merge
        |  FROM toks),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf_vector, tf_filter, tf_merge,
        |    CAST(tf_vector AS DOUBLE) * round(ln(CAST(n_docs AS DOUBLE)/CAST(df_vector AS DOUBLE)), 9)
        |    + CAST(tf_filter AS DOUBLE) * round(ln(CAST(n_docs AS DOUBLE)/CAST(df_filter AS DOUBLE)), 9)
        |    + CAST(tf_merge AS DOUBLE) * round(ln(CAST(n_docs AS DOUBLE)/CAST(df_merge AS DOUBLE)), 9) AS score
        |  FROM tf, dfs, n)
        |SELECT * FROM scored WHERE score > 0.0
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin,
    "s01_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, embedding AS ce, label FROM embeddings),
        |pairs AS (
        |  SELECT qid, cid, label,
        |    list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
        |    (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE))) *
        |     sqrt(list_sum(list_transform(ce, x -> x::DOUBLE * x::DOUBLE)))) AS sim
        |  FROM c, q WHERE qid <> cid)
        |SELECT qid,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk,
        |  cid, label, round(sim, 6) AS sim_r
        |FROM pairs
        |QUALIFY rnk <= 10
        |ORDER BY qid, rnk""".stripMargin
  )
}
