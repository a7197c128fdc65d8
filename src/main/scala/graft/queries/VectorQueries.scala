package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * q_embed_cosine — brute-force cosine top-k for a small query set: the
  * query side is broadcast, the corpus side streams once; dot products
  * use the native codegen'd `vec_dot` expression
  * (graft.functions.DotProduct) — no UDFs, no interpreted lambdas.
  *
  * q_embed_ann — the scale path: random-hyperplane LSH. Each vector
  * hashes to one bucket per hash table; candidates are same-bucket
  * equality-join matches (hash join, never a cartesian), then exact
  * cosine re-ranking on the candidate set only. NOTE: single-probe is
  * the census BASELINE, not the recommended default — q_embed_ann_mp
  * probes the same index multi-probe for 9× the recall at zero index
  * cost, and the full family × recall × cost decision table lives in
  * PLANS.md §"ANN index family decision table" (short form: pq for
  * recall ≥0.9 when an ADC code scan is affordable, ivfpq when the
  * corpus must be pruned before per-pair work, lsh_mp for
  * continuous-ingest index maintenance).
  *
  * q_embed_dup — embedding near-duplicate pairs corpus-wide: same LSH
  * buckets self-joined, exact cosine >= threshold on candidates.
  *
  * For the LSH operators the DuckDB oracle re-verifies the *candidate
  * pairs* (written to a side parquet) exactly — the bucketing is
  * seed-specific, the cosine math is engine-independent.
  */
object VectorQueries {

  import CoreQueries.Q

  /** The (label, dim) drift grid — conditional e6-unit sums for the
    * ref (even vec_id) and cur windows in ONE aggregate pass. Shared
    * by q_embed_drift and its streaming twin: the twin writes THIS
    * relation per batch and folds the four sum columns by SUM (all
    * linear), so the folded grid is bit-identical to the batch one. */
  private[graft] def embDriftGrid(emb: DataFrame): DataFrame =
    emb.select(col("label"), (col("vec_id") % 2 === 0).as("is_ref"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("ve6",
        round(col("v").cast("double") * 1000000).cast("long"))
      .groupBy("label", "dim")
      .agg(sum(when(col("is_ref"), col("ve6")).otherwise(0L)).as("sr"),
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
        sum(when(!col("is_ref"), col("ve6")).otherwise(0L)).as("sc"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"))

  /** Per-label drift census from the (label, dim) grid (fixed-point
    * floor-division means, L1 + worst-dimension deltas). */
  private[graft] def embDriftReport(g: DataFrame): DataFrame =
    // Drift is undefined where a window is empty: a single-parity
    // label would otherwise divide by zero (NaN → 0L cast in Spark,
    // a CAST error in DuckDB). Both engines drop those cells.
    g.filter(col("nr") > 0 && col("nc") > 0)
      .select(col("label"), col("nr"), col("nc"),
        floor(col("sr").cast("double") / col("nr")).cast("long").as("mr"),
        floor(col("sc").cast("double") / col("nc")).cast("long").as("mc"))
      .groupBy("label")
      .agg(max("nr").as("n_ref"), max("nc").as("n_cur"),
        sum(abs(col("mr") - col("mc"))).as("drift_l1_e6"),
        max(abs(col("mr") - col("mc"))).as("max_dim_delta_e6"))
      .orderBy("label")

  /** Shared oracle of q_embed_drift and q_stream_embed_drift. */
  private[graft] val EmbDriftOracle: String =
    """WITH x AS (
      |  SELECT label, vec_id % 2 = 0 AS is_ref,
      |    CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
      |    unnest(embedding) AS v
      |  FROM embeddings),
      |g AS (
      |  SELECT label, dim,
      |    CAST(sum(CASE WHEN is_ref THEN
      |      CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS sr,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nr,
      |    CAST(sum(CASE WHEN NOT is_ref THEN
      |      CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS sc,
      |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nc
      |  FROM x GROUP BY label, dim),
      |m AS (
      |  SELECT label, dim, nr, nc,
      |    CAST(floor(CAST(sr AS DOUBLE) / nr) AS BIGINT) AS mr,
      |    CAST(floor(CAST(sc AS DOUBLE) / nc) AS BIGINT) AS mc
      |  FROM g WHERE nr > 0 AND nc > 0)
      |SELECT label, CAST(max(nr) AS BIGINT) AS n_ref,
      |  CAST(max(nc) AS BIGINT) AS n_cur,
      |  CAST(sum(abs(mr - mc)) AS BIGINT) AS drift_l1_e6,
      |  CAST(max(abs(mr - mc)) AS BIGINT) AS max_dim_delta_e6
      |FROM m GROUP BY label ORDER BY label""".stripMargin

  private val K = 5
  private val NQ = 5 // query vectors: vec_id < NQ
  private val DupThreshold = 0.45

  private val CoresetK = 8

  /** q_sample_coreset's oracle: the k-center greedy chain unrolled to
    * CoresetK levels, GENERATED from the same k as the Spark loop so
    * the two can never drift on depth (the kcore short-unroll lesson).
    * Each level folds the newest pick into the running min-distance
    * and selects the farthest remaining point (ties to smaller id). */
  private[graft] val CoresetOracle: String = {
    def d2(a: String, b: String) =
      s"CAST(list_inner_product($a, $a) + list_inner_product($b, $b)" +
        s" - 2 * list_inner_product($a, $b) AS BIGINT)"
    def selIds(upTo: Int) =
      (Seq("SELECT vec_id FROM s0") ++
        (1 to upTo).map(i => s"SELECT vec_id FROM p$i"))
        .mkString(" UNION ALL ")
    val sb = new StringBuilder
    sb.append("WITH w AS (SELECT vec_id, list_transform(embedding, " +
      "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v " +
      "FROM embeddings),\n")
    sb.append("s0 AS (SELECT vec_id, v FROM w ORDER BY vec_id LIMIT 1),\n")
    sb.append(s"l1 AS MATERIALIZED (SELECT w.vec_id, w.v, " +
      s"${d2("w.v", "s.v")} AS dmin FROM w, s0 s),\n")
    for (i <- 1 until CoresetK) {
      sb.append(s"p$i AS MATERIALIZED (SELECT vec_id, v, dmin FROM l$i WHERE " +
        s"vec_id NOT IN (${selIds(i - 1)}) " +
        "ORDER BY dmin DESC, vec_id LIMIT 1),\n")
      sb.append(s"l${i + 1} AS MATERIALIZED (SELECT l.vec_id, l.v, least(l.dmin, " +
        s"${d2("l.v", "p.v")}) AS dmin FROM l$i l, p$i p),\n")
    }
    sb.append("sels AS (SELECT CAST(0 AS BIGINT) AS sel_order, " +
      "vec_id, CAST(0 AS BIGINT) AS d2 FROM s0")
    for (i <- 1 until CoresetK)
      sb.append(s" UNION ALL SELECT $i, vec_id, dmin FROM p$i")
    sb.append("),\n")
    sb.append(s"r AS (SELECT max(dmin) AS radius FROM l$CoresetK " +
      s"WHERE vec_id NOT IN (${selIds(CoresetK - 1)}))\n")
    sb.append("SELECT CAST(sel_order AS BIGINT) AS sel_order, vec_id, " +
      "CAST(d2 AS BIGINT) AS d2_at_selection, " +
      "CAST(r.radius AS BIGINT) AS radius FROM sels, r " +
      "ORDER BY sel_order")
    sb.toString
  }

  /** embeddings with double-cast vector and L2 norm (codegen'd dot). */
  private def emb(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    t(s, d, "embeddings").select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  private def rankTopK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(col("cosraw").desc, col("nid"))
    pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("nid"), round(col("cosraw"), 6).as("cosine"),
        col("rn"))
      .orderBy("qid", "rn")
  }

  /** Exact cosine for (qid, nid) pairs; pairsDf must have qid/nid cols. */
  private def cosineFor(s: SparkSession, d: String, pairs: DataFrame): DataFrame = {
    val e = emb(s, d)
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("nid"), col("v"), col("nrm"))
    pairs.join(broadcast(q), "qid").join(c, "nid")
      .withColumn("cosraw", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      .select("qid", "nid", "cosraw")
  }

  /** Oracle: exact cosine + top-k over an explicit (qid, nid) pair set. */
  private def rankSql(pairSource: String): String =
    s"""WITH pairs AS ($pairSource),
       |e AS (SELECT vec_id, unnest(embedding) AS x,
       |        generate_subscripts(embedding, 1) AS pos FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
       |          FROM e GROUP BY vec_id),
       |dots AS (
       |  SELECT p.qid, p.nid, sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
       |  FROM pairs p
       |  JOIN e a ON a.vec_id = p.qid
       |  JOIN e b ON b.vec_id = p.nid AND b.pos = a.pos
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT d.qid, d.nid,
       |    d.dot / (nq.nrm * nc.nrm) AS cosraw,
       |    row_number() OVER (PARTITION BY d.qid
       |      ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.nid) AS rn
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nc ON nc.vec_id = d.nid)
       |SELECT qid, nid, round(cosraw, 6) AS cosine, CAST(rn AS INT) AS rn
       |FROM ranked WHERE rn <= $K ORDER BY qid, rn""".stripMargin

  // ---- LSH planes: deterministic pseudo-gaussian hyperplanes ----------
  private val numTables = 2
  private val dim = 64

  /** Scale bucket-bits with the corpus: 2^bits buckets per table sized
    * so the expected bucket holds ~`targetBucket` vectors. A constant
    * bit width saturates as N grows and same-bucket pair counts go
    * O(N²/buckets) — quadratic; bits ≈ log₂(N) − log₂(targetBucket)
    * keeps expected per-bucket work constant at any corpus size.
    * Clamped to [6, 24] (below 6 bits LSH prunes nothing; 24 bits =
    * 16M buckets per table is enough for ~10⁹ vectors at bucket 64). */
  private[graft] def bitsFor(n: Long, targetBucket: Int = 16): Int = {
    val needed = math.ceil(
      math.log(math.max(n.toDouble / targetBucket, 1.0)) / math.log(2.0)).toInt
    math.min(24, math.max(6, needed))
  }

  private def planesFor(bits: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(numTables, bits, dim)(rnd.nextGaussian())
  }

  /** (vec_id, tbl, bkt): one bucket per vector per hash table. The
    * planes ride as a broadcast (numTables×bits)-row DataFrame joined
    * against the corpus — one small vec_dot per (vector, plane) row —
    * rather than inlined 64-literal expressions, whose generated code is
    * enormous (whole-stage codegen compile time dominated the query).
    * The bucket value is the plane-sign bit vector: sum of 2^j over
    * planes with dot >= 0. */
  private def withBuckets(e: DataFrame, bits: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val planes = planesFor(bits)
    val planeRows = for {
      t0 <- 0 until numTables
      j <- 0 until bits
    } yield (t0, 1L << j, planes(t0)(j).toSeq)
    val planesDf = planeRows.toDF("tbl", "w", "plane")
    e.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(planesDf))
      .withColumn("dot", expr("vec_dot(v, plane)"))
      .groupBy("vec_id", "tbl")
      .agg(sum(when(col("dot") >= 0, col("w")).otherwise(lit(0L))).as("bkt"))
  }

  /** Skew guard for bucket self-joins: deterministically keep the first
    * `cap` members (by vec_id) of each (tbl, bkt) bucket, so a
    * degenerate bucket (all-identical embeddings, adversarial inputs)
    * contributes at most cap·(cap−1)/2 pairs instead of O(size²). Pure
    * transform — spill accounting lives in the caller, which derives
    * the dropped-member count from the capped cardinality instead of a
    * second pass over the ranked relation. */
  private[graft] val MaxBucket = 256
  private[graft] def capBuckets(buckets: DataFrame,
      cap: Int = MaxBucket): DataFrame = {
    val w = Window.partitionBy("tbl", "bkt").orderBy("vec_id")
    buckets.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap).drop("rk")
  }

  /** Corpus row count from the raw parquet (metadata-only fast path —
    * counting the projected/normalized relation would evaluate every
    * vec_dot just to size the bucket space). */
  private def corpusRows(s: SparkSession, d: String): Long =
    t(s, d, "embeddings").count()

  /** Compute buckets once (persisted), run `body` over them, drop the
    * cache before returning — both LSH candidate generators scan the
    * bucket relation from 2-3 sides. */
  private def withBucketCache[A](buckets: DataFrame)(
      body: DataFrame => A): A = {
    val cached = buckets.persist()
    try body(cached)
    finally cached.unpersist(blocking = true)
  }

  /** Candidate side-files exist solely so the DuckDB oracle can
    * re-rank the EXACT candidate set Spark generated — the driver only
    * reads them at the verify SF; at any other scale the lazy candidate
    * plan feeds the exact re-rank directly (the scoped caches under it
    * stay warm until the result materializes). */
  private def maybeSideFile(s: SparkSession, d: String, cand: DataFrame,
      path: String): DataFrame =
    if (graft.Tables.dirTag(d) ==
        graft.Tables.dirTag(graft.Tables.VerifySfDir)) {
      cand.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    } else cand

  /** Eager result materialization INSIDE the cache scope — handing a
    * lazy plan past the unpersist would replay the bucket lineage
    * uncached. Callers re-apply their ORDER BY after read-back. */
  private def materialized(s: SparkSession, df: DataFrame,
      path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  private def annCandPlan(buckets: DataFrame): DataFrame = {
    val q = buckets.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
    val c = buckets.select(col("vec_id").as("nid"), col("tbl"), col("bkt"))
    broadcast(q).join(c, Seq("tbl", "bkt"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
  }

  /** Multi-probe count: per (query, table), flip the sign bit of the
    * MProbe planes the vector sits CLOSEST to (smallest |dot| margin) —
    * the classic multi-probe LSH sequence (Lv et al., VLDB'07). The
    * single-probe census at sf0.01 measured lsh recall@5 = 4%: a
    * near-plane vector's true neighbors fall on the other side of that
    * plane with probability ~1/2, and single-probe never looks there.
    * Probing T·(1+m) buckets per QUERY buys the recall of T·(1+m) hash
    * tables without growing the index — the corpus side keeps one
    * bucket per vector per table, so the 100 TB index build/storage
    * cost is unchanged; only the (bounded) query side fans out.
    * Measured at sf0.01 (q_ann_recall census): m=4 → 24%, m=8 → 36% —
    * diminishing returns past that because single-bit flips exhaust
    * the near planes (deeper probe sequences need multi-bit combos);
    * 8 keeps the per-query fan-out trivial (T·9 bucket lookups). */
  private[graft] val MProbe = 8

  /** Query-side probe buckets: the base bucket plus `mProbe`
    * nearest-plane flips per (vector, table). Same broadcast-planes
    * join as [[withBuckets]]; the flip masks come from sorting the
    * per-plane |margin| (ties broken by plane weight — deterministic,
    * so the census NUMBER hashes cross-engine). */
  private def withProbes(q0: DataFrame, bits: Int,
      mProbe: Int): DataFrame = {
    val spark = q0.sparkSession
    import spark.implicits._
    val planes = planesFor(bits)
    val planeRows = for {
      t0 <- 0 until numTables
      j <- 0 until bits
    } yield (t0, 1L << j, planes(t0)(j).toSeq)
    val planesDf = planeRows.toDF("tbl", "w", "plane")
    q0.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(planesDf))
      .withColumn("dot", expr("vec_dot(v, plane)"))
      .groupBy("vec_id", "tbl")
      .agg(
        sum(when(col("dot") >= 0, col("w")).otherwise(lit(0L))).as("bkt"),
        expr(s"transform(slice(array_sort(collect_list(" +
          s"struct(abs(dot) AS m, w))), 1, $mProbe), x -> x.w)")
          .as("flips"))
      .select(col("vec_id"), col("tbl"), col("bkt"),
        explode(concat(array(lit(0L)), col("flips"))).as("flip"))
      .select(col("vec_id"), col("tbl"),
        col("bkt").bitwiseXOR(col("flip")).as("bkt"))
  }

  /** Multi-probe candidate join: query probe buckets (broadcast —
    * NQ·tables·(1+m) rows) against the SAME single-probe corpus bucket
    * relation the lsh family indexes. */
  private def lshMpCandPlan(e0: DataFrame, buckets: DataFrame,
      bits: Int, mProbe: Int = MProbe): DataFrame = {
    val probes = withProbes(e0.filter(col("vec_id") < NQ), bits, mProbe)
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
    val c = buckets.select(col("vec_id").as("nid"), col("tbl"), col("bkt"))
    broadcast(probes).join(c, Seq("tbl", "bkt"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
  }

  private def annResult(s: SparkSession, d: String,
      candPath: String): DataFrame =
    withBucketCache(withBuckets(emb(s, d), bitsFor(corpusRows(s, d)))) { b =>
      materialized(s,
        rankTopK(cosineFor(s, d, maybeSideFile(s, d, annCandPlan(b), candPath))),
        candPath + "_res")
    }

  // ---- Incremental ANN: batch-vs-persisted-bucket-index probe --------

  /** Build-once persisted LSH bucket index of the "previous snapshot"
    * (vec_id % 4 != 3) — the VECTOR twin of the text side's
    * ensureBandIndex: (vec_id, tbl, bkt) rows, the artifact a
    * continuously-ingesting embedding pipeline carries across syncs so
    * each NEW batch can be similarity-probed without re-bucketing the
    * accumulated corpus. Freshness keys on the source fingerprint plus
    * every bucketing parameter (tables, bits, base predicate) — bits
    * derive deterministically from the corpus row count, so probe-time
    * bucketing of the batch uses the identical plane set. */
  private def ensureBucketIndex(s: SparkSession, d: String,
      bits: Int): String = {
    val dir = s"${graft.Tables.scratchRoot}/graft_vecidx_${graft.Tables.dirTag(d)}_v1"
    val fp = graft.Tables.sourceFingerprint(
      Seq(java.nio.file.Paths.get(d, "embeddings.parquet")),
      s"lshbuckets:$numTables:bits$bits:base_mod4ne3")
    graft.Tables.ensureDerived(dir, fp) {
      withBuckets(emb(s, d).filter(col("vec_id") % 4 =!= 3), bits)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** The incremental candidate join (batch buckets ⋈ persisted bucket
    * index). Exposed as a probe so PlanQualitySpec can assert the base
    * side enters as a parquet SCAN of the index — exactly one
    * plane-projection bucket build in the whole plan (the new batch),
    * never a re-bucketing of the accumulated corpus. The index side is
    * skew-capped at read (deterministic by vec_id, same guard as
    * q_embed_dup); candidates stay (tbl, bkt)-equi-joined — never
    * all-pairs. */
  private[graft] def incAnnCandidateProbe(s: SparkSession,
      d: String): DataFrame = {
    val bits = bitsFor(corpusRows(s, d))
    val baseBuckets = capBuckets(
      s.read.parquet(ensureBucketIndex(s, d, bits)))
      .select(col("vec_id").as("nid"), col("tbl"), col("bkt"))
    withBuckets(emb(s, d).filter(col("vec_id") % 4 === 3), bits)
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
      .join(baseBuckets, Seq("tbl", "bkt"))
      .select("qid", "nid").distinct()
  }

  /** Oracle re-rank over a candidate side-file glob (StreamQueries'
    * streaming ANN gate shares the batch oracle verbatim). */
  private[graft] def rankSqlFor(glob: String): String =
    rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('$glob')")

  /** Index location + bit width for the incremental/streaming ANN
    * probes (StreamQueries shares the exact batch protocol, so its
    * per-micro-batch candidates equal the batch run's). */
  private[graft] def annIndexFor(s: SparkSession, d: String): (String, Int) = {
    val bits = bitsFor(corpusRows(s, d))
    (ensureBucketIndex(s, d, bits), bits)
  }

  /** Bucket relation of an arbitrary (vec_id, v) frame (StreamQueries'
    * per-micro-batch bucketing — same planes, same bit width). */
  private[graft] def bucketsOf(e: DataFrame, bits: Int): DataFrame =
    withBuckets(e, bits)

  /** Deterministic skew cap over an index read (see capBuckets). */
  private[graft] def cappedIndex(idx: DataFrame): DataFrame =
    capBuckets(idx)

  /** Exact top-K re-rank of an explicit candidate set with size-based
    * join planning (shared by q_embed_ann_inc and its streaming twin). */
  private[graft] def rankCandidates(s: SparkSession, d: String,
      cand: DataFrame): DataFrame =
    rankTopK(cosineForPlanned(s, d, cand))

  /** Exact cosine for (qid, nid) pairs with SIZE-BASED join planning —
    * unlike cosineFor (which broadcasts its ≤NQ-row query side), the
    * incremental batch is corpus-scaled, so the planner must be free
    * to flip the batch side to a shuffled join as it grows. */
  private def cosineForPlanned(s: SparkSession, d: String,
      pairs: DataFrame): DataFrame = {
    val e = emb(s, d)
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("nid"), col("v"), col("nrm"))
    pairs.join(q, "qid").join(c, "nid")
      .withColumn("cosraw", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      .select("qid", "nid", "cosraw")
  }

  // ---- IVF-style partitioning: nearest-centroid inverted lists -------
  private val numCentroids = 16
  // 4-of-16 probes: 2 measured recall@5 ≈ 0.5 on the unit-sphere
  // fixture (cells are not well separated at dim 64/k 16); 4 holds
  // ~0.8 while each query still scans only a quarter of the lists —
  // the nprobe/recall dial every IVF deployment tunes.
  private val numProbes = 4
  // 12 Lloyd passes: driver math on a ≤KMeansSample sample is free,
  // and enough rounds let Lloyd pull the spread (k-center) inits into
  // the density — at 2 iterations the init choice dominated recall.
  private val KMeansIters = 12

  /** Sample size for driver-side k-means training (FAISS-style IVF
    * protocol: train centroids on a bounded sample, assign the full
    * corpus in one distributed pass). The sample is the only
    * driver-side state — k×dim Lloyd math on ≤KMeansSample vectors is
    * trivial at any corpus size; scale the constant with k if k grows. */
  private val KMeansSample = 2048

  /** Deterministic hash-rank training sample (r11 VERDICT #4): FAISS
    * trains on a UNIFORM sample, and `vec_id < KMeansSample` is only
    * uniform when ids are uncorrelated with content — on a real corpus
    * where ids encode source/time it trains the codebooks on the head.
    * A sha256 rank (the q_sample_hash derivation) is uniform over the
    * corpus AND reproducible across runs/engines/cluster sizes, with
    * no RNG state. Plan shape: a distributed top-k on the hash
    * (TakeOrderedAndProject — per-partition heads merged at the
    * driver), never a full sort; the collect stays ≤KMeansSample rows
    * at any corpus size. Returned in hash order, so `take(k)` heads
    * double as the (uniform) Lloyd inits. */
  private def trainSample(e: DataFrame): Array[(Long, Array[Double])] =
    e.select(col("vec_id"), col("v"))
      .withColumn("__h", sha2(
        concat(lit("kmtrain:"), col("vec_id").cast("string")), 256))
      .orderBy(col("__h"), col("vec_id"))
      .limit(KMeansSample)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Deterministic farthest-point (Gonzalez k-center) Lloyd inits over
    * the training sample: seed with the first sample vector, then k−1
    * rounds of "farthest from everything picked so far" (first-index
    * tie-break). Spread inits are the standard cure for Lloyd's
    * init-sensitivity (k-means++ without the RNG): a "first k in
    * sample order" init can seed several centroids inside one dense
    * region and collapse recall — measured when the hash-rank sample
    * reordered the fixture. O(|sample|·k) driver math, bit-stable. */
  private def spreadInits(sample: Array[Array[Double]],
      k: Int): Array[Array[Double]] = {
    val n = sample.length
    val m = math.min(k, n)
    val picked = new Array[Int](m)
    val d2 = Array.fill(n)(Double.MaxValue)
    var pc = 1
    while (pc < m) {
      val last = sample(picked(pc - 1))
      var bi = 0
      var bd = -1.0
      var i = 0
      while (i < n) {
        var ds = 0.0
        var j = 0
        while (j < last.length) {
          val t = sample(i)(j) - last(j); ds += t * t; j += 1
        }
        if (ds < d2(i)) d2(i) = ds
        if (d2(i) > bd) { bd = d2(i); bi = i }
        i += 1
      }
      picked(pc) = bi
      pc += 1
    }
    // Degenerate k > distinct-points case: repeats are fine (the
    // empty-cluster-keeps-previous rule absorbs them).
    (picked.map(sample(_).clone()) ++
      Array.fill(k - m)(sample(0).clone())).take(k)
  }

  /** (cid, centroid-vector) after `iters` driver-side Lloyd passes over
    * the hash-rank sample (deterministic; sequential double math, so
    * results are bit-stable across runs). Assignment metric is cosine
    * with the same tie-break as the distributed probe (highest sim,
    * then lowest cid); clusters that lose every sample member keep
    * their previous centroid. */
  private def centroids(e: DataFrame, iters: Int): Seq[(Int, Seq[Double])] = {
    val sample: Array[(Long, Array[Double])] = trainSample(e)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    var cs: Array[Array[Double]] =
      spreadInits(sample.map(_._2), numCentroids)
    for (_ <- 1 to iters) {
      val cn = cs.map(nrm)
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Int](cs.length)
      sample.foreach { case (_, v) =>
        val vn = nrm(v)
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          val sim = dot(v, cs(c)) / (vn * cn(c))
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cs = cs.indices.map { c =>
        if (counts(c) == 0) cs(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    cs.indices.map(c => c -> cs(c).toSeq)
  }

  /** IVF candidates: corpus vectors live in their single nearest
    * centroid list (top-1 via max(struct) — a hash aggregate whose
    * map-side combine collapses the k candidate rows per vector BEFORE
    * the exchange; a row_number window would sort-shuffle all k×N
    * rows); queries probe their top `numProbes` lists (the window runs
    * on NQ×k rows only, after the query filter prunes the corpus). The
    * probe is an equality join on centroid id — partition-pruned
    * search, never a full scan per query. */
  private def ivfCandPlan(s: SparkSession, e: DataFrame): DataFrame = {
    val (lists, probes) = ivfListsAndProbes(s, e)
    broadcast(probes).join(lists, "cid")
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
  }

  /** Exact brute-force top-K ground truth over `e` for the NQ anchor
    * queries — the ONE shared oracle of all three recall-curve
    * receipts (IVF nprobe, PQ M, LSH multi-probe m), extracted so the
    * three families can never drift onto different ground truths. One
    * broadcast-anchor cross, checkpointed so every curve point reuses
    * the materialized truth instead of re-running the cross. */
  private def exactTopKPlan(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    rankTopK(broadcast(q).crossJoin(e)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cosraw",
          expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
        .select(col("qid"), col("vec_id").as("nid"), col("cosraw")))
      .select("qid", "nid")
  }

  private def exactTopK(e: DataFrame): DataFrame =
    exactTopKPlan(e).localCheckpoint()

  /** recall@K of a candidate relation against the exact ground truth
    * (the shared denominator NQ·K — every anchor has exactly K true
    * neighbors by construction). */
  private def recallOf(exact: DataFrame, cand: DataFrame): Double =
    exact.join(cand, Seq("qid", "nid"), "left_semi").count()
      .toDouble / (NQ.toLong * K)

  /** IVF recall as a CURVE over probe widths — the IVF analogue of
    * the LSH multi-probe census, for IvfRecallSpec's
    * monotonicity/exhaustive-probe receipts. The nprobe-independent
    * work (exact top-k ground truth, centroid training, list
    * assignment, the per-query full centroid ranking) runs ONCE; each
    * requested width only re-applies the `crank <= nprobe` filter. */
  private[graft] def ivfRecallCurve(s: SparkSession, d: String,
      nprobes: Seq[Int]): Seq[(Int, Double)] = {
    val e = emb(s, d).persist()
    try {
      val exact = exactTopK(e)
      // ivfListsAndProbes at the WIDEST width, ranks checkpointed once.
      val widest = nprobes.max
      val (lists0, probes0) = ivfListsAndProbes(s, e, widest,
        keepRank = true)
      val lists = lists0.localCheckpoint()
      val probes = probes0.localCheckpoint()
      nprobes.map { np =>
        val cand = broadcast(probes.filter(col("crank") <= np))
          .join(lists, "cid")
          .filter(col("qid") =!= col("nid"))
          .select("qid", "nid").distinct()
        np -> recallOf(exact, cand)
      }
    } finally { e.unpersist(blocking = true); () }
  }

  /** The coarse-quantizer width, exposed so IvfRecallSpec's
    * exhaustive-probe receipt stays true by construction if this
    * constant is ever tuned. */
  private[graft] def ivfNumCentroids: Int = numCentroids

  /** The IVF index halves, shared by the pure-IVF plan and the IVF+PQ
    * composite: (lists = corpus vectors in their single nearest
    * centroid list, probes = each query's top `nprobe` lists —
    * defaulting to the gates' numProbes). `keepRank` retains the
    * `crank` column so the recall-curve probe can re-slice one ranked
    * relation at several widths. */
  private def ivfListsAndProbes(s: SparkSession, e: DataFrame,
      nprobe: Int = numProbes,
      keepRank: Boolean = false): (DataFrame, DataFrame) = {
    val spark = s
    import spark.implicits._
    // The training-sample collect inside centroids() is the first
    // action and warms the caller's cache for the assignment scans.
    val cDf = broadcast(centroids(e, KMeansIters).toDF("cid", "cv")
      .withColumn("cnrm", sqrt(expr("vec_dot(cv, cv)"))))
    def scored = e.select(col("vec_id"), col("v"), col("nrm"))
      .crossJoin(cDf)
      .withColumn("sim",
        expr("vec_dot(v, cv)") / (col("nrm") * col("cnrm")))
    val lists = scored
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("cid")).as("tie"),
        col("cid"))).as("best"))
      .select(col("best.cid").as("cid"), col("vec_id").as("nid"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cid"))
    val ranked = scored.filter(col("vec_id") < NQ)
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
    val probes =
      if (keepRank) ranked.select(col("vec_id").as("qid"), col("cid"),
        col("crank"))
      else ranked.select(col("vec_id").as("qid"), col("cid"))
    (lists, probes)
  }

  private def ivfResult(s: SparkSession, d: String,
      candPath: String): DataFrame = {
    val e = emb(s, d).persist()
    try
      materialized(s,
        rankTopK(cosineFor(s, d,
          maybeSideFile(s, d, ivfCandPlan(s, e), candPath))),
        candPath + "_res")
    finally e.unpersist(blocking = true)
  }

  // ---- Product quantization: ADC search over compressed codes --------
  // 8 subspaces × 16 codes = 8 codes/vector (FAISS PQ8x4: a 64-float
  // embedding compresses 32x) and a 128-wide ADC shortlist before the
  // exact re-rank. The r11 4×16/32 configuration's recall was
  // init-sensitive (0.36-0.8 across Lloyd inits at sf0.001 — the old
  // 0.8 was init luck, exposed when the hash-rank sample reordered
  // training); this shape measures ~0.93 recall@5 across inits on the
  // same fixture. The shortlist is a CONSTANT per query at any corpus
  // size, so the re-rank stays ≤128 exact dots per query at 100 TB.
  private val pqSub = 8                 // subspaces (dims per subspace = dim/pqSub)
  private val pqCodes = 16              // centroids per subspace codebook
  private val pqShortlist = 128         // ADC shortlist before exact re-rank

  /** Per-subspace codebooks trained with Lloyd passes on the same
    * bounded hash-rank driver sample as IVF (FAISS PQ protocol: train
    * on a uniform sample, encode the corpus distributively).
    * Sequential double math on ≤KMeansSample subvectors — bit-stable
    * across runs, trivial at any corpus size. Returns (subspace, code,
    * centroid) rows; pqSub×pqCodes total. */
  private def pqCodebooks(e: DataFrame,
      sub: Int = pqSub): Seq[(Int, Int, Seq[Double])] = {
    require(dim % sub == 0, s"pq subvector count $sub must divide dim $dim")
    val subDim = dim / sub
    val sample: Array[Array[Double]] = trainSample(e).map(_._2)
    (0 until sub).flatMap { m =>
      val subs = sample.map(_.slice(m * subDim, (m + 1) * subDim))
      var cs = spreadInits(subs, pqCodes)
      for (_ <- 1 to KMeansIters) {
        val sums = Array.fill(pqCodes)(new Array[Double](subDim))
        val counts = new Array[Int](pqCodes)
        subs.foreach { sv =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var ds = 0.0; var i = 0
            while (i < subDim) {
              val t = sv(i) - cs(c)(i); ds += t * t; i += 1
            }
            if (ds < bestD) { bestD = ds; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += sv(i); i += 1 }
          counts(best) += 1
        }
        cs = cs.indices.map(c =>
          if (counts(c) == 0) cs(c) else sums(c).map(_ / counts(c))).toArray
      }
      cs.indices.map(c => (m, c, cs(c).toSeq))
    }
  }

  /** PQ candidates: every corpus vector is encoded to pqSub codes in
    * one map-side pass (argmin over the broadcast codebook via a
    * min(struct) partial aggregate — the 16 candidate rows per
    * (vector, subspace) collapse BEFORE the exchange), queries score
    * codes through a broadcast ADC lookup table, and a per-query top-N
    * keeps the shortlist. Distances are rounded to integer micro-units
    * so every aggregate is exact and partition-order independent. At
    * 100 TB this is the memory story: the search structure is pqSub
    * bytes per vector (a 64-float embedding compresses 64×), and the
    * only corpus-sized shuffle carries (qid, nid, partial-sum) longs. */
  /** The per-(vector, subspace, code) distance frame shared by the
    * pure-PQ plan and the IVF+PQ composite: every subvector scored
    * against the broadcast codebook, integer micro-unit distances. */
  private def pqScored(s: SparkSession, e: DataFrame,
      sub: Int = pqSub): DataFrame = {
    val spark = s
    import spark.implicits._
    val subDim = dim / sub
    val cb = broadcast(pqCodebooks(e, sub).toDF("m", "code", "cv"))
    val subs = e.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${sub - 1}), m -> " +
          s"struct(m AS m, slice(v, m * $subDim + 1, $subDim) AS sv))"))
        .as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
    // ||sv - cv||² expanded through the codegen'd dot products.
    subs.join(cb, "m")
      .withColumn("dist_e6", expr(
        "CAST(round((vec_dot(sv, sv) - 2 * vec_dot(sv, cv)" +
          " + vec_dot(cv, cv)) * 1e6) AS BIGINT)"))
  }

  /** PQ codes per corpus vector (argmin over the broadcast codebook
    * via a min(struct) partial aggregate — candidate rows collapse
    * BEFORE the exchange) and the per-query ADC lookup table. */
  private def pqCodesAndLut(scored: DataFrame): (DataFrame, DataFrame) = {
    val codes = scored.groupBy(col("vec_id").as("nid"), col("m"))
      .agg(min(struct(col("dist_e6"), col("code"))).as("best"))
      .select(col("nid"), col("m"), col("best.code").as("code"))
    val lut = scored.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("m"), col("code"),
        col("dist_e6"))
    (codes, lut)
  }

  private def pqCandPlan(s: SparkSession, e: DataFrame,
      sub: Int = pqSub, shortlist: Int = pqShortlist): DataFrame = {
    val (codes, lut) = pqCodesAndLut(pqScored(s, e, sub))
    val adc = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid").agg(sum("dist_e6").as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc"), col("nid"))
    adc.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
      .select("qid", "nid")
  }

  /** PQ recall as a CURVE over subvector counts M — the PQ analogue of
    * ivfRecallCurve, for PqRecallSpec's knob receipts. M is the
    * memory/accuracy dial of the compressed index: each vector stores
    * M 4-bit codes (pqCodes = 16), so doubling M doubles the code
    * bytes per vector AND halves each subspace's width (finer
    * quantization cells → tighter ADC distances → higher recall).
    * The ground truth (exact brute-force top-k) is computed once;
    * codebooks/encoding are per-M by construction (a different M IS a
    * different index). `shortlistOverride` lets the spec pin the
    * exhaustive anchor: with shortlist >= corpus the ADC cut keeps
    * everything, so recall is exactly 1.0 regardless of the codes —
    * proving the re-rank loses nothing beyond the shortlist. */
  private[graft] def pqRecallCurve(s: SparkSession, d: String,
      subs: Seq[Int], shortlistOverride: Option[Int] = None)
      : Seq[(Int, Double)] = {
    val e = emb(s, d).persist()
    try {
      val exact = exactTopK(e)
      val shortlist = shortlistOverride.getOrElse(pqShortlist)
      subs.map { m =>
        m -> recallOf(exact, pqCandPlan(s, e, m, shortlist))
      }
    } finally { e.unpersist(blocking = true); () }
  }

  /** The shipped PQ shape, exposed for PqRecallSpec's curve receipts. */
  private[graft] def pqSubShipped: Int = pqSub
  private[graft] def pqShortlistShipped: Int = pqShortlist

  /** IVF+PQ composite candidates — the FAISS IndexIVFPQ protocol, the
    * configuration real billion-scale deployments run: the coarse
    * quantizer restricts each query to its `numProbes` nearest
    * inverted lists, and ONLY those lists' members are ADC-scored
    * through the PQ codes before the shortlist → exact re-rank. The
    * two index structures compose multiplicatively at 100 TB: the IVF
    * probe prunes the candidate domain to ~numProbes/numCentroids of
    * the corpus BEFORE any per-pair work, and the per-candidate cost
    * is pqSub code lookups against a broadcast LUT instead of a
    * dim-wide dot — the memory story (pqSub bytes/vector) and the
    * scan story (probed lists only) at once. Every aggregate is the
    * same exact-integer, partition-order-independent math as the
    * component gates. */
  private def ivfpqCandPlan(s: SparkSession, e: DataFrame): DataFrame = {
    val (lists, probes) = ivfListsAndProbes(s, e)
    val cand = broadcast(probes).join(lists, "cid")
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
    val (codes, lut) = pqCodesAndLut(pqScored(s, e))
    val adc = cand.join(codes, "nid")
      .join(broadcast(lut), Seq("qid", "m", "code"))
      .groupBy("qid", "nid").agg(sum("dist_e6").as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc"), col("nid"))
    adc.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pqShortlist)
      .select("qid", "nid")
  }

  private def ivfpqResult(s: SparkSession, d: String,
      candPath: String): DataFrame = {
    val e = emb(s, d).persist()
    try
      materialized(s,
        rankTopK(cosineFor(s, d,
          maybeSideFile(s, d, ivfpqCandPlan(s, e), candPath))),
        candPath + "_res")
    finally e.unpersist(blocking = true)
  }

  private def pqResult(s: SparkSession, d: String,
      candPath: String): DataFrame = {
    val e = emb(s, d).persist()
    try
      materialized(s,
        rankTopK(cosineFor(s, d,
          maybeSideFile(s, d, pqCandPlan(s, e), candPath))),
        candPath + "_res")
    finally e.unpersist(blocking = true)
  }

  /** Corpus-wide same-bucket pairs (i < j) — the near-dup candidates.
    * Bucket-bit count scales with corpus size (bitsFor) and each bucket
    * is capped (capBuckets), so per-bucket pair work stays bounded no
    * matter how large or how skewed the corpus gets.
    *
    * Single-pass capping: the CAPPED relation is what gets persisted,
    * so the row_number window exchange runs exactly once; the count()
    * that materializes the cache doubles as the spill measurement
    * (buckets in = numTables rows per vector, so spilled = in − kept),
    * and both self-join sides read the warm cache. Round 3 cached the
    * pre-window buckets instead, recomputing the window 3× (spill
    * count job + each join side). */
  private def dupCandPlan(capped: DataFrame): DataFrame = {
    val l = capped.select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
    val r = capped.select(col("vec_id").as("nid"), col("tbl"), col("bkt"))
    l.join(r, Seq("tbl", "bkt")).filter(col("qid") < col("nid"))
      .select("qid", "nid").distinct()
  }

  private def dupResult(s: SparkSession, d: String,
      candPath: String): DataFrame = {
    val n = corpusRows(s, d)
    val capped =
      capBuckets(withBuckets(emb(s, d), bitsFor(n))).persist()
    try {
      val kept = capped.count() // materializes the cache — one window pass
      val spilled = numTables * n - kept
      if (spilled > 0)
        System.err.println(
          s"[graft] embed LSH: $spilled bucket members beyond cap=$MaxBucket " +
            "excluded from candidate generation (recall reduced)")
      materialized(s,
        cosineFor(s, d, maybeSideFile(s, d, dupCandPlan(capped), candPath))
          .filter(col("cosraw") >= DupThreshold)
          .select(col("qid").as("vec_a"), col("nid").as("vec_b"),
            round(col("cosraw"), 6).as("cosine")),
        candPath + "_res")
    } finally capped.unpersist(blocking = true)
  }

  /** Unmaterialized pipeline plans for plan-quality inspection (the
    * gate queries materialize eagerly inside their cache scopes, so
    * their returned plan is just the result-file scan). Not part of
    * the driver contract. */
  private[graft] def planProbe(s: SparkSession, d: String,
      which: String): DataFrame = which match {
    case "ann" =>
      rankTopK(cosineFor(s, d,
        annCandPlan(withBuckets(emb(s, d), bitsFor(corpusRows(s, d))))))
    case "ivf" =>
      rankTopK(cosineFor(s, d, ivfCandPlan(s, emb(s, d))))
    case "pq" =>
      rankTopK(cosineFor(s, d, pqCandPlan(s, emb(s, d))))
    case "dup" =>
      cosineFor(s, d, dupCandPlan(
        capBuckets(withBuckets(emb(s, d), bitsFor(corpusRows(s, d))))))
        .filter(col("cosraw") >= DupThreshold)
    case "annmp" =>
      val e0 = emb(s, d)
      val bits = bitsFor(corpusRows(s, d))
      rankTopK(cosineFor(s, d,
        lshMpCandPlan(e0, withBuckets(e0, bits), bits)))
  }

  /** Test probes (MultiProbeSpec): the single- and multi-probe
    * candidate plans over the SAME bucket relation, the raw probe
    * rows, and the query-side base buckets — so the spec can pin the
    * superset guarantee (flip 0 ⇒ lsh_mp candidates ⊇ lsh candidates,
    * hence recall can only rise) and the probe structure (1+m probes
    * per (query, table), each within Hamming 1 of the base). */
  private[graft] def mpProbes(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, Int) = {
    val e0 = emb(s, d)
    val bits = bitsFor(corpusRows(s, d))
    val b = withBuckets(e0, bits)
    (annCandPlan(b), lshMpCandPlan(e0, b, bits),
      withProbes(e0.filter(col("vec_id") < NQ), bits, MProbe),
      b.filter(col("vec_id") < NQ), bits)
  }

  /** Multi-probe recall as a CURVE over the probe count m — the LSH
    * analogue of ivfRecallCurve/pqRecallCurve, completing the knob
    * receipts for all three tunable families. m prices the QUERY-side
    * fan-out only (T·(1+m) bucket lookups per query); the index is the
    * same one-bucket-per-vector-per-table relation at every m, so this
    * is the only knob of the three with zero build/storage cost. m=0
    * is single-probe (annCandPlan — asserted identical in the spec);
    * the ceiling at m=bits is the documented Hamming-1 limit: single-
    * bit flips exhaust the near planes, deeper sequences need
    * multi-bit combos. */
  private[graft] def lshMpRecallCurve(s: SparkSession, d: String,
      ms: Seq[Int]): Seq[(Int, Double)] = {
    val e0 = emb(s, d).persist()
    try {
      val bits = bitsFor(corpusRows(s, d))
      val exact = exactTopK(e0)
      withBucketCache(withBuckets(e0, bits)) { b =>
        ms.map { m =>
          val cand =
            if (m == 0) annCandPlan(b) else lshMpCandPlan(e0, b, bits, m)
          m -> recallOf(exact, cand)
        }
      }
    } finally { e0.unpersist(blocking = true); () }
  }

  /** LSH plane-count per table for dir `d`, exposed so the curve spec
    * can pin the Hamming-1 ceiling at m=bits by construction. */
  private[graft] def lshBitsFor(s: SparkSession, d: String): Int =
    bitsFor(corpusRows(s, d))

  /** The q_ann_recall hit-census wiring, exposed for PlanQualitySpec at
    * any dir: candidates are materialized to a side-file and re-enter
    * the census as a parquet SCAN (never an uncached bucket-lineage
    * replay — the bucket cache is gone by census time), and the exact
    * side is the ONE broadcast-anchor cross. */
  private[graft] def recallHitProbe(s: SparkSession, d: String): DataFrame = {
    val e0 = emb(s, d)
    // exactTopKPlan, NOT exactTopK: the plan gate asserts the census's
    // exact side is the one broadcast-anchor cross IN THE PLAN — a
    // checkpoint would collapse it to an ExistingRDD.
    val exact = exactTopKPlan(e0)
    val candPath =
      s"${graft.Tables.scratchRoot}/graft_cand_probe_${graft.Tables.dirTag(d)}"
    val cand = withBucketCache(
        withBuckets(e0, bitsFor(corpusRows(s, d)))) { b =>
      materialized(s, annCandPlan(b).select("qid", "nid"), candPath)
    }
    exact.join(cand, Seq("qid", "nid"), "left_semi")
  }

  // ---- Distributed Lloyd's k-means (quantized, cross-engine exact) ---
  private val KmK = 8
  private val KmIters = 3

  /** SemDeDup's scale contract (Abbas et al. 2023: "k scales with N to
    * bound cells") as a derivation, not prose: k = clamp(⌈N/KmCell⌉,
    * KmK, KmMaxK), so cells hold ~KmCell vectors at any corpus size
    * and the k-means-cell family's pair work — sum(|cell|²) ≈ N·KmCell
    * — stays LINEAR in N instead of quadratic at fixed k (the same
    * discipline as the LSH family's log₂N bit count). KmCell = 250
    * makes the derivation exact at the verify fixtures (sf0.01: 500
    * vectors → floor 8; sf0.1: 2000 → 2000/250 = 8), so every oracle
    * of the family (kmeans/prototype/semdedup share the unrolled k=8
    * CTE chain) is unchanged where the driver compares it, while a
    * grown corpus (the 10× soak: 20000 → k=80) gets bounded cells
    * automatically through the shared centroid artifact. Up to
    * KmLiteralMax the matrix rides the plan (km_assign reference
    * object); past it kmeansAssign flips to the broadcast-backed
    * km_assign_bc — shipped once per executor — so plan size never
    * grows with k (identity between the two paths pinned in
    * KmeansSpec). KmMaxK then only bounds DRIVER state: the training
    * loop's k×dim partial collect stays ≤ 64k×64 longs (32 MB). */
  private val KmCell = 250L
  private[graft] val KmLiteralMax = 128
  private val KmMaxK = 65536
  private[graft] def kmeansK(n: Long): Int =
    math.min(math.max(KmK.toLong, (n + KmCell - 1L) / KmCell),
      KmMaxK.toLong).toInt

  /** Corpus quantized to integer milli-units: one double multiply +
    * half-away round per component (identical in every engine), so the
    * whole Lloyd loop runs in integer-exact arithmetic — the
    * q_embed_centroid fixed-point discipline extended to an iterative
    * operator (a float k-means would hash-mismatch on summation order
    * and ulp-level assignment flips). */
  private def qvec(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    t(s, d, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
  }

  /** One distributed assignment pass against a centroid matrix held in
    * the plan (the BPE merge-rule pattern — k x dim integers is a
    * bounded driver scalar at any corpus size): the codegen'd
    * km_assign expression ([[graft.functions.KMeansAssignExpr]])
    * computes argmin_c Σ(v_i - c_i)² with lowest-cid tie-break in one
    * tight integer loop per row, the matrix riding as a single
    * reference object so plan size and per-row overhead stay CONSTANT
    * in k — load-bearing now that kmeansK derives k from the corpus
    * (the previous k-distance-columns formulation paid parse/codegen
    * and per-row array traversal linear in k). Map-only: no join, no
    * exchange — the corpus streams through one codegen stage per
    * round (plan-gated). */
  private[graft] def kmeansAssign(e: DataFrame,
      cents: Array[Array[Long]]): DataFrame =
    kmeansAssignWithHandle(e, cents)._1

  /** kmeansAssign plus the TorrentBroadcast handle when the broadcast
    * regime was taken (None in the literal regime), so callers that
    * OWN the action boundary — the Lloyd training loop collects each
    * round — can `destroy()` the k×dim matrix instead of leaking
    * KmIters+1 broadcasts (~32 MB each at KmMaxK) per training run.
    * Callers returning a lazy DataFrame (the gates) keep the handle
    * alive through the expression tree; with no session-global
    * registry reference anymore, ContextCleaner reclaims it when the
    * plan is collected. */
  private[graft] def kmeansAssignWithHandle(e: DataFrame,
      cents: Array[Array[Long]]): (DataFrame,
        Option[org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]]) = {
    val s = e.sparkSession
    VectorFunctions.register(s)
    val (assign, handle) =
      if (cents.length <= KmLiteralMax)
        (call_function("km_assign", col("v"),
          typedlit(cents.map(_.toSeq).toSeq)), None)
      else {
        // Past the literal regime the matrix ships as a broadcast —
        // once per executor, not once per task binary (KmMaxK
        // scaladoc). The expression wraps THIS broadcast directly via
        // ColumnBridge — no session-global registry mutation, so two
        // concurrent queries each ride their own matrix
        // (KmeansSpec pins this).
        val bc = s.sparkContext.broadcast(cents)
        (org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.KMeansAssignBcastExpr(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
            bc)), Some(bc))
      }
    (e.withColumn("__a", assign)
      .select(col("vec_id"), col("v"),
        col("__a.cid").as("cid"), col("__a.dist").as("dist")), handle)
  }

  /** Cyclic Jacobi eigensolver for a small dense symmetric matrix —
    * driver math on the dim×dim scatter (the codebook discipline:
    * deterministic sweep order, sequential IEEE doubles, bit-stable
    * across runs). Returns (eigenvalues, eigenvector matrix with
    * vectors in COLUMNS). 16 fixed sweeps drive off-diagonal mass to
    * ~1e-14 of trace at dim 64 — convergence asserted by PcaSpec's
    * residual check, not assumed. */
  private[graft] def jacobiEig(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to 16; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        // A <- Jᵀ A J, columns p/q then rows p/q.
        var k0 = 0
        while (k0 < n) {
          val akp = a(k0)(p); val akq = a(k0)(q)
          a(k0)(p) = c * akp - s * akq
          a(k0)(q) = s * akp + c * akq
          k0 += 1
        }
        k0 = 0
        while (k0 < n) {
          val apk = a(p)(k0); val aqk = a(q)(k0)
          a(p)(k0) = c * apk - s * aqk
          a(q)(k0) = s * apk + c * aqk
          k0 += 1
        }
        k0 = 0
        while (k0 < n) {
          val vkp = v(k0)(p); val vkq = v(k0)(q)
          v(k0)(p) = c * vkp - s * vkq
          v(k0)(q) = s * vkp + c * vkq
          k0 += 1
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Round-half-up integer division (quotient at .5 rounds toward
    * +inf), exact for any sign of `a`, b > 0 — the same pure-integer
    * floordiv((2a+b), 2b) the oracle computes, so recomputed centroids
    * are bit-identical across engines. */
  private def halfUpDiv(a: Long, b: Long): Long =
    Math.floorDiv(2L * a + b, 2L * b)

  /** DuckDB twin of the Lloyd loop: KmIters unrolled
    * assign-and-recompute CTE pairs over the same quantized vectors,
    * same (distance, cid) tie-break, same half-up integer centroid
    * rounding, same empty-cluster-keeps-previous rule. The twin pins
    * k = KmK, which equals the derived kmeansK(N) at every fixture
    * the driver compares on (sf0.001/0.01: 500 rows, sf0.1: 2000) —
    * grown corpora derive more clusters and are covered by the soak +
    * KmeansSpec, not this SQL. */
  private[graft] val kmeansOracleSql: String = {
    val distExpr = "list_sum(list_transform(range(1, 65), " +
      "i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])))"
    def assign(x: Int, prev: String): String =
      s"""a$x AS (SELECT vec_id, v, cid, d FROM (
         |  SELECT vec_id, v, cid, d,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |  FROM (SELECT q.vec_id, q.v, c.cid, $distExpr AS d
         |        FROM q CROSS JOIN $prev c) raw) rk WHERE rn = 1)""".stripMargin
    def iter(x: Int): String = {
      val prev = if (x == 1) "c0" else s"c${x - 1}"
      s"""${assign(x, prev)},
         |g$x AS (SELECT cid, generate_subscripts(v, 1) AS pos,
         |          unnest(v) AS x FROM a$x),
         |s$x AS (SELECT cid, pos, sum(x) AS sx, count(*) AS n
         |        FROM g$x GROUP BY 1, 2),
         |c$x AS (SELECT p.cid, COALESCE(m.nv, p.v) AS v
         |  FROM $prev p LEFT JOIN (
         |    SELECT cid, list(CAST(((2*sx + n) -
         |        (((2*sx + n) % (2*n)) + (2*n)) % (2*n)) // (2*n)
         |      AS BIGINT) ORDER BY pos) AS nv
         |    FROM s$x GROUP BY cid) m ON m.cid = p.cid)""".stripMargin
    }
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cid, v FROM (
       |    SELECT v, row_number() OVER (ORDER BY
       |      sha256('kmtrain:' || CAST(vec_id AS VARCHAR)), vec_id)
       |      AS rn FROM q) WHERE rn <= $KmK),
       |${(1 to KmIters).map(iter).mkString(",\n")},
       |${assign(KmIters + 1, s"c$KmIters")}
       |SELECT vec_id, CAST(cid AS INT) AS cid, CAST(d AS BIGINT) AS dist
       |FROM a${KmIters + 1} ORDER BY vec_id""".stripMargin
  }

  /** The unrolled-Lloyd CTE chain alone (everything up to and
    * including the final assignment `aF`) — the shared prefix for the
    * oracles of every operator that CONSUMES the k-means clustering
    * (q_embed_prototype, q_embed_semdedup): they extend the chain
    * instead of duplicating it, so the clustering the consumers verify
    * against is definitionally the one q_embed_kmeans verifies. */
  private[graft] val kmeansFinalCte: String = "a" + (KmIters + 1)
  private[graft] val kmeansCtes: String = {
    val full = kmeansOracleSql
    full.substring(0, full.lastIndexOf("SELECT vec_id,")).trim.stripSuffix("\n")
  }

  /** Final Lloyd centroids, built ONCE per (source, code) fingerprint
    * under the derived-artifact protocol: the KmIters collect-cycle
    * loop (each collect k x dim rows — a bounded driver scalar) runs
    * only when embeddings.parquet or the compiled code changes; every
    * consumer gate (q_embed_kmeans, q_embed_prototype,
    * q_embed_semdedup) then starts from the k x dim integer table and
    * its returned plan is assignment-only — scan + literal-centroid
    * projects — with no training lineage. At 100 TB this is exactly
    * the shape you want: train once, persist the (tiny) model,
    * assign many times. */
  private[graft] def kmeansCentroids(s: SparkSession,
      d: String): Array[Array[Long]] = {
    // k is DERIVED from the corpus (kmeansK): the artifact fingerprint
    // folds it in, so a corpus that grows past the next cell boundary
    // retrains with more clusters automatically — consumers only ever
    // see cents.length.
    val k = kmeansK(corpusRows(s, d))
    val dir = s"${graft.Tables.scratchRoot}/graft_kmcent_${graft.Tables.dirTag(d)}"
    val fp = graft.Tables.sourceFingerprint(
      Seq(java.nio.file.Paths.get(d, "embeddings.parquet")),
      s"kmcent_v3:k$k:i$KmIters")
    graft.Tables.ensureDerived(dir, fp) {
      val e = qvec(s, d)
      // Hash-rank inits (cid = hash rank), NOT `vec_id < k`: on a
      // corpus whose ids encode source/time an id-head init seeds
      // every cluster inside one source — the 100x soak measured
      // semdedup pair work 2x superlinear from exactly that (inits
      // all in copy 0 left the other copies in giant cells). The
      // sha256 rank is uniform, reproducible, and expressible in the
      // oracle's c0 CTE verbatim; distributed top-k, never a sort.
      var cents: Array[Array[Long]] = e
        .orderBy(sha2(concat(lit("kmtrain:"),
          col("vec_id").cast("string")), 256), col("vec_id"))
        .limit(k).collect()
        .map(_.getSeq[Long](1).toArray)
      for (_ <- 1 to KmIters) {
        val (assigned, bcHandle) = kmeansAssignWithHandle(e, cents)
        val sums = assigned
          .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .collect()
        // The collect IS this round's action boundary: reclaim the
        // k×dim broadcast now instead of accumulating KmIters of them.
        bcHandle.foreach(_.destroy())
        val byCid = sums.groupBy(_.getInt(0))
        cents = Array.tabulate(k) { c =>
          byCid.get(c) match {
            case None => cents(c)
            case Some(rows) =>
              val out = new Array[Long](cents(c).length)
              rows.foreach { r =>
                out(r.getInt(1)) = halfUpDiv(r.getLong(2), r.getLong(3))
              }
              out
          }
        }
      }
      val rows = cents.zipWithIndex.flatMap { case (c, i) =>
        c.zipWithIndex.map { case (x, p) => (i, p, x) }
      }.toSeq
      s.createDataFrame(rows).toDF("cid", "pos", "x")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    s.read.parquet(dir).collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getLong(2)))
  }

  val entries: Map[String, (Q, String)] = Map(

    // Distributed Lloyd's k-means over the embedding corpus — the
    // clustering operator itself, complementing the protocols that
    // only consume its output (IVF lists, PQ codebooks, per-label
    // centroids). Roles are flipped vs FAISS-protocol training
    // (centroids(): driver math on a bounded sample): here the
    // ASSIGNMENT is the distributed work — one map-only codegen pass
    // per round, centroids riding in the plan as k x dim integer
    // literals — and only the k x dim partial sums ever reach the
    // driver (posexplode + partial-aggregating groupBy on (cid, pos):
    // the exchange carries one partial per partition-cid-dim, and the
    // collect is k x dim rows regardless of corpus size — the bounded
    // driver scalar pattern). Quantized fixed-point arithmetic end to
    // end makes every iteration bit-identical across engines, so the
    // final per-vector assignment hash-verifies against KmIters
    // unrolled CTE twins in DuckDB. Init = first k vectors
    // (deterministic); empty clusters keep their previous centroid.
    // At 100 TB: cache the quantized corpus across rounds; the
    // per-round shuffle stays k x dim sized.
    "q_embed_kmeans" -> ((
      (s: SparkSession, d: String) =>
        kmeansAssign(qvec(s, d), kmeansCentroids(s, d))
          .select("vec_id", "cid", "dist").orderBy("vec_id"),
      kmeansOracleSql)),

    // Prototypicality-based data pruning (the "beyond neural scaling
    // laws" recipe, Sorscher et al. 2022): rank every vector within
    // its k-means cluster by distance to the centroid and bucket —
    // the closest 20% are 'proto' (prototypical, prunable as
    // redundant), the farthest 10% are 'outlier' (prunable as noise),
    // the middle keeps. Consumes the SHARED persisted centroids
    // (kmeansCentroids — train once, assign many), so the returned
    // plan is the map-only literal-centroid assignment plus exactly
    // ONE hash exchange on cid feeding both the per-cluster
    // row_number and the cluster-size count (same Window partition →
    // one Exchange, plan-gated). Bucket edges are pure integer
    // comparisons (rn*5 <= n, (n-rn)*10 < n) on exact integer
    // distances — bit-identical cross-engine, no percentile floats.
    // At 100 TB: k scales with the corpus (k ~ N/target_cluster_size)
    // so per-cid partitions stay bounded; the ranking never sees more
    // than one cluster per task.
    "q_embed_prototype" -> ((
      (s: SparkSession, d: String) => {
        val a = kmeansAssign(qvec(s, d), kmeansCentroids(s, d))
        val wr = Window.partitionBy("cid").orderBy(col("dist"), col("vec_id"))
        val wc = Window.partitionBy("cid")
        a.withColumn("rnk", row_number().over(wr).cast("long"))
          .withColumn("n", count(lit(1)).over(wc))
          .select(col("vec_id"), col("cid"), col("dist"), col("rnk"),
            when(col("rnk") * 5 <= col("n"), lit("proto"))
              .when((col("n") - col("rnk")) * 10 < col("n"), lit("outlier"))
              .otherwise(lit("keep")).as("bucket"))
          .orderBy("vec_id")
      },
      s"""$kmeansCtes,
         |rk AS (SELECT vec_id, cid, d,
         |    row_number() OVER (PARTITION BY cid ORDER BY d, vec_id) AS rn,
         |    count(*) OVER (PARTITION BY cid) AS n
         |  FROM $kmeansFinalCte)
         |SELECT vec_id, CAST(cid AS INT) AS cid, CAST(d AS BIGINT) AS dist,
         |  CAST(rn AS BIGINT) AS rnk,
         |  CASE WHEN rn * 5 <= n THEN 'proto'
         |       WHEN (n - rn) * 10 < n THEN 'outlier'
         |       ELSE 'keep' END AS bucket
         |FROM rk ORDER BY vec_id""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning
    // scoped BY CLUSTER — pairwise cosine runs only inside a k-means
    // cell, never corpus-wide, which is the entire scale contract (k
    // grows with the corpus so cell sizes stay bounded; cost is
    // sum(|cell|^2), not N^2). A vector is pruned when a same-cluster
    // vector with a SMALLER id is cosine-similar above T=0.35 — the
    // deterministic keep-lowest-id representative rule. All math is
    // exact integer: quantized vectors (x1000), and cos >= T tested as
    // dot > 0 AND 10000*dot^2 >= 1225*|a|^2*|b|^2 (T^2 = 0.1225) —
    // every operand bounded by 64*580^2 so the products stay under
    // 2^63 in both engines; no float threshold can flip cross-engine.
    // Plan: both pair sides are the same literal-centroid assignment
    // (map-only), equi-joined on cid — a hash join, no
    // CartesianProduct anywhere (plan-gated); the dup count folds
    // partial+final on the kept-side id.
    "q_embed_semdedup" -> ((
      (s: SparkSession, d: String) => {
        val cents = kmeansCentroids(s, d)
        def side(p: String): DataFrame =
          kmeansAssign(qvec(s, d), cents)
            .withColumn("vd", expr("transform(v, x -> CAST(x AS DOUBLE))"))
            .select(col("vec_id").as(s"${p}id"), col("cid"),
              col("vd").as(s"${p}v"),
              expr("CAST(vec_dot(vd, vd) AS BIGINT)").as(s"${p}n"))
        val pairs = side("a").join(side("b"), Seq("cid"))
          .filter(col("aid") < col("bid"))
          .withColumn("dt", expr("CAST(vec_dot(av, bv) AS BIGINT)"))
          .filter(col("dt") > 0 &&
            lit(10000L) * col("dt") * col("dt") >=
              lit(1225L) * col("an") * col("bn"))
        val ns = pairs.groupBy(col("bid")).agg(count(lit(1)).as("ns"))
        val a = kmeansAssign(qvec(s, d), cents).select("vec_id", "cid")
        a.join(ns, a("vec_id") === ns("bid"), "left")
          .select(col("vec_id"), col("cid"),
            coalesce(col("ns"), lit(0L)).as("n_dup"),
            when(col("bid").isNull, lit(1)).otherwise(lit(0)).as("kept"))
          .orderBy("vec_id")
      },
      s"""$kmeansCtes,
         |pd AS (SELECT l.vec_id AS a, r.vec_id AS b,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> l.v[i] * r.v[i])) AS BIGINT) AS dt,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> l.v[i] * l.v[i])) AS BIGINT) AS na,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> r.v[i] * r.v[i])) AS BIGINT) AS nb
         |  FROM $kmeansFinalCte l JOIN $kmeansFinalCte r
         |    ON l.cid = r.cid AND l.vec_id < r.vec_id),
         |pr AS (SELECT b, CAST(count(*) AS BIGINT) AS ns FROM pd
         |  WHERE dt > 0 AND 10000 * dt * dt >= 1225 * na * nb
         |  GROUP BY b)
         |SELECT f.vec_id, CAST(f.cid AS INT) AS cid,
         |  CAST(COALESCE(pr.ns, 0) AS BIGINT) AS n_dup,
         |  CASE WHEN pr.b IS NULL THEN 1 ELSE 0 END AS kept
         |FROM $kmeansFinalCte f LEFT JOIN pr ON pr.b = f.vec_id
         |ORDER BY f.vec_id""".stripMargin)),

    // Per-label centroid (the training side of IVF / k-means): one
    // posexplode + partial-aggregating groupBy on (label, dim) — the
    // map-side combine means the exchange carries one partial sum per
    // (partition, label, dim), not the exploded corpus. Arithmetic is
    // exact fixed-point: each float is scaled by one IEEE double
    // multiply (identical in every engine) and rounded half-away to
    // integer micro-units, the longs sum exactly, and the average is a
    // floor-division in double (sums < 2^53 are exact, quotients never
    // within an ulp of an integer) — bit-identical across engines and
    // partition orders, where a naive avg(float) would hash-mismatch on
    // summation order. (Decimal casts are NOT portable at the ulp:
    // DuckDB rounds float→DECIMAL through a scaled double, Spark
    // through the exact binary expansion.)
    "q_embed_centroid" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "embeddings")
          .select(col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg(sum(round(col("v").cast("double") * 1000000).cast("long"))
            .as("sv"), count(lit(1)).as("n"))
          .select(col("label"), col("dim"),
            floor(col("sv").cast("double") / col("n"))
              .cast("long").as("centroid_e6"),
            col("n"))
          .orderBy("label", "dim"),
      """WITH x AS (
        |  SELECT label,
        |    CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT label, dim,
        |  CAST(floor(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
        |    AS DOUBLE) / count(*)) AS BIGINT) AS centroid_e6,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // Embedding drift monitor — the vector twin of q_drift_psi: did
    // the embedding distribution move between two corpus slices (model
    // version change, upstream encoder drift, data shift)? Per label,
    // the L1 distance between the slices' exact fixed-point centroids
    // plus the worst single dimension — the release-gate numbers an
    // embedding pipeline alarms on. Same exactness discipline as
    // q_embed_centroid (e6 integer units, floor-division means); BOTH
    // windows' sums ride ONE (label, dim) exchange via conditional
    // aggregation (the q_drift_psi trick — never two corpus passes),
    // then a label-domain rollup. At 100 TB: one scan, one
    // domain-sized exchange, everything after is (labels × dims).
    "q_embed_drift" -> ((
      (s: SparkSession, d: String) =>
        embDriftReport(embDriftGrid(t(s, d, "embeddings"))),
      EmbDriftOracle)),

    // Brute-force exact cosine top-k (baseline).
    // Embedding hygiene census — the quality gate an embedding corpus
    // passes BEFORE any ANN/index build spends compute on it (the
    // vector twin of q_quality_expect's row expectations): per label,
    // the count, zero-norm vectors (degenerate — cosine undefined),
    // wrong-dimension vectors (a schema break no typed column
    // catches), and the exact integer norm² extrema + mass. One
    // mergeable aggregate pass over the milli-quantized corpus —
    // every check is row-local, so the census fuses into ONE scan's
    // partial+final aggregate (plan-gated shape shared with
    // q_quality_expect).
    "q_embed_quality" -> ((
      (s: SparkSession, d: String) => {
        graft.functions.VectorFunctions.register(s)
        t(s, d, "embeddings").select(col("label"),
            expr("transform(embedding, x -> CAST(CAST(round(" +
              "CAST(x AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE))")
              .as("v"))
          .withColumn("n2", expr("CAST(vec_dot(v, v) AS BIGINT)"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"),
            sum(when(size(col("v")) =!= 64, 1L).otherwise(0L))
              .as("n_bad_dim"),
            min("n2").as("min_n2"), max("n2").as("max_n2"),
            sum("n2").as("sum_n2"))
          .orderBy("label")
      },
      """WITH q AS (SELECT label,
        |    list_transform(embedding, x ->
        |      CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings),
        |w AS (SELECT label,
        |    CAST(list_inner_product(v, v) AS BIGINT) AS n2,
        |    len(v) AS dim
        |  FROM q)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(count(*) FILTER (n2 = 0) AS BIGINT) AS n_zero,
        |  CAST(count(*) FILTER (dim <> 64) AS BIGINT) AS n_bad_dim,
        |  min(n2) AS min_n2, max(n2) AS max_n2,
        |  CAST(sum(n2) AS BIGINT) AS sum_n2
        |FROM w GROUP BY label ORDER BY label""".stripMargin)),

    // k-center greedy coreset (farthest-point traversal — Gonzalez
    // 1985; the diversity-sampling recipe coreset/active-learning
    // pipelines run over embedding corpora): seed with the smallest
    // id, then k−1 times select the point FARTHEST from the selected
    // set (max running min-distance, ties to the smaller id) — a
    // 2-approximation of the k-center optimum, and the anti-SemDeDup:
    // semdedup prunes what is too close, the coreset keeps what
    // spans. Each round is ONE map-only corpus pass — the running
    // dmin column folds in the newest center as a PLAN LITERAL (the
    // kmeans/BPE one-row-broadcast discipline; the selected set is a
    // bounded k×dim driver scalar at any corpus size) and the argmax
    // is a one-row mergeable aggregate; state is localCheckpointed
    // per round. Exact integer L2 end to end (the matryoshka
    // discipline), so selection order, distances, and the final
    // coverage radius (max dmin after the last pick — the k-center
    // objective value, emitted on every row) hash-verify against an
    // unrolled CTE chain generated from the same k.
    "q_sample_coreset" -> ((
      (s: SparkSession, d: String) => {
        graft.functions.VectorFunctions.register(s)
        val k = CoresetK
        val qv = t(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(CAST(round(" +
            "CAST(x AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE))").as("v"))
        val seed = qv.orderBy("vec_id").limit(1).head()
        val seedId = seed.getLong(0)
        def lits(vec: Seq[Double]) =
          vec.map(x => s"${x.toLong}D").mkString("array(", ", ", ")")
        var sel = Vector((seedId, 0L,
          seed.getSeq[Double](1).toSeq))
        var state = qv.withColumn("dmin",
          expr(s"CAST(vec_dot(v, v) + vec_dot(${lits(sel.head._3)}, " +
            s"${lits(sel.head._3)}) - 2 * vec_dot(v, " +
            s"${lits(sel.head._3)}) AS BIGINT)"))
          .localCheckpoint()
        for (_ <- 1 until k) {
          val far = state.filter(!col("vec_id").isInCollection(
              sel.map(_._1)))
            .agg(max(struct(col("dmin"), (-col("vec_id")).as("nid"))))
            .head().getStruct(0)
          val fid = -far.getLong(1)
          val fd = far.getLong(0)
          val fvec = qv.filter(col("vec_id") === fid).head()
            .getSeq[Double](1).toSeq
          sel = sel :+ ((fid, fd, fvec))
          val cl = lits(fvec)
          state = state.withColumn("dmin",
            least(col("dmin"), expr(s"CAST(vec_dot(v, v) + " +
              s"vec_dot($cl, $cl) - 2 * vec_dot(v, $cl) AS BIGINT)")))
            .localCheckpoint()
        }
        val radius = state.filter(!col("vec_id").isInCollection(
            sel.map(_._1)))
          .agg(max("dmin")).head().getLong(0)
        import s.implicits._
        sel.zipWithIndex
          .map { case ((id, d2, _), i) => (i.toLong, id, d2, radius) }
          .toDF("sel_order", "vec_id", "d2_at_selection", "radius")
          .orderBy("sel_order")
      },
      CoresetOracle)),

    // Matryoshka prefix-dimension evaluation (Kusupati et al. 2022) —
    // the operator behind "can we search the first 16 dims and keep
    // the index 4x smaller": for a probe slice, the exact nearest
    // neighbor under the FULL 64-dim metric vs the 16-dim PREFIX
    // metric, with per-probe agreement flags — the truncation-error
    // census a pipeline runs before committing to a prefix index.
    // Exact integer L2 over milli-quantized components (d² = ‖a‖² +
    // ‖b‖² − 2a·b, every operand < 2^53, so the codegen'd double dot
    // is exact and both engines order identically; cosine ordering
    // would need cross-multiplied squares that overflow 2^63 at this
    // quantization — L2 is the exact-orderable metric here, stated
    // deliberately); argmin via one mergeable min(struct) per metric,
    // both metrics in ONE aggregate over ONE broadcast-probe scoring
    // pass (the q_embed_cosine brute-force shape — the scale path for
    // the full metric is the ANN family, and the prefix metric rides
    // the same buckets with shorter vectors). Ties break toward the
    // smaller vec_id, so agreement is deterministic.
    // Distributed PCA — the embedding-pipeline op that feeds
    // whitening/OPQ/dim-reduction: ONE pass of the exact integer
    // centered-Gram aggregate (GramAgg — dim²/2 longs of state through
    // every exchange, never N·dim² exploded rows), a deterministic
    // cyclic-Jacobi eigensolve on the 64×64 scatter at the driver (the
    // codebook discipline: sequential double math, bit-stable), then
    // one map-only projection pass with the top-2 eigenvectors as
    // integer-e6 plan literals — p = Σ xq_i·ve_i − Σ μq_i·ve_i, every
    // product an integer < 2^31 so the double dot is EXACT and the
    // DuckDB twin (reading the eigenvector side-file, the PQ-candidate
    // protocol) reproduces it bit-for-bit. Sign fixed by
    // largest-|component|-positive so the eigenbasis is unique.
    // At 100 TB: Gram pass = 2080 madds/row map-side; projections
    // map-only; driver state dim² regardless of corpus.
    "q_embed_pca" -> ((
      (s: SparkSession, d: String) => {
        VectorFunctions.register(s)
        graft.functions.GramAgg.register(s)
        val e = qvec(s, d)
        val n = corpusRows(s, d)
        val mu: Array[Long] = e
          .select(posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("pos").agg(sum("x").as("sx")).collect()
          .sortBy(_.getInt(0)).map(r => halfUpDiv(r.getLong(1), n))
        val tri = e.agg(call_function("gram_agg", col("v"),
          typedlit(mu.toSeq)).as("g")).head().getSeq[Long](0).toArray
        val k = mu.length
        val cm = Array.ofDim[Double](k, k)
        var idx = 0
        for (i <- 0 until k; j <- i until k) {
          cm(i)(j) = tri(idx).toDouble; cm(j)(i) = tri(idx).toDouble
          idx += 1
        }
        val (vals, vecs) = jacobiEig(cm)
        val order = vals.zipWithIndex.sortBy(-_._1).map(_._2)
        def evecQ(r: Int): Array[Long] = {
          val c = Array.tabulate(k)(i => vecs(i)(order(r)))
          val m = c.indices.maxBy(i => (math.abs(c(i)), -i))
          val sgn = if (c(m) < 0) -1.0 else 1.0
          c.map(x => math.round(x * sgn * 1e6))
        }
        val e1 = evecQ(0)
        val e2 = evecQ(1)
        val side = s"${graft.Tables.scratchRoot}/graft_pca_${graft.Tables.dirTag(d)}"
        val rows = e1.zipWithIndex.map { case (x, p) => (0, p, x, mu(p)) } ++
          e2.zipWithIndex.map { case (x, p) => (1, p, x, mu(p)) }
        s.createDataFrame(rows.toSeq).toDF("pc", "pos", "ve", "mu")
          .coalesce(1).write.mode("overwrite").parquet(side)
        val c1 = e1.zip(mu).map { case (a, b) => a * b }.sum
        val c2 = e2.zip(mu).map { case (a, b) => a * b }.sum
        def arrLit(a: Array[Long]) =
          a.map(x => s"CAST($x AS DOUBLE)").mkString("array(", ",", ")")
        e.withColumn("vd", expr("transform(v, x -> CAST(x AS DOUBLE))"))
          .select(col("vec_id"),
            (expr(s"CAST(vec_dot(vd, ${arrLit(e1)}) AS BIGINT)") - lit(c1))
              .as("p1_q"),
            (expr(s"CAST(vec_dot(vd, ${arrLit(e2)}) AS BIGINT)") - lit(c2))
              .as("p2_q"))
          .orderBy("vec_id")
      },
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
         |  FROM embeddings),
         |side AS (SELECT * FROM read_parquet(
         |  '${graft.Tables.scratchRoot}/graft_pca_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')),
         |e1 AS (SELECT list(ve ORDER BY pos) AS ev,
         |         list(mu ORDER BY pos) AS m FROM side WHERE pc = 0),
         |e2 AS (SELECT list(ve ORDER BY pos) AS ev,
         |         list(mu ORDER BY pos) AS m FROM side WHERE pc = 1),
         |c AS (SELECT
         |  (SELECT CAST(list_sum(list_transform(range(1, 65),
         |     i -> m[i] * ev[i])) AS BIGINT) FROM e1) AS c1,
         |  (SELECT CAST(list_sum(list_transform(range(1, 65),
         |     i -> m[i] * ev[i])) AS BIGINT) FROM e2) AS c2)
         |SELECT q.vec_id,
         |  CAST(list_sum(list_transform(range(1, 65),
         |    i -> q.v[i] * e1.ev[i])) - c.c1 AS BIGINT) AS p1_q,
         |  CAST(list_sum(list_transform(range(1, 65),
         |    i -> q.v[i] * e2.ev[i])) - c.c2 AS BIGINT) AS p2_q
         |FROM q, e1, e2, c ORDER BY vec_id""".stripMargin)),

    "q_embed_matryoshka" -> ((
      (s: SparkSession, d: String) => {
        graft.functions.VectorFunctions.register(s)
        val qv = t(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(CAST(round(" +
            "CAST(x AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE))").as("v"))
          .withColumn("vp", expr("slice(v, 1, 16)"))
          .withColumn("n2", expr("CAST(vec_dot(v, v) AS BIGINT)"))
          .withColumn("np2", expr("CAST(vec_dot(vp, vp) AS BIGINT)"))
        // FIXED probe set (id-capped): the census probes are an
        // evaluation set, not the corpus — a %-only slice would grow
        // with the data and turn the scoring pass quadratic (measured
        // 3.1x per-row at 10x before the cap; linear after).
        val probes = qv.filter(col("vec_id") % 7 === 0 &&
            col("vec_id") < 500)
          .select(col("vec_id").as("pid"), col("v").as("pv"),
            col("vp").as("pvp"), col("n2").as("pn2"),
            col("np2").as("pnp2"))
        broadcast(probes).crossJoin(qv)
          .filter(col("vec_id") =!= col("pid"))
          .select(col("pid"), col("vec_id"),
            (col("pn2") + col("n2") -
              expr("CAST(2 * vec_dot(pv, v) AS BIGINT)")).as("d2_full"),
            (col("pnp2") + col("np2") -
              expr("CAST(2 * vec_dot(pvp, vp) AS BIGINT)")).as("d2_pre"))
          .groupBy("pid")
          .agg(
            min(struct(col("d2_full"), col("vec_id"))).as("mf"),
            min(struct(col("d2_pre"), col("vec_id"))).as("mp"))
          .select(col("pid"),
            col("mf").getField("vec_id").as("nn_full"),
            col("mf").getField("d2_full").as("d2_full"),
            col("mp").getField("vec_id").as("nn_prefix"),
            col("mp").getField("d2_pre").as("d2_prefix"),
            when(col("mf").getField("vec_id") ===
              col("mp").getField("vec_id"), lit(1L)).otherwise(lit(0L))
              .as("agree"))
          .orderBy("pid")
      },
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings),
        |w AS (SELECT vec_id, v, v[1:16] AS vp,
        |    CAST(list_inner_product(v, v) AS BIGINT) AS n2,
        |    CAST(list_inner_product(v[1:16], v[1:16]) AS BIGINT) AS np2
        |  FROM q),
        |pairs AS (SELECT p.vec_id AS pid, c.vec_id,
        |    p.n2 + c.n2 - CAST(2 * list_inner_product(p.v, c.v)
        |      AS BIGINT) AS d2_full,
        |    p.np2 + c.np2 - CAST(2 * list_inner_product(p.vp, c.vp)
        |      AS BIGINT) AS d2_pre
        |  FROM w p JOIN w c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id % 7 = 0 AND p.vec_id < 500),
        |rf AS (SELECT pid, vec_id, d2_full, row_number() OVER (
        |    PARTITION BY pid ORDER BY d2_full, vec_id) AS r
        |  FROM pairs),
        |rp AS (SELECT pid, vec_id, d2_pre, row_number() OVER (
        |    PARTITION BY pid ORDER BY d2_pre, vec_id) AS r
        |  FROM pairs)
        |SELECT rf.pid, rf.vec_id AS nn_full,
        |  CAST(rf.d2_full AS BIGINT) AS d2_full,
        |  rp.vec_id AS nn_prefix, CAST(rp.d2_pre AS BIGINT) AS d2_prefix,
        |  CAST(CASE WHEN rf.vec_id = rp.vec_id THEN 1 ELSE 0 END
        |    AS BIGINT) AS agree
        |FROM rf JOIN rp ON rf.pid = rp.pid AND rf.r = 1 AND rp.r = 1
        |ORDER BY rf.pid""".stripMargin)),

    "q_embed_cosine" -> ((
      (s: SparkSession, d: String) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val pairs = broadcast(q).crossJoin(e)
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cosraw",
            expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
          .select(col("qid"), col("vec_id").as("nid"), col("cosraw"))
        rankTopK(pairs)
      },
      rankSql(s"SELECT a.vec_id AS qid, b.vec_id AS nid FROM embeddings a, embeddings b WHERE a.vec_id < $NQ AND b.vec_id <> a.vec_id"))),

    // Hard-negative mining — the contrastive-training data op
    // (triplet/InfoNCE batches need, per anchor, the most-similar
    // vectors with a DIFFERENT label): same plan shape as
    // q_embed_cosine (one corpus scan, broadcast anchors, per-anchor
    // window top-k over the candidate pairs), with the label
    // inequality pushed into the pair filter so the window ranks only
    // genuine negatives. At corpus scale the anchor set is a training
    // batch (bounded, broadcastable) and the scan is the linear cost;
    // an IVF-probed variant would reuse q_embed_ivf's inverted lists
    // unchanged — mining is just ANN with a label predicate.
    "q_embed_hardneg" -> ((
      (s: SparkSession, d: String) => {
        VectorFunctions.register(s)
        // One scan carrying the label (not emb() + a label self-join).
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
        val q = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"), col("label").as("qlab"))
        val pairs = broadcast(q).crossJoin(e)
          .filter(col("label") =!= col("qlab"))
          .withColumn("cosraw",
            expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
          .select(col("qid"), col("vec_id").as("nid"), col("cosraw"))
        rankTopK(pairs)
      },
      rankSql(s"SELECT a.vec_id AS qid, b.vec_id AS nid FROM embeddings a, embeddings b WHERE a.vec_id < $NQ AND b.label <> a.label"))),

    // Index-quality evaluation — recall@k of every ANN index family
    // against the exact brute-force top-k, as a driver-checked census
    // (the GATE version of LshRecallSpec/PqRecallSpec's floors, and
    // the report an index-build pipeline publishes with each index
    // artifact). Deterministic end to end: planes/codebooks/centroids
    // are hash-derived, ties break by id, recall is integer percent —
    // so the number itself hashes, not just a floor boolean. The
    // candidate generators are the SAME plans the q_embed_* gates
    // ship (each rebuilt live here); the oracle recomputes exact
    // top-k and probes the gates' candidate side-files.
    "q_ann_recall" -> ((
      (s: SparkSession, d: String) => {
        val spark = s
        import spark.implicits._
        val e0 = emb(s, d)
        val exact = exactTopK(e0)
        // One-row aggregates per family (the sanctioned driver-scalar
        // class): hits = exact-top-k pairs surviving in the candidate
        // set. Collected inside each index's cache scope so the lazy
        // candidate lineage never replays uncached. Each family writes
        // its OWN candidate side-file at the verify SF (maybeSideFile)
        // so the oracle never depends on another gate having run or on
        // a previous code version's stale files.
        def hitsOf(fam: String, cand: DataFrame): Long =
          exact.join(
            maybeSideFile(s, d, cand.select("qid", "nid"),
              s"${graft.Tables.scratchRoot}/graft_cand_rec${fam}_${graft.Tables.dirTag(d)}"),
            Seq("qid", "nid"), "left_semi").count()
        val bits = bitsFor(corpusRows(s, d))
        // The five family censuses are INDEPENDENT jobs over two
        // shared read-only caches (the LSH bucket relation; the
        // normalized corpus) — overlap them on a small thread pool so
        // each family's scheduling tail back-fills the others' idle
        // executors instead of serializing five index builds
        // (sequential: ~4.5 s clean; overlapped: see PLANS.md r18).
        // Both caches are materialized BEFORE the fan-out so
        // concurrent builders share cached partitions rather than
        // racing to compute them. Job descriptions are thread-local,
        // so each family labels its own jobs.
        val e = emb(s, d).persist()
        val results: Seq[(String, Long)] = withBucketCache(
          withBuckets(e0, bits)) { b =>
          b.count()
          e.count()
          val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try {
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            val futs: Seq[(String, scala.concurrent.Future[Long])] = Seq(
              "lsh" -> Future(hitsOf("lsh", annCandPlan(b))),
              // Multi-probe over the SAME cached corpus buckets: only
              // the query side fans out (1+MProbe probes per table).
              "lsh_mp" -> Future(hitsOf("lshmp",
                lshMpCandPlan(e0, b, bits))),
              "ivf" -> Future(hitsOf("ivf", ivfCandPlan(s, e))),
              "pq" -> Future(hitsOf("pq", pqCandPlan(s, e))),
              "ivfpq" -> Future(hitsOf("ivfpq", ivfpqCandPlan(s, e))))
            // Generous finite bound (r19, VERDICT #9): a wedged family
            // census must fail the gate loudly, not hang it forever.
            // 15 min >> any family's worst clean build at bench scale.
            futs.map { case (f, fut) =>
              f -> Await.result(fut, Duration(15, "min")) }
          } finally {
            pool.shutdown()
            e.unpersist(blocking = true)
          }
        }
        val n = NQ.toLong * K
        results.sortBy(_._1)
          .map { case (f, h) => (f, h, n, h * 100L / n) }
          .toDF("family", "hits", "n_pairs", "recall_pct")
          .orderBy("family")
      },
      {
        def fam(name: String, path: String) =
          s"""SELECT '$name' AS family, CAST(count(*) AS BIGINT) AS hits
             |FROM topk t WHERE EXISTS (SELECT 1 FROM read_parquet(
             |  '${graft.Tables.scratchRoot}/graft_cand_rec${path}_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet') c
             |  WHERE c.qid = t.qid AND c.nid = t.nid)""".stripMargin
        s"""WITH pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid
           |    FROM embeddings a, embeddings b
           |    WHERE a.vec_id < $NQ AND b.vec_id <> a.vec_id),
           |e AS (SELECT vec_id, unnest(embedding) AS x,
           |        generate_subscripts(embedding, 1) AS pos
           |      FROM embeddings),
           |norms AS (SELECT vec_id,
           |    sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
           |  FROM e GROUP BY vec_id),
           |dots AS (
           |  SELECT p.qid, p.nid,
           |    sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
           |  FROM pairs p
           |  JOIN e a ON a.vec_id = p.qid
           |  JOIN e b ON b.vec_id = p.nid AND b.pos = a.pos
           |  GROUP BY 1, 2),
           |ranked AS (
           |  SELECT d.qid, d.nid,
           |    row_number() OVER (PARTITION BY d.qid
           |      ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.nid) AS rn
           |  FROM dots d
           |  JOIN norms nq ON nq.vec_id = d.qid
           |  JOIN norms nc ON nc.vec_id = d.nid),
           |topk AS (SELECT qid, nid FROM ranked WHERE rn <= $K),
           |rec AS (${fam("ivf", "ivf")}
           |  UNION ALL ${fam("ivfpq", "ivfpq")}
           |  UNION ALL ${fam("lsh", "lsh")}
           |  UNION ALL ${fam("lsh_mp", "lshmp")}
           |  UNION ALL ${fam("pq", "pq")})
           |SELECT family, hits, CAST(${NQ.toLong * K} AS BIGINT) AS n_pairs,
           |  CAST(hits * 100 // ${NQ.toLong * K} AS BIGINT) AS recall_pct
           |FROM rec ORDER BY family""".stripMargin
      })),

    // LSH-bucketed ANN: candidates from bucket equality joins, exact
    // re-rank on candidates only. Oracle re-ranks the same candidates.
    "q_embed_ann" -> ((
      (s: SparkSession, d: String) =>
        annResult(s, d, s"${graft.Tables.scratchRoot}/graft_cand_ann_${graft.Tables.dirTag(d)}")
          .orderBy("qid", "rn"),
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_ann_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // Multi-probe LSH ANN — q_embed_ann with the query side probing
    // the base bucket PLUS the MProbe nearest-plane flips per table
    // (Lv et al., VLDB'07): recall@5 4% -> 36% at sf0.01 (q_ann_recall
    // census) at unchanged index build/storage cost — only the bounded
    // query fan-out grows (T·(1+m) bucket lookups per query). Same
    // exact re-rank on candidates; oracle re-ranks the same side-file.
    "q_embed_ann_mp" -> ((
      (s: SparkSession, d: String) => {
        val e0 = emb(s, d)
        val bits = bitsFor(corpusRows(s, d))
        val candPath =
          s"${graft.Tables.scratchRoot}/graft_cand_annmp_${graft.Tables.dirTag(d)}"
        withBucketCache(withBuckets(e0, bits)) { b =>
          materialized(s,
            rankTopK(cosineFor(s, d,
              maybeSideFile(s, d, lshMpCandPlan(e0, b, bits), candPath))),
            candPath + "_res")
        }.orderBy("qid", "rn")
      },
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_annmp_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // Incremental ANN — the vector twin of q_dedup_minhash_inc: a NEW
    // batch of embeddings (vec_id % 4 == 3) is similarity-probed
    // against the previous snapshot's PERSISTED LSH bucket index; the
    // accumulated corpus is never re-bucketed (plan-gated: the base
    // enters as a parquet scan of the index, exactly one plane-
    // projection bucket build exists — the batch's). Exact cosine
    // re-rank on candidates with size-based join planning (the batch
    // side is corpus-scaled, unlike the fixed-probe ANN queries).
    // Oracle re-ranks the same candidate set.
    "q_embed_ann_inc" -> ((
      (s: SparkSession, d: String) => {
        val cand = maybeSideFile(s, d, incAnnCandidateProbe(s, d),
          s"${graft.Tables.scratchRoot}/graft_cand_anninc_${graft.Tables.dirTag(d)}")
        rankCandidates(s, d, cand).orderBy("qid", "rn")
      },
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_anninc_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // IVF-style ANN: k-means-refined nearest-centroid inverted lists,
    // multi-probe, exact re-rank on the probed lists only.
    "q_embed_ivf" -> ((
      (s: SparkSession, d: String) =>
        ivfResult(s, d, s"${graft.Tables.scratchRoot}/graft_cand_ivf_${graft.Tables.dirTag(d)}")
          .orderBy("qid", "rn"),
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_ivf_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // Product-quantization ANN: per-subspace codebooks, map-side
    // encoding, broadcast ADC table scoring, exact re-rank on the
    // shortlist. Oracle re-ranks the same shortlist.
    "q_embed_pq" -> ((
      (s: SparkSession, d: String) =>
        pqResult(s, d, s"${graft.Tables.scratchRoot}/graft_cand_pq_${graft.Tables.dirTag(d)}")
          .orderBy("qid", "rn"),
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_pq_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // IVF+PQ composite ANN (FAISS IndexIVFPQ): coarse lists prune the
    // candidate domain, PQ codes ADC-score only the probed lists'
    // members, shortlist re-ranked exact. Oracle re-ranks the same
    // shortlist; the composite recall floor is pinned in PqRecallSpec.
    "q_embed_ivfpq" -> ((
      (s: SparkSession, d: String) =>
        ivfpqResult(s, d, s"${graft.Tables.scratchRoot}/graft_cand_ivfpq_${graft.Tables.dirTag(d)}")
          .orderBy("qid", "rn"),
      rankSql(s"SELECT DISTINCT qid, nid FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_ivfpq_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')"))),

    // Embedding near-duplicate pairs: LSH buckets corpus-wide, exact
    // cosine threshold on candidates. Oracle re-verifies the candidates.
    "q_embed_dup" -> ((
      (s: SparkSession, d: String) =>
        dupResult(s, d, s"${graft.Tables.scratchRoot}/graft_cand_embdup_${graft.Tables.dirTag(d)}")
          .orderBy("vec_a", "vec_b"),
      s"""WITH pairs AS (SELECT DISTINCT qid, nid
         |  FROM read_parquet('${graft.Tables.scratchRoot}/graft_cand_embdup_${graft.Tables.dirTag(graft.Tables.VerifySfDir)}/*.parquet')),
         |e AS (SELECT vec_id, unnest(embedding) AS x,
         |        generate_subscripts(embedding, 1) AS pos FROM embeddings),
         |norms AS (SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
         |          FROM e GROUP BY vec_id),
         |dots AS (
         |  SELECT p.qid, p.nid, sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
         |  FROM pairs p
         |  JOIN e a ON a.vec_id = p.qid
         |  JOIN e b ON b.vec_id = p.nid AND b.pos = a.pos
         |  GROUP BY 1, 2)
         |SELECT d.qid AS vec_a, d.nid AS vec_b,
         |  round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
         |FROM dots d
         |JOIN norms na ON na.vec_id = d.qid
         |JOIN norms nb ON nb.vec_id = d.nid
         |WHERE d.dot / (na.nrm * nb.nrm) >= $DupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin)),

    // Reciprocal-rank fusion — the standard hybrid-search combiner
    // (lexical ∪ vector retrieval): each leg produces a top-50 ranking,
    // fused as Σ 1/(60 + rank) over the legs that returned the item
    // (Cormack et al.'s RRF with the conventional k = 60). Lexical leg:
    // query-term hit count (integer, tie-broken by doc_id — no float
    // ranking); vector leg: exact cosine to probe vec 0 (the
    // q_embed_cosine precedent). Both legs end in orderBy+limit —
    // TakeOrderedAndProject, per-partition heads — so the fusion joins
    // two ≤50-row lists: a full-outer broadcast-able join no matter the
    // corpus size. At 100 TB the legs would be this module's ANN
    // shortlist (q_embed_ann/ivf/pq) and q_text_bm25's inverted-index
    // head — the fusion stage is unchanged. Determinism: ranks are
    // integers; 1.0/(60.0 + rank) is one exact-input IEEE division and
    // the two-term sum has fixed textual order in both engines.
    // Grid-cell radius join — the 2-D spatial neighborhood join (the
    // planar member of the bounded-candidate join family: band join =
    // 1-D, interval join = ranges, this = points within distance r).
    // Points land in r-sized grid cells; the probe side explodes each
    // point to its 3x3 cell neighborhood MAP-SIDE (one Generate, 9
    // rows/point) and equi-joins the home-cell side on (cx, cy) — a
    // hash join whose fan-in per cell is bounded by local point
    // density, never an all-pairs theta join (plan-gated). A candidate
    // (a, b) arises exactly once (b's home cell is unique among a's 9
    // probes), so no dedup pass is needed; the exact L2 test is an
    // in-row integer filter (quantized coords, r² compare — the
    // established round(x*1000) discipline both engines share).
    // Oracle: the definitionally-independent O(n²) distance scan.
    // At 100 TB: cells partition the plane, the exchange carries 9x
    // the points, and skewed (dense) cells AQE-split — the same
    // posture as the LSH bucket joins.
    "q_join_grid" -> ((
      (s: SparkSession, d: String) => {
        val R = 50L // radius in integer milli-units; cell edge = R
        def pts: DataFrame = t(s, d, "embeddings").select(col("vec_id"),
          expr("CAST(round(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT)")
            .as("x"),
          expr("CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)")
            .as("y"))
        def withCells(df: DataFrame): DataFrame = df
          .withColumn("cx",
            expr(s"CAST(floor(x / $R.0) AS BIGINT)"))
          .withColumn("cy",
            expr(s"CAST(floor(y / $R.0) AS BIGINT)"))
        val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
        val probe = withCells(pts)
          .select(col("vec_id").as("aid"), col("x").as("ax"),
            col("y").as("ay"), col("cx"), col("cy"))
          .withColumn("o", explode(offsets))
          .select(col("aid"), col("ax"), col("ay"),
            (col("cx") + col("o.dx")).as("jx"),
            (col("cy") + col("o.dy")).as("jy"))
        val home = withCells(pts)
          .select(col("vec_id").as("bid"), col("x").as("bx"),
            col("y").as("by"), col("cx").as("jx"), col("cy").as("jy"))
        val nbr = probe.join(home, Seq("jx", "jy"))
          .filter(col("aid") =!= col("bid") &&
            (col("ax") - col("bx")) * (col("ax") - col("bx")) +
              (col("ay") - col("by")) * (col("ay") - col("by")) <= R * R)
          .groupBy(col("aid")).agg(count(lit(1)).as("c"))
        val p0 = pts
        p0.join(nbr, p0("vec_id") === nbr("aid"), "left")
          .select(col("vec_id"), col("x"), col("y"),
            coalesce(col("c"), lit(0L)).as("n_nbr"))
          .orderBy("vec_id")
      },
      """WITH p AS (SELECT vec_id,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x,
        |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS y
        |  FROM embeddings),
        |n AS (SELECT a.vec_id, CAST(count(*) AS BIGINT) AS c
        |  FROM p a JOIN p b ON b.vec_id <> a.vec_id
        |    AND (a.x - b.x) * (a.x - b.x)
        |      + (a.y - b.y) * (a.y - b.y) <= 2500
        |  GROUP BY 1)
        |SELECT p.vec_id, p.x, p.y,
        |  CAST(COALESCE(n.c, 0) AS BIGINT) AS n_nbr
        |FROM p LEFT JOIN n USING (vec_id) ORDER BY vec_id""".stripMargin)),

    "q_rank_fusion" -> ((
      (s: SparkSession, d: String) => {
        // Lexical leg scores query 1 of the SAME workload relation the
        // BM25 gates use (TextQueries.RetrievalQueries) — one shared
        // query table feeds lexical, vector, and fusion stages.
        val terms = TextQueries.RetrievalQueries.head._2
        val topN = 50
        val hits = t(s, d, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        val lex = hits
          .orderBy(col("hits").desc, col("doc_id")).limit(topN)
          .withColumn("lex_rank", row_number().over(
            Window.orderBy(col("hits").desc, col("doc_id"))))
          .select(col("doc_id"), col("lex_rank"))
        val e = emb(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("nrm").as("qn"))
        val vec = broadcast(q).crossJoin(e.filter(col("vec_id") =!= 0))
          .withColumn("cosraw",
            expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
          .orderBy(col("cosraw").desc, col("vec_id")).limit(topN)
          .withColumn("vec_rank", row_number().over(
            Window.orderBy(col("cosraw").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("vec_rank"))
        val rrf =
          coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .withColumn("rrfraw", rrf)
          .orderBy(col("rrfraw").desc, col("doc_id")).limit(20)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("rrfraw").desc, col("doc_id"))))
          .select(col("doc_id"), col("rn"), col("lex_rank"),
            col("vec_rank"), round(col("rrfraw"), 6).as("rrf"))
          .orderBy("rn")
      },
      """WITH hits AS (
        |  SELECT doc_id, count(*) AS hits FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  WHERE term IN ('vector', 'stream', 'merge') GROUP BY 1),
        |lex AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY hits DESC, doc_id) AS INT)
        |      AS lex_rank
        |  FROM hits
        |  ORDER BY hits DESC, doc_id LIMIT 50),
        |e AS (SELECT vec_id, unnest(embedding) AS x,
        |        generate_subscripts(embedding, 1) AS pos FROM embeddings),
        |norms AS (SELECT vec_id,
        |    sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
        |  FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT b.vec_id AS nid,
        |    sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
        |  FROM e a JOIN e b ON b.pos = a.pos
        |  WHERE a.vec_id = 0 AND b.vec_id <> 0 GROUP BY 1),
        |cosv AS (
        |  SELECT d.nid, d.dot / (nq.nrm * nb.nrm) AS cosraw
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = 0
        |  JOIN norms nb ON nb.vec_id = d.nid),
        |vec AS (
        |  SELECT nid AS doc_id,
        |    CAST(row_number() OVER (ORDER BY cosraw DESC, nid) AS INT)
        |      AS vec_rank
        |  FROM cosv
        |  ORDER BY cosraw DESC, nid LIMIT 50),
        |f AS (
        |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |    l.lex_rank, v.vec_rank,
        |    COALESCE(1.0 / (60.0 + l.lex_rank), 0.0)
        |    + COALESCE(1.0 / (60.0 + v.vec_rank), 0.0) AS rrfraw
        |  FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id),
        |r AS (
        |  SELECT doc_id, lex_rank, vec_rank, rrfraw,
        |    CAST(row_number() OVER (ORDER BY rrfraw DESC, doc_id) AS INT)
        |      AS rn
        |  FROM f ORDER BY rrfraw DESC, doc_id LIMIT 20)
        |SELECT doc_id, rn, lex_rank, vec_rank,
        |  round(rrfraw, 6) AS rrf
        |FROM r ORDER BY rn""".stripMargin)),

    // Int8 scalar quantization (the FAISS SQ8 protocol): per-dimension
    // affine codes q = clamp(floor((x - min_d)/scale_d + 0.5), 0, 255)
    // with scale_d = (max_d - min_d)/255. Scale shape: the stats pass is
    // one partial-aggregating groupBy over dim (64 groups — a
    // dimension-sized exchange at any corpus size); the 64 (min, scale)
    // pairs are a bounded driver collect (the k-means/PQ training-sample
    // protocol) re-broadcast as literals into a MAP-ONLY encode — at
    // 100 TB the codes (64 B/vector, 4x compression here, fp32->int8)
    // write straight back as a binary column with no further exchange.
    // The gate emits three exact-integer checksums per vector (Σq, Σq²,
    // Σq·pos — position-weighted so permuted codes can't alias) instead
    // of a float reconstruction error: integer sums are associative, so
    // no engine's partial-agg order can wobble an ulp. floor(r + 0.5) is
    // used instead of round() because Spark rounds HALF_UP while DuckDB
    // rounds half-away-from-zero through a different path — floor is
    // defined identically everywhere.
    "q_embed_quantize" -> ((
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        val stats = e
          .select(posexplode(col("v")).as(Seq("pos0", "x")))
          .groupBy("pos0").agg(min("x").as("mn"), max("x").as("mx"))
          .orderBy("pos0").collect()
        val mins = stats.map(_.getDouble(1))
        val scales = stats.map(r =>
          if (r.getDouble(2) == r.getDouble(1)) 0.0
          else (r.getDouble(2) - r.getDouble(1)) / 255.0)
        val minsArr = s"array(${mins.mkString("d,")}d)"
        val scalesArr = s"array(${scales.mkString("d,")}d)"
        e.withColumn("q", expr(
          s"""transform(sequence(1, size(v)), i ->
             |  greatest(least(CAST(floor(
             |    CASE WHEN element_at($scalesArr, i) = 0.0d THEN 0.0d
             |         ELSE (element_at(v, i) - element_at($minsArr, i))
             |              / element_at($scalesArr, i) + 0.5d END)
             |    AS BIGINT), CAST(255 AS BIGINT)), CAST(0 AS BIGINT)))
             |""".stripMargin))
          .select(col("vec_id"),
            expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)")
              .as("qsum"),
            expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)")
              .as("qsumsq"),
            expr("""aggregate(zip_with(q, sequence(1, size(q)),
                |  (x, i) -> x * CAST(i AS BIGINT)),
                |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
              .as("qposhash"))
          .orderBy("vec_id")
      },
      """WITH e AS (
        |  SELECT vec_id, CAST(x AS DOUBLE) AS x, pos FROM (
        |    SELECT vec_id, unnest(embedding) AS x,
        |      generate_subscripts(embedding, 1) AS pos FROM embeddings)),
        |stats AS (
        |  SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY pos),
        |s2 AS (
        |  SELECT pos, mn,
        |    CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END AS sc
        |  FROM stats),
        |q AS (
        |  SELECT e.vec_id, e.pos,
        |    greatest(least(CAST(floor(
        |      CASE WHEN s2.sc = 0.0 THEN 0.0
        |           ELSE (e.x - s2.mn) / s2.sc + 0.5 END)
        |      AS BIGINT), 255), 0) AS q
        |  FROM e JOIN s2 USING (pos))
        |SELECT vec_id,
        |  CAST(sum(q) AS BIGINT) AS qsum,
        |  CAST(sum(q * q) AS BIGINT) AS qsumsq,
        |  CAST(sum(q * pos) AS BIGINT) AS qposhash
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin))
  )
}
