package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * q_embed_cosine — brute-force cosine top-k for a small query set: the
  * query side is broadcast, the corpus side streams once; dot products
  * run inside codegen via zip_with/aggregate (no UDF). This is the
  * correctness baseline: per-query cost is one corpus scan.
  *
  * q_embed_ann — the scale path: random-hyperplane LSH. Each vector
  * hashes to one bucket per hash table; candidates are same-bucket
  * equality-join matches (hash join, never a cartesian), then exact
  * cosine re-ranking on the candidate set only. The oracle re-ranks the
  * same candidate set (written to a side parquet) relationally — the
  * bucketing is seed-specific, the cosine math is engine-independent.
  */
object VectorQueries {

  import CoreQueries.Q

  private val K = 5
  private val NQ = 5 // query vectors: vec_id < NQ

  private def sfTag(d: String): String = d.stripSuffix("/").split('/').last

  /** embeddings with double-cast vector and L2 norm. */
  private def emb(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))

  private val dotQV: Column =
    expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (a, e) -> a + e)")

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
      .withColumn("cosraw", dotQV / (col("qn") * col("nrm")))
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
  private val bitsPerTable = 8
  private val dim = 64

  private lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(numTables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  private def planeCol(p: Array[Double]): Column =
    array(p.map(lit(_)): _*)

  /** bucket value for one hash table: sign bits of plane dot products. */
  private def bucketCol(tbl: Int): Column =
    (0 until bitsPerTable).map { j =>
      val dot = expr(
        s"aggregate(zip_with(v, pl_${tbl}_$j, (x, p) -> x * p), 0D, (a, e) -> a + e)")
      when(dot >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  private def withBuckets(e: DataFrame): DataFrame = {
    val withPlanes = (0 until numTables).foldLeft(e) { (df, t0) =>
      (0 until bitsPerTable).foldLeft(df) { (df2, j) =>
        df2.withColumn(s"pl_${t0}_$j", planeCol(planes(t0)(j)))
      }
    }
    val bucketStructs = (0 until numTables).map(t0 =>
      struct(lit(t0).as("tbl"), bucketCol(t0).as("bkt")))
    withPlanes
      .select(col("vec_id"), explode(array(bucketStructs: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
  }

  private def annCandidates(s: SparkSession, d: String): DataFrame = {
    val buckets = withBuckets(emb(s, d))
    val q = buckets.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("tbl"), col("bkt"))
    val c = buckets.select(col("vec_id").as("nid"), col("tbl"), col("bkt"))
    broadcast(q).join(c, Seq("tbl", "bkt"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
  }

  val entries: Map[String, (Q, String)] = Map(

    // Brute-force exact cosine top-k (baseline).
    "q_embed_cosine" -> ((
      (s: SparkSession, d: String) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val pairs = broadcast(q).crossJoin(e)
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cosraw", dotQV / (col("qn") * col("nrm")))
          .select(col("qid"), col("vec_id").as("nid"), col("cosraw"))
        rankTopK(pairs)
      },
      rankSql(s"SELECT a.vec_id AS qid, b.vec_id AS nid FROM embeddings a, embeddings b WHERE a.vec_id < $NQ AND b.vec_id <> a.vec_id"))),

    // LSH-bucketed ANN: candidates from bucket equality joins, exact
    // re-rank on candidates only. Oracle re-ranks the same candidates.
    "q_embed_ann" -> ((
      (s: SparkSession, d: String) => {
        val path = s"/tmp/graft_cand_ann_${sfTag(d)}"
        annCandidates(s, d).write.mode("overwrite").parquet(path)
        rankTopK(cosineFor(s, d, s.read.parquet(path)))
      },
      rankSql("SELECT DISTINCT qid, nid FROM read_parquet('/tmp/graft_cand_ann_sf0.01/*.parquet')")))
  )
}
