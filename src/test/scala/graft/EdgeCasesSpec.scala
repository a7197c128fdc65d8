package graft

import graft.ingest.Flatten
import graft.streaming.BatchStream
import graft.sources.GraphSource

/** Degenerate-input behavior: empty streams, empty graphs, short
  * documents — operators must return empty results, not throw. */
class EdgeCasesSpec extends SparkSpecBase {

  import ModelFixture.fixture

  private def emptyEnvelopes = {
    import spark.implicits._
    // Schema-bearing but row-free envelope frame.
    spark.read.json(spark.createDataset(Seq(
      """{"type":"node","id":"x","reported":{"kind":"some_instance","id":"x"},
         "ancestors":{"cloud":{"reported":{"id":"c"}}}}""",
      """{"type":"edge","from":"a","to":"b"}""").map(_.replaceAll("\n\\s*", " "))))
      .filter("false")
  }

  test("flatten of an empty envelope frame is empty with full schema") {
    val out = Flatten.flattenNodes(emptyEnvelopes,
      fixture("some_instance"), fixture)
    assert(out.count() == 0)
    assert(out.columns.length == 11)
    assert(Flatten.flattenEdges(emptyEnvelopes).count() == 0)
  }

  test("graph search over an empty graph returns no nodes") {
    val out = GraphSource.evaluate(emptyEnvelopes,
      GraphSource.Search("graph_root", minDepth = Some(2)), maxDepth = 3)
    assert(out.count() == 0)
  }

  test("q_approx_distinct sketch stays within 3x its configured rsd") {
    // The gate's hash-verified booleans assert the sketch-vs-exact
    // bound at the driver's verify SF; re-assert at THIS sf too (a
    // bound that only holds at one scale is a fixture coincidence) and
    // pin the output contract the oracle's TRUE literals rely on.
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_in_bound"),
        s"parts estimate out of 3x-rsd bound for ${r.getString(0)}")
      assert(r.getAs[Boolean]("supps_in_bound"),
        s"supps estimate out of 3x-rsd bound for ${r.getString(0)}")
      assert(r.getAs[Long]("exact_parts") > 0)
    }
  }

  test("q_agg_approx_quantile sketch honors its rank-error guarantee") {
    // The gate emits rank-bound booleans (the published n/accuracy
    // guarantee); assert them at this sf too, plus the tighter VALUE
    // bound on l_quantity's dense integer domain: the sketch value
    // must land within 2 units of exact PERCENTILE_DISC.
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_agg_approx_quantile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("q25_ok") && r.getAs[Boolean]("q50_ok") &&
        r.getAs[Boolean]("q90_ok"),
        s"rank bound violated for ${r.getString(0)}: $r")
    }
    import org.apache.spark.sql.functions._
    val approx = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.9)), lit(1000)).as("qs"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1)).toMap
    val exact = graft.functions.Quantiles.discrete(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        "l_returnflag", "l_quantity",
        Seq("q25" -> 0.25, "q50" -> 0.5, "q90" -> 0.9))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        Seq(r.getAs[Double]("q25"), r.getAs[Double]("q50"),
          r.getAs[Double]("q90"))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((k, av) <- approx; (a, e) <- av.zip(exact(k)))
      assert(math.abs(a - e) <= 2.0, s"group $k: approx $a vs exact $e")
  }

  test("KLL sketch honors its rank-error bound across arbitrary merge splits") {
    // Direct state-level pin of the deterministic compactor guarantee
    // (error ≤ n·H/k, H = ceil(log2(2n/k))): a known multiset split
    // three different ways, partial sketches merged, every percentile
    // estimate's TRUE rank within the bound — plus the far tighter n/8
    // audit bound the q_agg_kll_rollup gate relies on.
    import graft.functions.KllState
    val k = 256
    val n = 50000
    val rnd = new scala.util.Random(7)
    // Skewed values over a huge domain — the shape histograms can't do.
    val xs = Array.fill(n)(if (rnd.nextBoolean()) rnd.nextLong(1000L)
      else rnd.nextLong(Long.MaxValue))
    val sorted = xs.sorted
    def rankOf(v: Long): (Int, Int) = {
      var lt = 0; var le = 0
      sorted.foreach { x => if (x < v) lt += 1; if (x <= v) le += 1 }
      (lt, le)
    }
    val h = math.ceil(math.log(2.0 * n / k) / math.log(2.0)).toInt
    val bound = math.min(n.toLong * h / k, n / 8L) + 16L
    Seq(1, 7, 64).foreach { parts =>
      val sks = xs.grouped(math.max(1, n / parts)).map { chunk =>
        val st = new KllState(k)
        chunk.foreach(st.add)
        st
      }.toSeq
      val merged = sks.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.n == n)
      var prev = Long.MinValue
      Seq(10, 50, 90, 99).foreach { p =>
        val est = merged.quantile(p)
        assert(est >= prev, s"parts=$parts: quantiles not monotone")
        prev = est
        val (lt, le) = rankOf(est)
        val target = (n.toLong * p + 99L) / 100L
        assert(lt <= target + bound && le >= target - bound,
          s"parts=$parts p=$p: rank [$lt,$le] vs target $target ± $bound")
      }
      // Serialization round-trip preserves the summary exactly.
      val rt = KllState.deserialize(merged.serialize())
      assert(rt.quantile(50) == merged.quantile(50))
    }
  }

  test("KLL covers DOUBLE measures via the sortable-bits mapping") {
    import graft.functions.KllSketch._
    // The mapping is an order-preserving involution on mixed signs.
    val probes = Seq(-1.0e300, -42.5, -1.0e-300, -0.0, 0.0, 1.0e-300,
      3.14, 7.0e250, Double.MinValue, Double.MaxValue,
      Double.NegativeInfinity, Double.PositiveInfinity)
    for (a <- probes; b <- probes) {
      assert(sortableLongToDouble(doubleToSortableLong(a)) == a ||
        (a == 0.0 && sortableLongToDouble(doubleToSortableLong(a)) == 0.0))
      if (a < b)
        assert(doubleToSortableLong(a) < doubleToSortableLong(b),
          s"order broken: $a vs $b")
    }
    // Rank bound holds end-to-end on a mixed-sign double fixture
    // through the SQL surface (kll_agg on DOUBLE + kll_quantile_dbl).
    graft.functions.KllSketch.register(spark)
    val rnd = new scala.util.Random(11)
    val n = 20000
    val xs = Array.fill(n)(
      (if (rnd.nextBoolean()) -1.0 else 1.0) * math.exp(rnd.nextGaussian() * 40.0))
    import spark.implicits._
    val est = xs.toSeq.toDF("x")
      .agg(org.apache.spark.sql.functions.expr("kll_agg(x, 256)").as("sk"))
      .select(
        org.apache.spark.sql.functions.expr("kll_quantile_dbl(sk, 10)").as("e10"),
        org.apache.spark.sql.functions.expr("kll_quantile_dbl(sk, 50)").as("e50"),
        org.apache.spark.sql.functions.expr("kll_quantile_dbl(sk, 90)").as("e90"))
      .collect().head
    val sorted = xs.sorted
    val h = math.ceil(math.log(2.0 * n / 256) / math.log(2.0)).toInt
    val bound = n.toLong * h / 256 + 16L
    Seq(10 -> est.getDouble(0), 50 -> est.getDouble(1),
      90 -> est.getDouble(2)).foreach { case (p, e) =>
      val lt = sorted.count(_ < e); val le = sorted.count(_ <= e)
      val target = (n.toLong * p + 99L) / 100L
      assert(lt <= target + bound && le >= target - bound,
        s"double p=$p: rank [$lt,$le] vs target $target ± $bound")
    }
  }

  test("kll_agg rejects a mistyped column at ANALYSIS time, not mid-task") {
    // An INT measure must fail fast on the driver with the expression
    // named (checkInputDataTypes), not surface as an opaque executor
    // task failure on the first update (r13 advisor finding).
    graft.functions.KllSketch.register(spark)
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x") // IntegerType, not BIGINT
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(org.apache.spark.sql.functions.expr("kll_agg(x, 256)"))
        .queryExecution.analyzed
    }
    assert(e.getMessage.contains("kll_agg") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }

  test("q_agg_kll_rollup booleans hold at another sf") {
    val rows = SparkEntry.queries("q_agg_kll_rollup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("q50_ok") && r.getAs[Boolean]("q90_ok"),
        s"rank bound violated: $r")
    }
  }

  test("q_topk_sketch two-pass protocol returns the exact heavy-hitter set") {
    // The MG guarantee (err <= N/(k+1), k=256) makes every token with
    // true freq > N/100 a surviving candidate; pass 2 exact-counts the
    // candidates. Cross-check against a direct exact wordcount at this
    // sf: the sets and counts must agree exactly.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_topk_sketch")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val want = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100L > lit(total))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty,
      s"got=${got.size} want=${want.size}")
  }

  test("mg_topk heavy hitters survive overflow and merges within N/k error") {
    // The q_topk_sketch gate is rows-only by design (tail survivors are
    // stream-order dependent) — bound the sketch here on a stream that
    // actually overflows k and forces partial merges: 5 heavy items
    // (1000 each) hidden in 10k distinct singletons, k=64, spread over
    // 16 partitions. MG guarantees est <= true and true - est <= N/k;
    // with N=15000, N/k=234, every heavy item's estimate stays >= 766
    // while any singleton's est <= 1, so the top-5 must be exactly the
    // heavy set in order.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.TopKSketch.register(spark)
    val heavy = (1 to 5).flatMap(h => Seq.fill(1000)(s"heavy_$h"))
    val tail = (1 to 10000).map(i => s"tail_$i")
    val n = heavy.size + tail.size
    val k = 64
    val out = new scala.util.Random(42).shuffle(heavy ++ tail).toDF("tok")
      .repartition(16)
      .agg(expr(s"mg_topk(tok, $k, 5)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.map(_._1).sorted.toSeq ==
      (1 to 5).map(h => s"heavy_$h"), out.toSeq.toString)
    out.foreach { case (item, est) =>
      assert(est <= 1000L, s"$item overestimated: $est")
      assert(1000L - est <= n.toLong / k, s"$item est $est below bound")
    }
  }

  test("mg_merge of persisted per-source summaries keeps the two-level N/k bound") {
    // q_topk_rollup's protocol: level 1 builds one <=k summary per
    // source (mg_topk with outK=k — the FULL summary, the persisted
    // partial), level 2 folds ONLY the summaries via mg_merge. The
    // mergeable-summaries rule is associative, so the composed error
    // stays <= N/(k+1) across the two levels: every item with true
    // freq > N/(k+1) must survive into the merged candidate set with
    // est <= true. Asserted on a stream that overflows k within every
    // source, split across 7 sources round-robin (uncorrelated with
    // item identity).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.TopKSketch.register(spark)
    val heavy = (1 to 5).flatMap(h => Seq.fill(1000)(s"heavy_$h"))
    val tail = (1 to 10000).map(i => s"tail_$i")
    val n = heavy.size + tail.size
    val k = 64
    val rows = new scala.util.Random(7).shuffle(heavy ++ tail).zipWithIndex
      .map { case (tok, i) => (s"src${i % 7}", tok) }
    val merged = rows.toDF("source", "tok")
      .repartition(16)
      .groupBy("source")
      .agg(expr(s"mg_topk(tok, $k, $k)").as("hh"))
      .agg(expr(s"mg_merge(hh, $k, $k)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 5).foreach { h =>
      val est = merged.getOrElse(s"heavy_$h", 0L)
      assert(est <= 1000L, s"heavy_$h overestimated: $est")
      assert(1000L - est <= n.toLong / k,
        s"heavy_$h est $est breaks the two-level bound")
    }
  }

  test("q_chunk_sliding covers every token with the spec'd overlap") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val chunks = SparkEntry.queries("q_chunk_sliding")(spark, dir)
      .select("doc_id", "chunk_id", "start_tok", "end_tok", "chunk_tokens")
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty && chunks.keySet == nTok.keySet)
    for ((doc, rows) <- chunks) {
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      // Starts advance by exactly the stride; first chunk starts at 0.
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") -
            a.getAs[Long]("start_tok") == 96L)
        case _ =>
      }
      // Every chunk spans min(window, n_tok - start) tokens — clipped at
      // the document end — and the last chunk reaches it. Together with
      // stride < window this covers every token at least once, with
      // 32-token overlap between full-window neighbors.
      assert(sorted.last.getAs[Long]("end_tok") == nTok(doc))
      sorted.foreach { r =>
        val start = r.getAs[Long]("start_tok")
        assert(r.getAs[Long]("end_tok") ==
          math.min(start + 128L, nTok(doc)))
        assert(r.getAs[Long]("chunk_tokens") ==
          r.getAs[Long]("end_tok") - start)
        assert(r.getAs[Long]("chunk_tokens") > 0L)
      }
    }
  }

  test("incremental dedup apply equals full dedup of the union") {
    // The defining invariant of cross-snapshot incremental dedup: the
    // rows accepted against the persisted index, appended to the
    // deduped base, must equal a from-scratch dedup of base ∪ batch.
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val accepted = queries.TextQueries.incrementalDedupPlan(spark, dir).count()
    val baseDistinct = docs.filter(col("doc_id") % 4 =!= 3)
      .select("text").distinct().count()
    val unionDistinct = docs.select("text").distinct().count()
    assert(unionDistinct == baseDistinct + accepted,
      s"union=$unionDistinct base=$baseDistinct accepted=$accepted")
  }

  test("incremental ANN probes batch-vs-base only, ranked and bounded") {
    // Partition correctness: every reported neighbor pair crosses the
    // batch/base boundary (qid from the new batch, nid from the base);
    // ranks are 1..K dense per qid in descending-cosine order; and a
    // second run is bit-identical (the persisted index + deterministic
    // planes leave nothing run-dependent).
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val run1 = SparkEntry.queries("q_embed_ann_inc")(spark, dir).collect()
    assert(run1.nonEmpty)
    assert(run1.forall(r => r.getLong(0) % 4 == 3), "qid not from batch")
    assert(run1.forall(r => r.getLong(1) % 4 != 3), "nid not from base")
    val byQ = run1.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length).toSeq)
      val cos = sorted.map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"not rank-ordered: $cos")
      assert(sorted.length <= 5)
    }
    val run2 = SparkEntry.queries("q_embed_ann_inc")(spark, dir).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
  }

  test("batch stream of an empty iterator emits nothing") {
    assert(BatchStream.batches(Iterator.empty[(String, Int)], 5, 10).isEmpty)
  }

  test("single-element stream flushes one singleton batch") {
    val out = BatchStream.batches(Iterator(("k", 1)), 5, 10).toSeq
    assert(out == Seq(("k", Seq(1))))
  }
}
