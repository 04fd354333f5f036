package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics
import graft.ext.TextAnalysis

/** Contract tests for the graph/behavioral/time-series analytics gates —
  * independent recomputation (brute force or exact algebra) rather than the
  * DuckDB-oracle hash, which the driver covers separately.
  */
class AnalyticsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val Scale = 1000000000000L

  test("pagerank: mass conserved within truncation loss, floor rank honored") {
    val r = Analytics.graphPagerank(spark, sf).collect()
    val n = r.length
    assert(n > 0)
    val total = r.map(_.getLong(1)).sum
    // every div truncation loses < 1 unit per term; 3 iterations over
    // (edges + dangling + N) terms lose < 1e-6 of the mass at this scale
    assert(total <= n * Scale)
    assert(total >= (n * Scale * 0.999).toLong, s"mass lost: $total vs ${n * Scale}")
    // every node keeps at least the teleport floor 0.15
    assert(r.forall(_.getLong(1) >= 15L * Scale / 100))
  }

  private def bruteEdges(): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    byOrder.flatMap(ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))).toSet
  }

  private def bruteTriangles(edges: Set[(Long, Long)]): Int = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    (for {
      (u, vs) <- adj.toSeq; v <- vs; w <- vs if v < w
      if edges.contains((v, w))
    } yield 1).size
  }

  // same adaptive modulus as Analytics.sampledEdges: the sample rate is
  // derived from the observed undirected edge count (budget 12 000)
  private def sampleModulus(edges: Set[(Long, Long)]): Long =
    math.max(1L, math.ceil(edges.size / 12000.0).toLong)

  private def adaptiveSample(): (Set[(Long, Long)], Long) = {
    val base = bruteEdges()
    val m = sampleModulus(base)
    (base.filter { case (u, v) =>
      ((u * 2654435761L + v * 40503L) % 4294967296L) % m == 0
    }, m)
  }

  test("triangles: matches brute-force enumeration of the sampled subgraph") {
    val row = Analytics.graphTriangles(spark, sf).collect().head
    val (sampled, m) = adaptiveSample()
    val nodes = sampled.flatMap(e => Seq(e._1, e._2))
    val tris = bruteTriangles(sampled)
    assert(row.getAs[Long]("n_active_nodes") === nodes.size)
    assert(row.getAs[Long]("n_edges") === sampled.size)
    assert(row.getAs[Long]("n_triangles") === tris)
    assert(row.getAs[Long]("est_triangles") === tris * m * m * m)
  }

  test("funnel: step timestamps strictly ordered, completion monotone") {
    val rows = Analytics.funnelSteps(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getLong(1), Option(r.get(2)), Option(r.get(3)))
      t2.foreach(v => assert(v.asInstanceOf[Long] > t1))
      if (t3.isDefined) {
        assert(t2.isDefined, "step 3 without step 2")
        assert(t3.get.asInstanceOf[Long] > t2.get.asInstanceOf[Long])
      }
      val expected = 1 + t2.size + t3.size
      assert(r.getAs[Long]("steps_completed") === expected)
    }
  }

  test("cohort retention: offset-0 bin equals full cohort, offsets bounded") {
    val rows = Analytics.cohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0L).map(r => (r._1, r._3)).toMap
    assert(cohortSize.nonEmpty)
    rows.foreach { case (cw, off, n) =>
      assert(off >= 0)
      assert(n <= cohortSize(cw), s"cohort $cw offset $off exceeds cohort size")
    }
  }

  test("gapfill: full grid coverage, event mass conserved, fill matches observed") {
    val g = Analytics.tsGapfill(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"), col("value"))
    val users = e.select("user_id").distinct().count()
    val span = e.agg(min("day"), max("day")).collect().head
    val days = span.getLong(1) - span.getLong(0) + 1
    assert(g.count() === users * days)
    assert(g.agg(sum("n_events")).collect().head.getLong(0) === e.count())
    // wherever a day was observed, the filled value equals that day's sum
    val daily = e.groupBy("user_id", "day")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val joined = g.join(daily, Seq("user_id", "day"))
    assert(joined.filter(col("value_sum_ffill") =!= col("v")).count() === 0)
  }

  test("anomaly flags equal an independent exact recomputation") {
    val flagged = Analytics.tsAnomaly(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getBoolean(3)))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = daily.groupBy(_._1)
    assert(flagged.size === daily.length)
    byUser.foreach { case (_, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * r._3).sum
      rows.foreach { case (u, day, x) =>
        val lhs = (n * x - s).pow(2)
        val rhs = 9 * (n * q - s * s)
        val (gotX, gotFlag) = flagged((u, day))
        assert(gotX === x)
        assert(gotFlag === (lhs > rhs), s"user $u day $day")
      }
    }
  }

  test("clustering coefficient: corner counts sum to 3x triangles, coeff in [0,1]") {
    val cc = Analytics.graphClusteringCoeff(spark, sf).collect()
    val (sampled, _) = adaptiveSample() // same deterministic sample as the gate
    val tri = bruteTriangles(sampled)
    assert(cc.map(_.getAs[Long]("n_tri")).sum === 3L * tri)
    cc.foreach { r =>
      val (nTri, wedges) = (r.getAs[Long]("n_tri"), r.getAs[Long]("n_wedges"))
      assert(nTri <= wedges, "more triangles than wedges at a node")
      if (wedges == 0) assert(r.isNullAt(r.fieldIndex("coeff")))
      else {
        val c = r.getAs[Double]("coeff")
        assert(c >= 0.0 && c <= 1.0)
      }
    }
  }

  test("transition matrix: rows sum to 1 per source, transitions = events - users") {
    val m = Analytics.transitionMatrix(spark, sf).collect()
    val events = Tables.events(spark, sf)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(m.map(_.getAs[Long]("n")).sum === expected)
    m.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val p = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-9, s"from=$from sums to $p")
    }
  }

  test("rfm: scores are balanced quintiles over all customers") {
    val r = Analytics.rfmSegments(spark, sf).collect()
    val n = r.length
    for (colName <- Seq("r_score", "f_score", "m_score")) {
      val sizes = r.groupBy(_.getAs[Int](colName)).view.mapValues(_.size).toMap
      assert(sizes.keySet === (1 to 5).toSet)
      assert(sizes.values.max - sizes.values.min <= 1, s"$colName unbalanced: $sizes")
      assert(sizes.values.sum === n)
    }
  }

  test("histogram: mass and count conserved, bucket geometry consistent") {
    val h = Analytics.histogram(spark, sf).collect()
    val o = Tables.orders(spark, sf)
    assert(h.map(_.getAs[Long]("n")).sum === o.count())
    val exact = o.agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(h.map(_.getAs[Double]("total")).sum - exact) < 1e-6 * exact)
    h.foreach { r =>
      assert(r.getAs[Double]("lo") === r.getAs[Long]("bucket") * 25000.0)
    }
  }

  test("bigram LM: scores bounded by seen-bigram probability mass") {
    val rows = TextAnalysis.bigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, oov, score) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(oov >= 0 && oov <= nb)
      val seen = nb - oov
      assert(score >= 0 && score <= seen * 1000000000L,
        s"doc ${r.getLong(0)}: score $score outside [0, ${seen}e9]")
      if (seen > 0) assert(score > 0, "a seen bigram has probability >= 1/c1 > 0")
    }
  }
}
