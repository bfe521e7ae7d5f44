package graft.api

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.{ScoredId, TopKAgg, TopKBuf}

/** ScalaCheck properties for the algorithmically subtle operators: the
  * AllPairs/PPJoin prefix filter must have recall 1.0 against brute force,
  * TopKAgg's merge must be a lawful commutative monoid action (map-side
  * partial aggregation reorders and re-associates merges arbitrarily), and
  * hashSplit must be order-invariant and loud on null keys. */
object TopKAggProps extends Properties("TopKAgg") {

  private val scored: Gen[ScoredId] = for {
    s <- Gen.oneOf(0.0, 0.25, 0.5, 1.0, 2.5, -1.0)
    id <- Gen.chooseNum(0L, 12L)
  } yield ScoredId(s, id)

  private val items: Gen[List[ScoredId]] = Gen.listOf(scored)
  private val ks: Gen[Int] = Gen.chooseNum(1, 5)

  private def bufOf(agg: TopKAgg, xs: Seq[ScoredId]): TopKBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def brute(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  property("reduce-fold equals sort-and-take brute force") =
    forAll(items, ks) { (xs, k) =>
      val agg = new TopKAgg(k)
      agg.finish(bufOf(agg, xs)) == brute(xs, k)
    }

  property("merge is commutative") =
    forAll(items, items, ks) { (xs, ys, k) =>
      val agg = new TopKAgg(k)
      val (a, b) = (bufOf(agg, xs), bufOf(agg, ys))
      agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a))
    }

  property("merge is associative") =
    forAll(items, items, items, ks) { (xs, ys, zs, k) =>
      val agg = new TopKAgg(k)
      val (a, b, c) = (bufOf(agg, xs), bufOf(agg, ys), bufOf(agg, zs))
      agg.finish(agg.merge(agg.merge(a, b), c)) ==
        agg.finish(agg.merge(a, agg.merge(b, c)))
    }

  property("any partitioning of the input merges to the brute-force top-k") =
    forAll(items, ks, Gen.chooseNum(1, 4)) { (xs, k, nParts) =>
      val agg = new TopKAgg(k)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val merged = parts.map(bufOf(agg, _)).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == brute(xs, k)
    }
}

/** jaccardPairs (the prefix-filtered exact similarity join) vs an in-memory
  * all-pairs brute force: identical pair sets and Jaccard values at every
  * threshold — the recall-1.0 claim, exercised on random small corpora.
  * Spark-backed, so the sample count is kept small. */
object JaccardPairsProps extends Properties("jaccardPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val vocab = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
  private val doc: Gen[List[String]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, vocab)).map(_.distinct)
  private val corpus: Gen[List[List[String]]] =
    Gen.chooseNum(2, 9).flatMap(n => Gen.listOfN(n, doc))

  private def bruteForce(docs: List[List[String]], minPct: Int): Set[(Long, Long, Double)] = {
    val sets = docs.map(_.toSet).zipWithIndex
    (for {
      (a, i) <- sets; (b, j) <- sets if i < j
      inter = (a & b).size; uni = (a | b).size
      if inter * 100 >= uni * minPct
    } yield (i.toLong, j.toLong, inter.toDouble / uni)).toSet
  }

  property("pair set and jaccard values equal brute force (recall 1.0)") =
    forAll(corpus, Gen.chooseNum(20, 95)) { (docs, minPct) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (tk, i) => (i.toLong, tk) }
        .toDF("doc_id", "tk")
      val got = GraftOps.jaccardPairs(df, "doc_id", "tk", minPct)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got == bruteForce(docs, minPct)
    }
}

/** minhashLshPairs soundness: whatever the banding recalls, every EMITTED
  * pair must be exact — d1 < d2, deduplicated, Jaccard computed exactly and
  * at/above the threshold — on BOTH verify paths (64-token bitset popcount
  * and large-vocab array_intersect), which must agree with each other. */
object MinhashLshProps extends Properties("minhashLshPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[String]] = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))

  property("emitted pairs are a sound subset of the exact join, both verify paths") =
    forAll(corpus, Gen.chooseNum(30, 90)) { (docs, minPct) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val truth = docs.map(_.split(" ").toSet).zipWithIndex
      val exact = (for {
        (a, i) <- truth; (b, j) <- truth if i < j
        inter = (a & b).size; uni = (a | b).size
        if inter * 100 >= uni * minPct
      } yield (i.toLong, j.toLong) -> inter.toDouble / uni).toMap
      def run(smallVocab: Boolean) =
        GraftOps.minhashLshPairs(df, "doc_id", "text", nHashes = 16, bands = 8,
            minPct = minPct, smallVocab = Some(smallVocab))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toList
      val bitset = run(smallVocab = true)
      val arrays = run(smallVocab = false)
      val sound = bitset.forall { case (pair, jac) =>
        exact.get(pair).contains(jac) && pair._1 < pair._2
      }
      sound && bitset.size == bitset.distinct.size && bitset.toSet == arrays.toSet
    }
}

/** asofJoin vs the quadratic definition: for every left row, the payload is
  * the greatest-(time, tiebreak) right row at or before it in the same key,
  * or null when none exists. */
object AsofJoinProps extends Properties("asofJoin") {

  // 6 (direction × strictness) variants are drawn at random per case —
  // 30 cases gives each variant ~5 hits in expectation
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val rows: Gen[List[(Long, Long)]] = // (key, ts)
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 6L))))

  private val dirGen = Gen.oneOf("backward", "forward", "nearest")

  private val tolGen: Gen[Option[Double]] =
    Gen.oneOf(None, Some(0.0), Some(1.0), Some(3.0))

  property("every direction × strictness × tolerance variant matches brute force") =
    forAll(rows, rows, dirGen, Gen.oneOf(true, false), tolGen) {
      (ls, rs, dir, exact, tol) =>
      val s = spark
      import s.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("click_id", "user_id", "ts")
      val got = GraftOps.asofJoin(left, right, "user_id", "ts",
          payload = Seq("click_id"), tieBreak = Seq("click_id"),
          direction = dir, allowExactMatches = exact, tolerance = tol)
        .collect()
        .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap // event_id -> payload (cols: user_id, ts, event_id, click_id)
      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.zipWithIndex.collect {
          case ((rk, rt), j) if rk == k => (rt, j.toLong)
        }
        // backward: max (rt, tb) at-or-before; forward: min rt then max tb
        // at-or-after; nearest: closer of the two, tie -> backward;
        // tolerance: the picked match nulls out when farther than tol
        val bwd = cands.filter { case (rt, _) => if (exact) rt <= t else rt < t }
          .maxOption
        val fwd = cands.filter { case (rt, _) => if (exact) rt >= t else rt > t }
          .map { case (rt, j) => (-rt, j) }.maxOption.map { case (nrt, j) => (-nrt, j) }
        val pick = dir match {
          case "backward" => bwd
          case "forward" => fwd
          case "nearest" => (bwd, fwd) match {
            case (Some((brt, _)), Some((frt, _))) =>
              if (t - brt <= frt - t) bwd else fwd
            case _ => bwd.orElse(fwd)
          }
        }
        val inTol = pick.filter { case (rt, _) =>
          tol.forall(b => math.abs(rt - t) <= b)
        }
        i.toLong -> inTol.map(_._2)
      }.toMap
      got == expect
    }

  private val rows2: Gen[List[(Long, Long, Long)]] = // (k1, k2, ts)
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, for {
      k1 <- Gen.chooseNum(0L, 1L); k2 <- Gen.chooseNum(0L, 1L)
      t <- Gen.chooseNum(0L, 6L)
    } yield (k1, k2, t)))

  property("composite-key asofJoinBy partitions on the full key tuple") =
    forAll(rows2, rows2) { (ls, rs) =>
      val s = spark
      import s.implicits._
      val left = ls.zipWithIndex.map { case ((a, b, t), i) => (i.toLong, a, b, t) }
        .toDF("event_id", "k1", "k2", "ts")
      val right = rs.zipWithIndex.map { case ((a, b, t), i) => (i.toLong, a, b, t) }
        .toDF("click_id", "k1", "k2", "ts")
      val got = GraftOps.asofJoinBy(left, right, Seq("k1", "k2"), "ts",
          payload = Seq("click_id"), tieBreak = Seq("click_id"))
        .collect()
        .map(r => r.getLong(3) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap // cols: k1, k2, ts, event_id, click_id
      val expect = ls.zipWithIndex.map { case ((a, b, t), i) =>
        val cands = rs.zipWithIndex.collect {
          case ((ra, rb, rt), j) if ra == a && rb == b && rt <= t => (rt, j.toLong)
        }
        i.toLong -> cands.maxOption.map(_._2)
      }.toMap
      got == expect
    }
}

/** funnelSteps vs the sequential brute-force definition: step i's time is
  * the minimum event time of step i strictly after step i−1's time, and
  * level counts the converted prefix. */
object FunnelProps extends Properties("funnelSteps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark
  private val STEPS = Seq("a", "b", "c")

  private val events: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 2L)
      t <- Gen.oneOf(STEPS :+ "x")
      ts <- Gen.chooseNum(0L, 9L)
    } yield (k, t, ts)))

  private def brute(es: List[(Long, String, Long)]): Map[Long, (Seq[Option[Long]], Int)] =
    es.map(_._1).distinct.map { k =>
      val mine = es.filter(_._1 == k)
      val times = STEPS.foldLeft(List.empty[Option[Long]]) { (acc, st) =>
        val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
        val t = prev.flatMap(p =>
          mine.filter(e => e._2 == st && e._3 > p).map(_._3).minOption)
        acc :+ t
      }
      k -> (times, times.count(_.isDefined))
    }.toMap

  property("step times and level equal the sequential definition") =
    forAll(events) { es =>
      val s = spark
      import s.implicits._
      val df = es.toDF("user_id", "event_type", "ts")
      val got = PortraitOps.funnelSteps(df, "user_id", "event_type", "ts", STEPS)
        .collect().map { r =>
          r.getLong(0) -> (STEPS.indices.map(i =>
            if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))),
            r.getInt(STEPS.size + 1))
        }.toMap
      got == brute(es)
    }
}

/** sessionize vs the brute-force scan: sorting each entity's events by
  * (ts, tie) and starting a new session whenever the gap exceeds the
  * threshold must reproduce every event's session id. */
object SessionizeProps extends Properties("sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val events: Gen[List[(Long, Long, Long)]] = // (key, ts, id)
    Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 30L)
    } yield (k, ts)).map(_.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }))

  private def brute(es: List[(Long, Long, Long)], gap: Long): Map[Long, Long] =
    es.groupBy(_._1).flatMap { case (_, mine) =>
      val sorted = mine.sortBy(e => (e._2, e._3))
      var sid = 0L; var last = Long.MinValue
      sorted.map { e =>
        if (last == Long.MinValue || e._2 - last > gap) sid += 1
        last = e._2
        e._3 -> sid
      }
    }

  property("session ids equal the sorted-scan definition") =
    forAll(events, Gen.chooseNum(1L, 10L)) { (es, gap) =>
      val s = spark
      import s.implicits._
      val df = es.toDF("user_id", "ts", "event_id")
      val got = PortraitOps.sessionize(df, "user_id", "ts", "event_id", gap)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      got == brute(es, gap)
    }
}

/** retentionCohorts vs a brute-force computation of cohort assignment,
  * active cells, sizes, and ratios. */
object RetentionProps extends Properties("retentionCohorts") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val events: Gen[List[(Long, Int)]] = // (key, day offset from epoch)
    Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 40))))

  property("cells equal the brute-force cohort matrix") =
    forAll(events, Gen.chooseNum(2, 9)) { (es, period) =>
      val s = spark
      import s.implicits._
      val epoch = java.time.LocalDate.of(1970, 1, 1)
      val df = es.map { case (k, d) =>
        (k, java.sql.Timestamp.valueOf(epoch.plusDays(d).atStartOfDay))
      }.toDF("user_id", "ts")
      val got = PortraitOps.retentionCohorts(df, "user_id", "ts", period)
        .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      val firstDay = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      val cohortOf = firstDay.map { case (k, f) => k -> (f - f % period) }
      val sizes = cohortOf.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      val cells = es.map { case (k, d) => (cohortOf(k), (d - cohortOf(k)) / period, k) }
        .distinct.groupBy(t => (t._1, t._2)).map { case ((c, o), m) =>
          (c.toLong, o) -> m.map(_._3).distinct.size.toLong
        }
      val expect = cells.map { case ((c, o), n) =>
        (c, o) -> (n, sizes(c.toInt), n.toDouble / sizes(c.toInt))
      }
      got == expect
    }
}

/** connectedComponents vs brute-force union-find on random small graphs:
  * every node's label must be the minimum node id in its component. */
object ComponentsProps extends Properties("connectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val edges: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L))))
      .map(_.filter(e => e._1 != e._2))

  private def unionFind(es: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) => parent(find(a)) = find(b) }
    val nodes = es.flatMap(e => List(e._1, e._2)).distinct
    val minOf = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
    nodes.map(v => v -> minOf(find(v))).toMap
  }

  property("labels equal union-find component minima") =
    forAll(edges) { es =>
      es.isEmpty || {
        val s = spark
        import s.implicits._
        val df = es.toDF("d1", "d2")
        val got = GraftOps.connectedComponents(df, "d1", "d2")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == unionFind(es)
      }
    }

  // the worst case for min-label propagation is a path graph: diameter
  // n−1, so exactly diameter+1 passes (the last one observes zero
  // changes). Pins the O(diameter) pass complexity the scaladoc claims —
  // path length is kept test-sized; the pass count, not the node count,
  // is the documented quantity.
  property("path graph of n nodes converges in exactly n passes (diameter+1)") =
    forAll(Gen.chooseNum(2, 24)) { n =>
      val s = spark
      import s.implicits._
      val path = (0L until n.toLong).sliding(2)
        .map(w => (w(0), w(1))).toList.toDF("d1", "d2")
      val (labels, passes) = GraftOps.ccWithPassCount(path, "d1", "d2", maxIter = n + 1)
      val allMin = labels.collect().forall(_.getLong(1) == 0L)
      allMin && passes == n
    }

  property("maxIter below the diameter fails loudly, never silently wrong") =
    Prop.secure {
      val s = spark
      import s.implicits._
      val path = (0L until 12L).sliding(2).map(w => (w(0), w(1))).toList.toDF("d1", "d2")
      try { GraftOps.connectedComponents(path, "d1", "d2", maxIter = 3); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("converge") }
    }
}

/** quintileScores approx-vs-exact: on DISTINCT metric values the default
  * `exact = false` (percentile_approx boundary projection) score is within
  * ±1 of the exact ntile score and stays in 1..5, for both metric
  * directions — the bound that makes the approx path safe as the scale
  * default. Heavy ties void any such bound by construction (ntile splits
  * equal values by rank; a value-based boundary cannot), hence the
  * distinct-value generator. */
object QuintileProps extends Properties("quintileScores") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val cases: Gen[(List[Int], Boolean)] = for {
    n <- Gen.chooseNum(10, 50)
    vs <- Gen.pick(n, 0 until 1000)
    hib <- Gen.oneOf(true, false)
  } yield (vs.toList, hib)

  property("approx score within ±1 of exact ntile on distinct values") =
    forAll(cases) { case (vs, hib) =>
      val s = spark
      import s.implicits._
      val base = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
        .toDF("k", "v")
      def run(exact: Boolean): Map[Long, Int] =
        PortraitOps.quintileScores(base, "k", Seq(("v", "s", hib)), exact)
          .select("k", "s").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val approx = run(exact = false)
      val exactScores = run(exact = true)
      vs.indices.forall { i =>
        val a = approx(i.toLong)
        a >= 1 && a <= 5 && math.abs(a - exactScores(i.toLong)) <= 1
      }
    }
}

/** quantizeEmbeddings: codes stay in [-127, 127], per-element dequantization
  * error is bounded by scale/2, and rel_err matches the manual computation —
  * on random small vectors including negatives and zero vectors. */
object QuantizeProps extends Properties("quantizeEmbeddings") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val vec: Gen[List[Float]] =
    Gen.listOfN(4, Gen.oneOf(-2.5f, -1.0f, -0.25f, 0.0f, 0.125f, 1.0f, 3.0f))
  private val vecs: Gen[List[List[Float]]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, vec))

  property("codes bounded, error within scale/2 per element, rel_err exact") =
    forAll(vecs) { vs =>
      val s = spark
      import s.implicits._
      graft.GraftExtensions.register(s)
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = GraftOps.quantizeEmbeddings(df, "vec_id", "embedding").collect()
      out.forall { r =>
        val x = vs(r.getLong(0).toInt).map(_.toDouble)
        val scale = r.getDouble(1)
        val codes = if (r.isNullAt(2)) Nil else r.getSeq[Int](2)
        val rel = r.getDouble(3)
        if (x.forall(_ == 0.0)) rel == 0.0
        else {
          val dq = codes.map(_ * scale)
          val e2 = x.zip(dq).map { case (a, b) => (a - b) * (a - b) }.sum
          val nrm = math.sqrt(x.map(v => v * v).sum)
          codes.forall(c => c >= -127 && c <= 127) &&
            x.zip(dq).forall { case (a, b) => math.abs(a - b) <= scale / 2 + 1e-12 } &&
            math.abs(rel - math.sqrt(e2) / nrm) < 1e-12
        }
      }
    }
}

/** hashSplit: split assignment is a pure function of the key (row-order
  * invariant), always lands on a declared split name, and a null key fails
  * the job loudly instead of silently skewing a split. */
object HashSplitProps extends Properties("hashSplit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val ids: Gen[List[Long]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 5000L)))
      .map(_.distinct)

  property("assignment is key-pure, order-invariant, and on a declared split") =
    forAll(ids) { keys =>
      val s = spark
      import s.implicits._
      val weights = Seq("train" -> 70, "val" -> 20, "test" -> 10)
      def run(ks: Seq[Long]): Map[Long, String] =
        GraftOps.hashSplit(ks.toDF("k"), "k", weights)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val fwd = run(keys)
      val rev = run(keys.reverse)
      fwd == rev && fwd.values.forall(weights.map(_._1).contains)
    }

  property("null key raises") = Prop {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), None).toDF("k")
    try { GraftOps.hashSplit(df, "k").collect(); false }
    catch { case e: Throwable =>
      Option(e.getMessage).exists(_.contains("hashSplit")) ||
        Option(e.getCause).flatMap(c => Option(c.getMessage))
          .exists(_.contains("hashSplit"))
    }
  }
}

/** repetitionStats vs the in-memory definition: every metric is an exact
  * integer-ratio double (identical int inputs ⇒ bit-identical division), on
  * random corpora that include heavy repetition and 1-word docs (the
  * sequence(0,-1) guard path). */
object RepetitionStatsProps extends Properties("repetitionStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word = Gen.oneOf("x", "y", "z", "w")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc))

  private def naive(text: String): (Int, Double, Double, Double) = {
    val tk = text.split(" ")
    val wc = tk.length
    val dupW = (wc - tk.distinct.length).toDouble / wc
    val topW = tk.groupBy(identity).values.map(_.length).max.toDouble / wc
    val bg = if (wc >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
    val dupB = if (bg.nonEmpty)
      (bg.size - bg.distinct.size).toDouble / bg.size else 0.0
    (wc, dupW, topW, dupB)
  }

  property("metrics equal the sliding-window definition") =
    forAll(corpus) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val got = TextAnalysis.repetitionStats(df, "id", "txt").collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      docs.indices.forall(i => got(i.toLong) == naive(docs(i)))
    }
}

/** boilerplateNgrams + contaminationReport vs in-memory shingle-set math:
  * document frequencies, overlap counts, and the sub-n-gram zero path all
  * equal the brute-force definition (digest hashing must be invisible). */
object CurationNgramProps extends Properties("curationNgrams") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word = Gen.oneOf("p", "q", "r", "s")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc))

  private def shingles(text: String, n: Int): Set[String] = {
    val tk = text.split(" ")
    if (tk.length < n) Set.empty
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  property("boilerplate counts equal brute-force document frequencies") =
    forAll(corpus, Gen.chooseNum(2, 3)) { (docs, minDocs) =>
      val s = spark
      import s.implicits._
      val n = 2
      val sets = docs.map(shingles(_, n))
      val dfreq = sets.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val got = TextAnalysis.boilerplateNgrams(df, "id", "txt", n, minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      docs.indices.forall { i =>
        val sh = sets(i)
        got(i.toLong) ==
          ((sh.size.toLong, sh.count(g => dfreq(g) >= minDocs).toLong))
      }
    }

  property("contamination hits equal brute-force gram intersection") =
    forAll(corpus, corpus) { (train, test) =>
      val s = spark
      import s.implicits._
      val n = 2
      val testG = test.map(shingles(_, n)).fold(Set.empty)(_ ++ _)
      val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val testDf = test.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("id", "txt")
      val got = TextAnalysis.contaminationReport(trainDf, testDf, "id", "txt", n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      train.indices.forall { i =>
        val sh = shingles(train(i), n)
        got(i.toLong) == ((sh.size.toLong, sh.count(testG.contains).toLong))
      }
    }
}

/** srpNearDupPairs precision: whatever the banding recalls, every emitted
  * pair is exact — a subset of the tiled exact baseline's pairs with the
  * identical rounded cosine, d1 < d2, no duplicates — across random
  * corpora, thresholds, and band layouts. */
object SrpPairsProps extends Properties("srpNearDupPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val vec: Gen[List[Float]] =
    Gen.listOfN(4, Gen.oneOf(-1.5f, -0.5f, 0.0f, 0.25f, 1.0f, 2.0f))
      .suchThat(_.exists(_ != 0.0f))
  private val vecs: Gen[List[List[Float]]] =
    Gen.chooseNum(2, 7).flatMap(n => Gen.listOfN(n, vec))

  property("emitted pairs are a sound subset of the exact baseline") =
    forAll(vecs, Gen.oneOf(0.2, 0.5, 0.9), Gen.oneOf((16, 4), (32, 8))) {
      (vs, minCos, layout) =>
        val s = spark
        import s.implicits._
        graft.GraftExtensions.register(s)
        val (nBits, bands) = layout
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
          .toDF("vec_id", "embedding")
        val srp = GraftOps.srpNearDupPairs(df, "vec_id", "embedding",
            minCosine = minCos, dim = 4, nBits = nBits, bands = bands)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val exact = GraftOps.embeddingNearDupPairs(df, "vec_id", "embedding",
            minCosine = minCos)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        srp.forall(p => p._1 < p._2 && exact.contains(p)) &&
          srp.length == srp.distinct.length
    }
}

/** CurationPipeline.curate vs the whole pipeline brute-forced in memory:
  * quality gate (repetition dials) → best-score exact dedup → n-gram
  * Jaccard union-find clusters → best-score survivor per cluster. Catches
  * composition bugs (column collisions, stage-order drift) the per-stage
  * properties can't see. */
object CurationPipelineProps extends Properties("curationPipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word = Gen.oneOf("m", "n", "o")
  private val doc: Gen[String] =
    Gen.chooseNum(2, 7).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
  private val corpus: Gen[List[(String, Long)]] =
    Gen.chooseNum(1, 7).flatMap(k => Gen.listOfN(k, doc))
      .flatMap(ds => Gen.listOfN(ds.size, Gen.chooseNum(0L, 9L)).map(ds.zip(_)))

  private def naive(docs: List[(String, Long)]): Set[Long] = {
    val rows = docs.zipWithIndex.map { case ((t, sc), i) => (i.toLong, t, sc) }
    // stage 1: quality (defaults 0.6 / 0.2 / 0.4)
    val q = rows.filter { case (_, t, _) =>
      val tk = t.split(" "); val wc = tk.length
      val dupW = (wc - tk.distinct.length).toDouble / wc
      val topW = tk.groupBy(identity).values.map(_.length).max.toDouble / wc
      val bg = if (wc >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Nil
      val dupB = if (bg.nonEmpty) (bg.size - bg.distinct.size).toDouble / bg.size else 0.0
      dupW <= 0.6 && topW <= 0.2 && dupB <= 0.4
    }
    // stage 2: exact dedup, best score ties to min id
    val k2 = q.groupBy(_._2).values
      .map(_.minBy { case (id, _, sc) => (-sc, id) }).toList
    // stage 3: 2-gram Jaccard >= 50% union-find
    def sh(t: String): Set[String] = {
      val tk = t.split(" ")
      if (tk.length < 2) Set.empty else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    val parent = scala.collection.mutable.Map(k2.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, i) <- k2.zipWithIndex; (b, j) <- k2.zipWithIndex if i < j
      sa = sh(a._2); sb = sh(b._2)
      inter = (sa & sb).size; uni = (sa | sb).size
      if sa.nonEmpty && sb.nonEmpty && inter * 100 >= uni * 50
    } { val (ra, rb) = (find(a._1), find(b._1)); if (ra != rb) parent(ra) = rb }
    // stage 4: best score per cluster, ties to min id
    k2.groupBy(r => find(r._1)).values
      .map(_.minBy { case (id, _, sc) => (-sc, id) }._1).toSet
  }

  property("surviving ids equal the staged brute force") =
    forAll(corpus) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case ((t, sc), i) => (i.toLong, t, sc) }
        .toDF("id", "txt", "score")
      val got = CurationPipeline.curate(df, "id", "txt", "score",
          n = 2, minPct = 50)
        .collect().map(_.getAs[Long]("id")).toSet
      got == naive(docs)
    }
}

/** hashSampleBy vs the md5-bucket definition computed in memory: per-stratum
  * rates honored exactly, unlisted strata take the default, and membership
  * is a pure function of the key (order-invariant). */
object HashSampleByProps extends Properties("hashSampleBy") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private def bucketOf(key: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 4), 16) % 100
  }

  private val rows: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 500L), Gen.oneOf("a", "b", "c"))))
      .map(_.distinctBy(_._1))

  property("kept rows equal the md5-bucket definition, order-invariant") =
    forAll(rows, Gen.chooseNum(0, 100), Gen.chooseNum(0, 100),
      Gen.chooseNum(0, 100)) { (xs, pa, pb, pd) =>
      val s = spark
      import s.implicits._
      val rates = Seq("a" -> pa, "b" -> pb) // "c" takes the default
      def run(data: Seq[(Long, String)]): Set[Long] =
        GraftOps.hashSampleBy(data.toDF("k", "g"), "k", "g", rates, pd)
          .collect().map(_.getLong(0)).toSet
      val expect = xs.filter { case (k, g) =>
        bucketOf(k) < (g match { case "a" => pa; case "b" => pb; case _ => pd })
      }.map(_._1).toSet
      run(xs) == expect && run(xs.reverse) == expect
    }
}

/** capPerGroup / budgetByTokens vs in-memory brute force: the selection
  * operators must pick exactly the rows a sequential scan in (score desc,
  * id asc) order would, per group/stratum, for any input order. */
object SelectionProps extends Properties("selection") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val rows: Gen[List[(String, Long, Int, Long)]] = for {
    n <- Gen.chooseNum(1, 24)
    gs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    scores <- Gen.listOfN(n, Gen.chooseNum(0, 5))
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 400L))
  } yield gs.zipWithIndex.zip(scores.zip(toks)).map {
    case ((g, i), (s, t)) => (g, i.toLong, s, t)
  }

  private def ordered(xs: List[(String, Long, Int, Long)]) =
    xs.groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)))

  property("capPerGroup == per-group sorted take(n), any input order") =
    forAll(rows, Gen.chooseNum(1, 5)) { (xs, n) =>
      val s = spark
      import s.implicits._
      val df = xs.toDF("g", "id", "score", "tk")
      val got = GraftOps.capPerGroup(df, "g", "score", "id", n).collect()
        .map(r => (r.getLong(1), r.getInt(4))).toSet
      val want = ordered(xs).toSeq.flatMap { case (_, rs) =>
        rs.take(n).zipWithIndex.map { case (r, i) => (r._2, i + 1) }
      }.toSet
      got == want
    }

  property("budgetByTokens == per-stratum cumulative fill, any input order") =
    forAll(rows, Gen.chooseNum(100L, 900L)) { (xs, budget) =>
      val s = spark
      import s.implicits._
      val df = xs.toDF("st", "id", "score", "tk")
      val got = GraftOps.budgetByTokens(df, "st", "score", "tk", "id", budget)
        .collect().map(r => (r.getLong(1), r.getLong(4))).toSet
      val want = ordered(xs).toSeq.flatMap { case (_, rs) =>
        rs.scanLeft((-1L, 0L)) { case ((_, cum), r) => (r._2, cum + r._4) }
          .tail.takeWhile(_._2 <= budget)
      }.toSet
      got == want
    }
}

/** packSequenceRows: the manifest's slices tile every sequence and every
  * doc EXACTLY — no token dropped, duplicated, or mis-placed — for random
  * corpora, sequence lengths, and shard counts; and the manifest is
  * consistent with packSequences' per-doc geometry (one row per spanned
  * sequence, starting at (seq_first, seq_off)). */
object PackRowsProps extends Properties("packSequenceRows") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val corpora: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 120L))
  } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("slices tile every sequence to [0, seqLen) — tail partial for " +
    "the shard's last — and every doc to [0, n_tokens), consistently " +
    "with packSequences") =
    forAll(corpora, Gen.chooseNum(1L, 64L), Gen.oneOf(1, 2, 4)) {
      (xs, seqLen, nShards) =>
        val s = spark
        import s.implicits._
        val df = xs.toDF("id", "nt")
        val rows = GraftOps.packSequenceRows(df, "id", "nt", seqLen, nShards)
          .select("id", "nt", "shard", "seq_id", "doc_from", "doc_to",
            "seq_from")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        // shard token totals, from one row per doc
        val shardToks = rows.groupBy(_._3).view
          .mapValues(_.map(r => (r._1, r._2)).distinct.map(_._2).sum).toMap
        val seqTiled = rows.groupBy(r => (r._3, r._4)).forall {
          case ((shard, seqId), slices) =>
            val expectedLen =
              math.min(seqLen, shardToks(shard) - seqId * seqLen)
            val sorted = slices.sortBy(_._7)
            sorted.head._7 == 0L &&
              sorted.sliding(2).forall {
                case Array(a, b) => b._7 == a._7 + (a._6 - a._5)
                case _ => true
              } &&
              sorted.last._7 + (sorted.last._6 - sorted.last._5) ==
                expectedLen
        }
        val docTiled = rows.groupBy(_._1).forall { case (_, slices) =>
          val sorted = slices.sortBy(_._4)
          sorted.head._5 == 0L &&
            sorted.map(_._4).toSeq == (sorted.head._4 until
              sorted.head._4 + sorted.length).toSeq &&
            sorted.sliding(2).forall {
              case Array(a, b) => b._5 == a._6
              case _ => true
            } &&
            sorted.last._6 == sorted.head._2
        }
        val geom = GraftOps.packSequences(df, "id", "nt", seqLen, nShards)
          .select("id", "seq_first", "seq_off", "seq_spans")
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            r.getLong(3))).toMap
        val consistent = rows.groupBy(_._1).forall { case (id, slices) =>
          val (first, off, spans) = geom(id)
          val sorted = slices.sortBy(_._4)
          sorted.length.toLong == spans &&
            sorted.head._4 == first && sorted.head._7 == off
        }
        Prop(seqTiled) :| "per-sequence tiling" &&
          Prop(docTiled) :| "per-doc tiling" &&
          Prop(consistent) :| "packSequences consistency"
    }
}

/** segmentDedup vs in-memory brute force: removal set = segments whose
  * distinct-doc frequency reaches minDocs, reassembly preserves original
  * order, counts reconcile — for random corpora over a small segment
  * alphabet (high collision pressure). */
object SegmentDedupProps extends Properties("segmentDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("hdr", "ftr", "x", "y", "z")))
      .map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))

  property("output equals brute-force removal + ordered reassembly") =
    forAll(corpus, Gen.chooseNum(2, 4)) { (docs, minDocs) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val got = graft.api.GraftOps.segmentDedup(df, "id", "txt",
          sep = " ", minDocs = minDocs)
        .collect().map(r => (r.getLong(0),
          (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      val segs = docs.zipWithIndex.map { case (t, i) => i.toLong -> t.split(" ").toSeq }
      val common = segs.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= minDocs).keySet
      val want = segs.map { case (id, ss) =>
        val kept = ss.filterNot(common)
        id -> ((kept.mkString(" "), ss.size, ss.size - kept.size))
      }.toMap
      got == want
    }
}

/** substringScrub vs the in-memory model: corpus-wide k-gram occurrence
  * counts (every occurrence, within-doc repeats included), coverage as
  * the union of duplicated windows' positions, ordered reassembly of
  * the survivors. Pins the edges the oracle corpus never hits: docs
  * shorter than k pass through verbatim, a fully-covered doc emits an
  * empty string (not a dropped row), within-doc-only repeats count. */
object SubstringScrubProps extends Properties("substringScrub") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
      .map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))

  property("output equals brute-force coverage + ordered reassembly") =
    forAll(corpus, Gen.chooseNum(2, 4), Gen.chooseNum(2, 3)) {
      (docs, k, minOcc) =>
        val s = spark
        import s.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "txt")
        val got = graft.api.GraftOps.substringScrub(df, "id", "txt",
            k = k, minOccurrences = minOcc)
          .collect().map(r => (r.getLong(0),
            (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
        val toks = docs.zipWithIndex.map { case (t, i) =>
          i.toLong -> t.split(" ").toSeq }
        val grams = toks.flatMap { case (id, ts) =>
          (0 to ts.size - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
        }
        val dup = grams.groupBy(_._3).filter(_._2.size >= minOcc).keySet
        val covered: Map[Long, Set[Int]] = grams.filter(g => dup(g._3))
          .flatMap { case (id, i, _) => (i until i + k).map(id -> _) }
          .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
        val want = toks.map { case (id, ts) =>
          val cov = covered.getOrElse(id, Set.empty)
          val kept = ts.zipWithIndex.collect {
            case (t, i) if !cov(i) => t }
          id -> ((kept.mkString(" "), ts.size, ts.size - kept.size))
        }.toMap
        Prop(got == want) :| s"got $got want $want"
    }
}

/** The gram index's defining laws: (1) scrub(batch | index over H)
  * equals the one-shot substringScrub(H ∪ batch) restricted to the
  * batch's documents, where H is whatever multiset of documents the
  * append/retract sequence left live — counts are additive, so
  * retraction is a negative segment and needs no tombstone sequencing;
  * (2) a compact anywhere (folding the arithmetic, dropping
  * net-nonpositive rows) changes no answer. */
object GramIndexProps extends Properties("gramIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c"))).map(_.mkString(" "))

  // append/retract script over a fixed universe of docs: retract only
  // what is currently appended (the documented contract)
  private val universeG: Gen[Vector[String]] =
    Gen.listOfN(6, doc).map(_.toVector)

  property("probe == one-shot over live docs ∪ batch, restricted; " +
    "compact changes nothing") =
    forAll(universeG, Gen.listOfN(4, Gen.oneOf(true, false)),
      Gen.chooseNum(0, 3), Gen.chooseNum(2, 3)) {
      (universe, flips, compactAt, k) =>
        val s = spark
        import s.implicits._
        val dir = graft.engine.Tables.scratchDir("prop_gram_")
        // build on universe(0); then for i=1..4 append universe(i) when
        // flips(i-1), and for appended ones later retract half of them
        GraftOps.gramIndexBuild(Seq(0L -> universe(0)).toDF("id", "txt"),
          "txt", dir, k = k, nBuckets = 4)
        var live = Vector(universe(0))
        flips.zipWithIndex.foreach { case (app, i0) =>
          val i = i0 + 1
          val df = Seq(i.toLong -> universe(i)).toDF("id", "txt")
          if (app) { GraftOps.gramIndexAppend(df, "txt", dir)
            live :+= universe(i) }
          else if (live.size > 1) {
            // retract a currently-live doc (never the last one)
            val victim = live.last
            GraftOps.gramIndexRetract(
              Seq(99L -> victim).toDF("id", "txt"), "txt", dir)
            live = live.init
          }
          if (i0 == compactAt) GraftOps.gramIndexCompact(s, dir)
        }
        val batch = universe.takeRight(2).zipWithIndex
          .map { case (t, i) => (900L + i, t) }.toDF("id", "txt")
        val got = GraftOps.substringScrubAgainstCorpus(
            batch, "id", "txt", dir)
          .collect().map(r => (r.getLong(0),
            (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
        // one-shot model over live ∪ batch, restricted to batch ids
        val all = live.zipWithIndex.map { case (t, i) => (-1L - i, t) } ++
          universe.takeRight(2).zipWithIndex
            .map { case (t, i) => (900L + i, t) }
        val toks = all.map { case (id, t) => id -> t.split(" ").toSeq }
        val grams = toks.flatMap { case (id, ts) =>
          (0 to ts.size - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
        }
        val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
        val covered = grams.filter(g => dup(g._3))
          .flatMap { case (id, i, _) => (i until i + k).map(id -> _) }
          .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
        val want = toks.filter(_._1 >= 900L).map { case (id, ts) =>
          val cov = covered.getOrElse(id, Set.empty[Int])
          val kept = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }
          id -> ((kept.mkString(" "), ts.size, ts.size - kept.size))
        }.toMap
        val p1 = Prop(got == want) :| s"probe == model (got $got want $want)"
        GraftOps.gramIndexCompact(s, dir)
        val got2 = GraftOps.substringScrubAgainstCorpus(
            batch, "id", "txt", dir)
          .collect().map(r => (r.getLong(0),
            (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
        p1 && (Prop(got2 == want) :| "post-compact probe == model")
    }
}

/** vocabOov vs in-memory brute force: deterministic top-K vocabulary
  * (count desc, token asc) and occurrence-weighted OOV fractions. */
object VocabOovProps extends Properties("vocabOov") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 7).flatMap(n => Gen.listOfN(n, doc))

  property("matches brute-force vocab + per-doc OOV occurrence counts") =
    forAll(corpus, Gen.chooseNum(1, 4)) { (docs, k) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val got = graft.api.TextAnalysis.vocabOov(df, "id", "txt", k)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val toks = docs.zipWithIndex.map { case (t, i) => i.toLong -> t.split(" ").toSeq }
      val vocab = toks.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(k).map(_._1).toSet
      val want = toks.map { case (id, ts) =>
        id -> ((ts.size.toLong, ts.count(t => !vocab(t)).toLong))
      }.toMap
      got == want
    }
}

/** The winnowing guarantee, property-tested: splice one k+w−1-token
  * sentinel run into two random documents at random offsets — the pair
  * MUST surface from winnowedOverlapPairs, whatever the surrounding
  * noise (Schleimer et al.'s theorem 1, k = 3, w = 4 ⇒ runs of 6). */
object WinnowingProps extends Properties("winnowing") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val noiseDoc: Gen[List[String]] = for {
    n <- Gen.chooseNum(0, 8)
    ts <- Gen.listOfN(n, Gen.oneOf("n1", "n2", "n3", "n4", "n5", "n6"))
  } yield ts

  private val run = List("r1", "r2", "r3", "r4", "r5", "r6") // k + w − 1

  property("a spliced k+w-1 run is always detected") =
    forAll(noiseDoc, noiseDoc, Gen.chooseNum(0, 8), Gen.chooseNum(0, 8)) {
      (na, nb, offA, offB) =>
        val s = spark
        import s.implicits._
        def splice(noise: List[String], off: Int) = {
          val at = math.min(off, noise.size)
          (noise.take(at) ++ run ++ noise.drop(at)).mkString(" ")
        }
        val a = Seq((0L, splice(na, offA))).toDF("id", "txt")
        val b = Seq((1L, splice(nb, offB))).toDF("id", "txt")
        val pairs = graft.api.TextAnalysis
          .winnowedOverlapPairs(a, b, "id", "txt")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        pairs.contains((0L, 1L))
    }
}

/** editDistancePairs vs brute-force Levenshtein over all pairs: the
  * deletion-neighborhood candidates must be COMPLETE for lev <= maxDist
  * (the SymSpell guarantee) and the in-join verify exact — identical pair
  * sets and distances, on random short strings at k = 1 and k = 2. */
object EditDistanceProps extends Properties("editDistancePairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val str: Gen[String] =
    Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, str))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("pair set and distances equal all-pairs brute force, k in {1,2}") =
    forAll(corpus, Gen.oneOf(1, 2)) { (xs, k) =>
      val s = spark
      import s.implicits._
      val df = xs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "name")
      val got = GraftOps.editDistancePairs(df, "id", "name", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, i) <- xs.zipWithIndex; (b, j) <- xs.zipWithIndex if i < j
        d = lev(a, b) if d <= k
      } yield (i.toLong, j.toLong, d)).toSet
      got == want
    }

  property("a value longer than maxLen fails the job LOUDLY (raise_error), " +
    "never truncates silently") =
    forAll(Gen.chooseNum(1, 6), Gen.oneOf(1, 2)) { (ml, k) =>
      val s = spark
      import s.implicits._
      val df = Seq((0L, "a" * (ml + 1)), (1L, "a" * ml)).toDF("id", "name")
      Prop.throws(classOf[Throwable]) {
        GraftOps.editDistancePairs(df, "id", "name", k, maxLen = ml).collect()
      }
    }

  property("maxLen at exactly the longest value changes nothing — the guard " +
    "is inert within bound") =
    forAll(corpus, Gen.oneOf(1, 2)) { (xs, k) =>
      val s = spark
      import s.implicits._
      val df = xs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "name")
      val longest = math.max(1, xs.map(_.length).max)
      def run(ml: Int) = GraftOps.editDistancePairs(df, "id", "name", k, ml)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      run(longest) == run(longest + 10)
    }
}

/** dedupNearAgainstCorpus lifecycle laws on random corpora: (1) for
  * MONOTONE (append-ordered) splits, dedup∘append per batch equals the
  * one-shot run — the composition theorem the fixture spec pins, here
  * exercised across random corpora, split points (including empty
  * batches), and thresholds; (2) precision 1.0 — every drop has a true
  * smaller-precedence J ≥ t partner under the brute-force predicate.
  * Spark + parquet index per case, so the sample count is kept small. */
object NearDedupProps extends Properties("dedupNearAgainstCorpus") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(4, 8).flatMap(n => Gen.listOfN(n, doc))

  property("monotone batch∘append ≡ one-shot, and drops ⊆ exact predicate") =
    forAll(corpus, Gen.chooseNum(0, 6), Gen.chooseNum(50, 95)) {
      (docs, cutRaw, minPct) =>
        val s = spark
        import s.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val n = docs.size
        val nHist = math.max(1, n / 3)
        val batchIds = (nHist.toLong until n.toLong).toSet
        val cut = nHist + cutRaw % (n - nHist + 1) // in [nHist, n]
        def build(): String = {
          val dir = java.nio.file.Files.createTempDirectory("prop_fpi_")
            .toString
          GraftOps.fingerprintBuild(df.filter(col("doc_id") < nHist),
            "doc_id", "text", dir)
          dir
        }
        def step(dir: String, lo: Int, hi: Int): Set[Long] = {
          val b = df.filter(col("doc_id") >= lo && col("doc_id") < hi)
          val sv = GraftOps.dedupNearAgainstCorpus(b, "doc_id", "text", dir,
            minPct).select("doc_id").collect().map(_.getLong(0)).toSet
          GraftOps.fingerprintAppend(b, "doc_id", "text", dir)
          sv
        }
        val oneShot = step(build(), nHist, n)
        val d2 = build()
        val twoStep = step(d2, nHist, cut) ++ step(d2, cut, n)
        // brute-force predicate: with monotone ids, history-wins and
        // smaller-id-wins coincide — drop iff any smaller doc matches
        val sets = docs.map(_.split(" ").toSet)
        def hit(a: Int, b: Int) = {
          val i = (sets(a) & sets(b)).size
          val u = (sets(a) | sets(b)).size
          i * 100 >= u * minPct
        }
        val exactDropped = batchIds.filter(b =>
          (0L until b).exists(o => hit(o.toInt, b.toInt)))
        val dropped = batchIds -- oneShot
        (Prop(twoStep == oneShot) :| s"compose: $twoStep != $oneShot (cut=$cut)") &&
          (Prop(dropped.subsetOf(exactDropped)) :|
            s"precision: dropped $dropped exact $exactDropped")
    }
}

/** dedupEmbAgainstCorpus lifecycle laws on random embedding corpora —
  * the dense-vector mirror of [[NearDedupProps]]: monotone dedup∘append
  * equals one-shot, and every drop has a true ≥ minCosine partner with
  * smaller precedence under the brute-force predicate. */
object EmbDedupProps extends Properties("dedupEmbAgainstCorpus") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  // small integer grid keeps cosines well away from float boundaries
  private val vec: Gen[Array[Float]] =
    Gen.listOfN(3, Gen.chooseNum(0, 3)).map(_.map(_.toFloat).toArray)
      .suchThat(_.exists(_ != 0f))
  private val corpus: Gen[List[Array[Float]]] =
    Gen.chooseNum(4, 7).flatMap(n => Gen.listOfN(n, vec))

  property("monotone batch∘append ≡ one-shot, and drops ⊆ exact predicate") =
    forAll(corpus, Gen.chooseNum(0, 5), Gen.oneOf(90, 95, 99)) {
      (vecs, cutRaw, pct) =>
        val s = spark
        import s.implicits._
        graft.GraftExtensions.register(s)
        val minCos = pct / 100.0
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val n = vecs.size
        val nHist = math.max(1, n / 3)
        val batchIds = (nHist.toLong until n.toLong).toSet
        val cut = nHist + cutRaw % (n - nHist + 1)
        def build(): String = {
          val dir = java.nio.file.Files.createTempDirectory("prop_srp_")
            .toString
          GraftOps.srpIndexBuild(df.filter(col("vec_id") < nHist),
            "vec_id", "embedding", dir, dim = 3)
          dir
        }
        def step(dir: String, lo: Int, hi: Int): Set[Long] = {
          val b = df.filter(col("vec_id") >= lo && col("vec_id") < hi)
          val sv = GraftOps.dedupEmbAgainstCorpus(b, "vec_id", "embedding",
            dir, minCos).select("vec_id").collect().map(_.getLong(0)).toSet
          GraftOps.srpIndexAppend(b, "vec_id", "embedding", dir)
          sv
        }
        val oneShot = step(build(), nHist, n)
        val d2 = build()
        val twoStep = step(d2, nHist, cut) ++ step(d2, cut, n)
        // brute force on the verify's own 4dp-rounded cosine
        def cos(a: Array[Float], b: Array[Float]): Double = {
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x).sum)
          val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
          BigDecimal(dot / (na * nb))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val exactDropped = batchIds.filter(b =>
          (0L until b).exists(o => cos(vecs(o.toInt), vecs(b.toInt)) >= minCos))
        val dropped = batchIds -- oneShot
        (Prop(twoStep == oneShot) :| s"compose: $twoStep != $oneShot") &&
          (Prop(dropped.subsetOf(exactDropped)) :|
            s"precision: $dropped vs exact $exactDropped")
    }
}

/** The bandsFor recall dial: the 1 − (1 − p^r)^b curve must be a lawful
  * monotone dial, the returned split must be the most selective one that
  * meets the target, and — the nProbeFor-curve analog — the predicted
  * at-threshold floor must sit just under every committed RECALL.md
  * SRP sweep measurement and recompute the committed q114/q100/q115
  * index shapes. */
object BandDialProps extends Properties("bandsFor") {

  private val probs = Gen.chooseNum(0.05, 0.99)
  private val widths = Gen.oneOf(8, 16, 32, 64, 128)
  private val targets = Gen.chooseNum(0.5, 0.995)

  property("bandRecall is monotone in the collision probability") =
    forAll(probs, probs, widths) { (p1, p2, n) =>
      val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
      (1 to n).filter(n % _ == 0).forall(b =>
        GraftOps.bandRecall(lo, b, n / b) <=
          GraftOps.bandRecall(hi, b, n / b) + 1e-12)
    }

  property("for a fixed width, recall rises as bands rise (selectivity " +
    "falls)") = forAll(probs, widths) { (p, n) =>
    val rs = (1 to n).filter(n % _ == 0)
      .map(b => GraftOps.bandRecall(p, b, n / b))
    rs.zip(rs.tail).forall { case (a, b) => a <= b + 1e-12 }
  }

  property("minhashBandsFor: meets the target with the most selective " +
    "split, or fails loudly exactly when the widest split misses") =
    forAll(Gen.chooseNum(0.3, 0.95), targets, widths) { (s, t, n) =>
      try {
        val (b, r) = GraftOps.minhashBandsFor(s, t, n)
        Prop(b * r == n && GraftOps.bandRecall(s, b, r) >= t &&
          (1 until b).filter(n % _ == 0).forall(b2 =>
            GraftOps.bandRecall(s, b2, n / b2) < t)) :| s"split ($b,$r)"
      } catch { case e: IllegalArgumentException =>
        Prop(e.getMessage.contains("unreachable") &&
          GraftOps.bandRecall(s, n, 1) < t) :| "loud-unreachable"
      }
    }

  property("srpBandsFor == minhashBandsFor at the mapped bit " +
    "probability; srpBitProb is monotone in the cosine") =
    forAll(Gen.chooseNum(-0.9, 0.99), Gen.chooseNum(-0.9, 0.99), targets,
      widths) { (c1, c2, t, n) =>
      val mono = if (c1 <= c2)
        GraftOps.srpBitProb(c1) <= GraftOps.srpBitProb(c2) else true
      val same =
        try GraftOps.srpBandsFor(c1, t, n) ==
          GraftOps.minhashBandsFor(GraftOps.srpBitProb(c1), t, n)
        catch { case _: IllegalArgumentException =>
          // both sides must agree on unreachability too
          try { GraftOps.minhashBandsFor(GraftOps.srpBitProb(c1), t, n); false }
          catch { case _: IllegalArgumentException => true }
        }
      mono && same
    }

  property("RECALL.md cross-check: the at-threshold floor sits 0-5 " +
    "points under every committed SRP sweep measurement, and the dial " +
    "recomputes the committed index shapes") = {
    val p35 = GraftOps.srpBitProb(0.35)
    // (bands, bitsPerBand) -> measured recall at sf0.01 and sf0.1
    // (RECALL.md "SRP (hyperplane LSH) recall sweep" tables)
    val sweep = Seq(
      (8, 4) -> Seq(0.7316, 0.7473), (4, 8) -> Seq(0.1029, 0.0961),
      (16, 4) -> Seq(0.9154, 0.9293), (8, 8) -> Seq(0.1838, 0.1762))
    val floorHolds = sweep.forall { case ((b, r), measured) =>
      val floor = GraftOps.bandRecall(p35, b, r)
      measured.forall(m => floor <= m + 1e-9 && m - floor <= 0.05)
    }
    // q114's committed fingerprint shape (nHashes=32, bands=8) is the
    // dial's answer for J >= 0.8 at target 0.98, and q100/q115's SRP
    // shape (nBits=64, bands=16) for cos >= 0.35 at target 0.9; the
    // RECALL.md function-default note (cos >= 0.9 on (32,8) ~ 0.998)
    // is bandRecall's own number
    Prop(floorHolds) :| "sweep floor" &&
      Prop(GraftOps.minhashBandsFor(0.8, 0.98, 32) == (8, 4)) :| "q114" &&
      Prop(GraftOps.srpBandsFor(0.35, 0.9, 64) == (16, 4)) :| "q100/q115" &&
      Prop(math.abs(GraftOps.bandRecall(GraftOps.srpBitProb(0.9), 8, 4)
        - 0.998) < 0.001) :| "default-note" &&
      Prop(GraftOps.bandRecall(0.8, 8, 4) <= 1.0) :| "q114 floor sanity"
  }
}

/** chunkByTokens vs an in-memory sliding-window model: identical chunk
  * ids, slice bounds, and re-joined text for random corpora, chunk sizes,
  * and overlaps — plus the layout laws (non-final chunks full, stride
  * spacing, tail always reaching n). */
object ChunkProps extends Properties("chunkByTokens") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val corpora: Gen[List[(Long, List[String])]] = for {
    n <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(n, for {
      m <- Gen.chooseNum(1, 30)
      toks <- Gen.listOfN(m, Gen.identifier.map(_.take(3)))
    } yield toks)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val shapes: Gen[(Int, Int)] = for {
    cs <- Gen.chooseNum(1, 8)
    ov <- Gen.chooseNum(0, cs - 1)
  } yield (cs, ov)

  private def model(toks: List[String], cs: Int, ov: Int)
      : Seq[(Long, Long, Long, String)] = {
    val n = toks.length
    val stride = cs - ov
    val nChunks = if (n <= cs) 1 else ((n - cs + stride - 1) / stride) + 1
    (0 until nChunks).map { k =>
      val from = k * stride
      val to = math.min(n, from + cs)
      (k.toLong, from.toLong, to.toLong, toks.slice(from, to).mkString(" "))
    }
  }

  property("chunks == model; non-final chunks full; tail reaches n") =
    forAll(corpora, shapes) { case (xs, (cs, ov)) =>
      val s = spark
      import s.implicits._
      val df = xs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("id", "text")
      val got = TextAnalysis.chunkByTokens(df, "text", cs, ov)
        .select("id", "chunk_id", "tok_from", "tok_to", "chunk_text")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      val want = xs.map { case (id, t) => id -> model(t, cs, ov) }.toMap
      val laws = want.forall { case (id, chunks) =>
        val n = xs.find(_._1 == id).get._2.length.toLong
        chunks.init.forall { case (_, f, t, _) => t - f == cs.toLong } &&
          chunks.last._3 == n &&
          chunks.sliding(2).forall {
            case Seq(a, b) => b._2 - a._2 == (cs - ov).toLong
            case _ => true
          }
      }
      Prop(got == want) :| "model equality" && Prop(laws) :| "layout laws"
    }
}

/** corpusDiff vs an in-memory two-map diff: identical (id, status) sets
  * for random snapshot pairs with NULL payloads, and includeUnchanged
  * adds exactly the unchanged intersection. */
object CorpusDiffProps extends Properties("corpusDiff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val snapshot: Gen[Map[Long, Option[String]]] = for {
    ids <- Gen.someOf(0L to 9L)
    ps <- Gen.listOfN(ids.size,
      Gen.option(Gen.oneOf("", "a", "b", "longer payload")))
  } yield ids.zip(ps).toMap

  private def modelDiff(o: Map[Long, Option[String]],
      n: Map[Long, Option[String]]): Map[Long, String] =
    (o.keySet ++ n.keySet).map { id =>
      id -> ((o.get(id), n.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
        case _ => sys.error("unreachable")
      })
    }.toMap

  property("diff == model, with and without unchanged rows") =
    forAll(snapshot, snapshot) { (o, n) =>
      val s = spark
      import s.implicits._
      val odf = o.toSeq.toDF("id", "t")
      val ndf = n.toSeq.toDF("id", "t")
      val want = modelDiff(o, n)
      val full = GraftOps.corpusDiff(odf, ndf, "id", Seq("t"),
          includeUnchanged = true).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val changesOnly = GraftOps.corpusDiff(odf, ndf, "id", Seq("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      Prop(full == want) :| "full diff" &&
        Prop(changesOnly == want.filter(_._2 != "unchanged")) :| "suppressed"
    }
}

/** epochShuffle vs a JVM-side md5 model: the emitted positions are exactly
  * the model's per-shard permutation (cross-engine determinism of the
  * ordering key), for random shard layouts and seeds. */
object EpochShuffleProps extends Properties("epochShuffle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val layouts: Gen[List[(Int, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 30L)))
      .map(_.distinct)

  property("positions == md5-model permutation, any layout and seed") =
    forAll(layouts, Gen.chooseNum(0L, 99L)) { (xs, seed) =>
      val s = spark
      import s.implicits._
      val got = GraftOps.epochShuffle(xs.toDF("shard", "k"), "shard",
          Seq("k"), seed).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = xs.groupBy(_._1).flatMap { case (sh, ks) =>
        ks.sortBy { case (_, k) => (md5hex(s"$seed:$sh:$k"), k) }.zipWithIndex
          .map { case ((_, k), i) => (sh, k, i.toLong) }
      }.toSet
      got == want
    }
}

/** packIndexBuild/packIndexAppend vs an in-memory JVM-md5 model: the
  * built corpus keeps its one-shot layout; each appended batch equals its
  * OWN one-shot layout shifted by the per-shard stream lengths recorded
  * so far; two appends compose; the offsets table ends at the union's
  * per-shard totals. */
object PackIndexProps extends Properties("packIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** id -> (shard, within-corpus pack_off), the packSequences model. */
  private def model(docs: Seq[(Long, Long)], nShards: Int)
      : Map[Long, (Int, Long)] =
    docs.map { case (id, nt) =>
        val h = md5hex(id.toString)
        (id, nt, Integer.parseInt(h.take(4), 16) % nShards, h)
      }.groupBy(_._3).flatMap { case (sh, ds) =>
        var off = 0L
        ds.sortBy(d => (d._4, d._1)).map { d =>
          val r = d._1 -> (sh, off); off += d._2; r
        }
      }.toMap

  private def totals(docs: Seq[(Long, Long)], nShards: Int): Map[Int, Long] =
    docs.groupBy { case (id, _) =>
      Integer.parseInt(md5hex(id.toString).take(4), 16) % nShards
    }.view.mapValues(_.map(_._2).sum).toMap

  private val corpora: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(3, 30)
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 50L))
  } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("build == one-shot; appends rebase on recorded lengths and " +
    "compose; final offsets == union totals") =
    forAll(corpora, Gen.chooseNum(1L, 64L), Gen.oneOf(1, 2, 4)) {
      (xs, seqLen, nShards) =>
        val s = spark
        import s.implicits._
        val a = xs.filter(_._1 % 3 != 0)
        val b = xs.filter(d => d._1 % 3 == 0 && d._1 % 2 == 0)
        val c = xs.filter(d => d._1 % 3 == 0 && d._1 % 2 != 0)
        val dir = graft.engine.Tables.scratchDir("prop_packidx_")
        def collectOffs(df: org.apache.spark.sql.DataFrame) =
          df.select("id", "shard", "pack_off").collect()
            .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
        val built = collectOffs(GraftOps.packIndexBuild(
          a.toDF("id", "nt"), "id", "nt", dir, seqLen, nShards))
        val gotB =
          if (b.isEmpty) Map.empty[Long, (Int, Long)]
          else collectOffs(GraftOps.packIndexAppend(
            b.toDF("id", "nt"), "id", "nt", dir))
        val gotC =
          if (c.isEmpty) Map.empty[Long, (Int, Long)]
          else collectOffs(GraftOps.packIndexAppend(
            c.toDF("id", "nt"), "id", "nt", dir))
        val tA = totals(a, nShards)
        val tAB = (tA.keySet ++ totals(b, nShards).keySet).map(sh =>
          sh -> (tA.getOrElse(sh, 0L) +
            totals(b, nShards).getOrElse(sh, 0L))).toMap
        val wantB = model(b, nShards).map { case (id, (sh, off)) =>
          id -> (sh, off + tA.getOrElse(sh, 0L)) }
        val wantC = model(c, nShards).map { case (id, (sh, off)) =>
          id -> (sh, off + tAB.getOrElse(sh, 0L)) }
        val snap = IndexStore.resolve(s, dir).get
        val offs = IndexStore.readTable(s, dir, snap, "offsets").collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val wantOffs = totals(a ++ b ++ c, nShards)
        Prop(built == model(a, nShards)) :| "build == one-shot" &&
          Prop(gotB == wantB) :| "first append rebased on A" &&
          Prop(gotC == wantC) :| "second append rebased on A+B" &&
          Prop(offs == wantOffs) :| "offsets == union totals"
    }
}

/** lengthBucketBatches vs an in-memory model: per-shard length-desc
  * order chunked into batchSize groups — exact assignment equality, plus
  * the contiguity law (batch b's shortest >= batch b+1's longest within
  * every shard). */
object LengthBatchProps extends Properties("lengthBucketBatches") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val corpora: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 20L))
  } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("assignment == model; batches are contiguous length runs") =
    forAll(corpora, Gen.chooseNum(1, 6), Gen.oneOf(1, 2, 4)) {
      (xs, batchSize, nShards) =>
        val s = spark
        import s.implicits._
        val got = GraftOps.lengthBucketBatches(xs.toDF("id", "nt"),
            "id", "nt", batchSize, nShards)
          .select("id", "shard", "batch_id", "batch_pos").collect()
          .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
            r.getLong(3))).toMap
        val want = xs.map { case (id, nt) =>
            (id, nt, Integer.parseInt(md5hex(id.toString).take(4), 16)
              % nShards)
          }.groupBy(_._3).flatMap { case (sh, ds) =>
            ds.sortBy(d => (-d._2, d._1)).zipWithIndex.map { case (d, i) =>
              d._1 -> (sh, (i / batchSize).toLong, (i % batchSize).toLong)
            }
          }.toMap
        val byLen = xs.toMap
        val contiguous = got.toSeq.groupBy(r => (r._2._1, r._2._2)).toSeq
          .groupBy(_._1._1).forall { case (_, batches) =>
            val spans = batches.map { case ((_, b), rs) =>
              b -> (rs.map(r => byLen(r._1)).min,
                rs.map(r => byLen(r._1)).max)
            }.sortBy(_._1)
            spans.sliding(2).forall {
              case Seq((_, (mn, _)), (_, (_, mx2))) => mn >= mx2
              case _ => true
            }
          }
        Prop(got == want) :| "model equality" &&
          Prop(contiguous) :| "contiguity law"
    }
}

/** assembleDocs vs an in-memory model: parts joined per group in
  * (order, part) order — identical output for ANY input row order
  * (the operator is a pure function of the grouped set). */
object AssembleDocsProps extends Properties("assembleDocs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val corpora: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 4L)
      o <- Gen.chooseNum(0L, 9L) // duplicate orders exercise the tiebreak
      p <- Gen.oneOf("a", "b", "hello", "x1")
    } yield (g, o, p))
  } yield rows

  property("assembly == model under any input permutation") =
    forAll(corpora, Gen.chooseNum(0L, 1000L)) { (xs, seed) =>
      val s = spark
      import s.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val got = GraftOps.assembleDocs(shuffled.toDF("g", "o", "p"),
          Seq("g"), "o", "p", sep = "|").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = xs.groupBy(_._1).map { case (g, rs) =>
        (g, rs.map(r => (r._2, r._3)).sorted.map(_._2).mkString("|"),
          rs.size.toLong)
      }.toSet
      got == want
    }
}

/** digestIndexRetract vs a sequenced-set model: for ANY interleaving of
  * append and retract batches over a small content universe, a probe
  * accepts exactly the contents whose LAST affecting op was a retract
  * (never appended, or retracted after their last append) — i.e. the
  * index's live digest set is the left fold live ∪ appends ∖ retracts
  * in op order. A compact inserted at a random point (including the
  * very end) must not change any probe answer — the fold is physical,
  * not semantic. This is the property the sequenced-tombstone design
  * (readTableTagged versions as Iceberg-style delete sequence numbers)
  * exists to provide. */
object DigestRetractProps extends Properties("digestIndexRetract") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val universe: Vector[String] =
    (0 until 8).map(i => s"content number $i words").toVector

  // an op: true = append these contents, false = retract them
  private val ops: Gen[List[(Boolean, Set[Int])]] = for {
    n <- Gen.chooseNum(2, 6)
    o <- Gen.listOfN(n, for {
      isApp <- Gen.oneOf(true, false)
      picks <- Gen.someOf(universe.indices)
    } yield (isApp, picks.toSet))
  } yield o

  property("probe == sequenced-set fold; a compact anywhere changes " +
    "nothing") =
    forAll(ops, Gen.chooseNum(0, 6)) { (xs, compactAt) =>
      val s = spark
      import s.implicits._
      val dir = graft.engine.Tables.scratchDir("prop_digr_")
      GraftOps.digestIndexBuild(
        Seq(0L -> universe(0)).toDF("id", "txt"), "txt", dir, nBuckets = 4)
      var live = Set(0)
      xs.zipWithIndex.foreach { case ((isApp, picks), i) =>
        val df = picks.toSeq.sorted.map(p => (p.toLong, universe(p)))
          .toDF("id", "txt")
        if (isApp) { GraftOps.digestIndexAppend(df, "txt", dir); live ++= picks }
        else { GraftOps.digestIndexRetract(df, "txt", dir); live --= picks }
        if (i == compactAt) GraftOps.digestIndexCompact(s, dir)
      }
      val probe = universe.indices
        .map(p => (900L + p, universe(p), 1)).toDF("id", "txt", "score")
      def accepted() = GraftOps.dedupExactAgainstCorpus(
          probe, "id", "txt", "score", dir)
        .collect().map(r => (r.getLong(0) - 900L).toInt).toSet
      val preFold = accepted()
      GraftOps.digestIndexCompact(s, dir)
      val postFold = accepted()
      val want = universe.indices.toSet -- live
      Prop(preFold == want) :| s"probe == model (got $preFold want $want)" &&
        Prop(postFold == want) :| "the final fold changes no answer"
    }
}

/** The cluster index's defining law: for ANY edge set and ANY split of
  * it into build + append batches (including empty slices and edges
  * that repeat across batches), the resolved clustering equals one-shot
  * connectedComponents over the union — and a compact inserted before
  * the final resolve changes nothing. Union-by-min keeps parents
  * strictly below children, so roots are component minima, which is
  * what makes the equality exact rather than up-to-relabeling. */
object ClusterIndexProps extends Properties("clusterIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val edgeSets: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 25)
    es <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 14L)
      b <- Gen.chooseNum(0L, 14L) if a != b
    } yield (a, b))
  } yield es

  property("build∘append* == one-shot connectedComponents; compact " +
    "changes nothing") =
    forAll(edgeSets, Gen.chooseNum(2, 4), Gen.chooseNum(0L, 999L),
        Gen.oneOf(true, false)) { (es, nBatches, seed, compactMid) =>
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(seed)
      val batches = es.map(e => (rnd.nextInt(nBatches), e))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val dir = graft.engine.Tables.scratchDir("prop_clx_")
      GraftOps.clusterIndexBuild(
        batches.getOrElse(0, Nil).toDF("x", "y"), "x", "y", dir,
        nBuckets = 4)
      (1 until nBatches).foreach { k =>
        val b = batches.getOrElse(k, Nil)
        if (b.nonEmpty)
          GraftOps.clusterIndexAppend(b.toDF("x", "y"), "x", "y", dir)
        if (compactMid && k == 1) GraftOps.clusterIndexCompact(s, dir)
      }
      val got = GraftOps.clusterResolve(s, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = GraftOps.connectedComponents(es.toDF("x", "y"), "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // `got` may omit rootless roots (their membership is implicit —
      // dedupApply's coalesce contract); on every listed node the
      // labels must agree, and nothing outside the one-shot node set
      // may appear
      val agree = got.forall { case (n, c) => want.get(n).contains(c) }
      val covered = want.forall { case (n, c) =>
        got.get(n).contains(c) || (c == n && !got.contains(n)) }
      Prop(agree) :| s"labels agree (got $got want $want)" &&
        Prop(covered) :| s"every one-shot node accounted for " +
          s"(got $got want $want)"
    }

  /** The erasure law: for ANY edge set and ANY retracted node subset,
    * (a) immediately after retract, no retracted id appears in the
    * resolve output — member or label; (b) after compact, the resolved
    * clustering equals one-shot connectedComponents over the SURVIVING
    * edges (both endpoints live) — a bridge node's takedown splits the
    * clusters it alone connected, for any graph shape. */
  property("retract excludes immediately; compact re-derives from " +
    "surviving edges") =
    forAll(edgeSets, Gen.chooseNum(0L, 999L)) { (es, seed) =>
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(seed)
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val retracted = nodes.filter(_ => rnd.nextInt(3) == 0).toSet
      val dir = graft.engine.Tables.scratchDir("prop_clr_")
      GraftOps.clusterIndexBuild(es.toDF("x", "y"), "x", "y", dir,
        nBuckets = 4)
      if (retracted.nonEmpty)
        GraftOps.clusterRetract(retracted.toSeq.toDF("id"), "id", dir)
      val pre = GraftOps.clusterResolve(s, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val noDeadMembers = pre.keySet.intersect(retracted).isEmpty
      val noDeadLabels = pre.values.toSet.intersect(retracted).isEmpty
      GraftOps.clusterIndexCompact(s, dir)
      val post = GraftOps.clusterResolve(s, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val surviving = es.filter(e =>
        !retracted(e._1) && !retracted(e._2))
      val want =
        if (surviving.isEmpty) Map.empty[Long, Long]
        else GraftOps.connectedComponents(surviving.toDF("x", "y"),
            "x", "y")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agree = post.forall { case (n, c) => want.get(n).contains(c) }
      val covered = want.forall { case (n, c) =>
        post.get(n).contains(c) || (c == n && !post.contains(n)) }
      Prop(noDeadMembers) :| s"no retracted member pre-compact ($pre)" &&
        Prop(noDeadLabels) :| s"no retracted label pre-compact ($pre)" &&
        Prop(agree) :| s"post-compact labels agree (got $post want $want)" &&
        Prop(covered) :| s"every surviving-edge node accounted for " +
          s"(got $post want $want)"
    }
}

/** weightedSampleBy / weightedSample vs the Efraimidis–Spirakis race
  * computed in memory: the winner set is exactly the per-stratum (or
  * global) top-k of ln(u)/w clocks over the md5 million-bucket uniform,
  * order-invariant, with (clock desc, id asc) tie-break; null keys and
  * non-positive weights fail loudly. Same-JVM Math.log ⇒ the in-memory
  * clocks are bitwise those Spark computes. */
object WeightedSampleProps extends Properties("weightedSample") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private def clockOf(key: Long, w: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(hex.substring(0, 12), 16) %
      1000000L + 1L) / 1e6
    math.log(u) / w
  }

  private val rows: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 500L),
        Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 1000L))))
      .map(_.distinctBy(_._1))

  property("stratified winners == per-stratum top-k clocks, any order") =
    forAll(rows, Gen.chooseNum(1, 6)) { (xs, k) =>
      val s = spark
      import s.implicits._
      def run(data: Seq[(Long, String, Long)]): Set[Long] =
        GraftOps.weightedSampleBy(data.toDF("id", "g", "w"),
          "id", "w", "g", k).collect().map(_.getLong(0)).toSet
      val expect = xs.groupBy(_._2).values.flatMap(
        _.sortBy(r => (-clockOf(r._1, r._3), r._1)).take(k).map(_._1))
        .toSet
      run(xs) == expect && run(xs.reverse) == expect
    }

  property("global winners == top-k clocks; ⊆ monotone in k") =
    forAll(rows, Gen.chooseNum(1, 6)) { (xs, k) =>
      val s = spark
      import s.implicits._
      val df = xs.toDF("id", "g", "w")
      def run(kk: Int): Set[Long] =
        GraftOps.weightedSample(df, "id", "w", kk)
          .collect().map(_.getLong(0)).toSet
      val expect = xs.sortBy(r => (-clockOf(r._1, r._3), r._1))
        .take(k).map(_._1).toSet
      run(k) == expect && run(k).subsetOf(run(k + 1))
    }

  property("zero/negative/null weight and null key fail loudly") =
    forAll(Gen.oneOf(0L, -3L)) { w =>
      val s = spark
      import s.implicits._
      val bad = Prop.throws(classOf[Exception]) {
        GraftOps.weightedSample(
          Seq((1L, w)).toDF("id", "w"), "id", "w", 1).collect()
      }
      val nullKey = Prop.throws(classOf[Exception]) {
        GraftOps.weightedSample(
          Seq((null.asInstanceOf[java.lang.Long], 5L)).toDF("id", "w"),
          "id", "w", 1).collect()
      }
      bad && nullKey
    }
}

/** quantileByRank vs the order-statistic definition computed in memory
  * (value at ascending rank ceil(pct·n/100) per stratum), order-invariant
  * and duplicate-safe; quantileSketch agrees with the exact path at full
  * accuracy on small strata; null value/stratum fail loudly. */
object QuantileRankProps extends Properties("quantileByRank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val rows: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 500L),
        Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 40L))))
      .map(_.distinctBy(_._1))

  private val pctsGen: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1, 100)).map(_.take(6))

  private def brute(xs: List[(Long, String, Long)], pcts: List[Int])
      : Set[(String, Int, Long, Long)] =
    xs.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.length.toLong
      pcts.distinct.map { p =>
        val rank = ((p * n + 99L) / 100L).toInt
        (g, p, sorted(rank - 1), n)
      }
    }.toSet

  property("exact == in-memory rank selection, any order") =
    forAll(rows, pctsGen) { (xs, pcts) =>
      val s = spark
      import s.implicits._
      def run(data: Seq[(Long, String, Long)]): Set[(String, Int, Long, Long)] =
        GraftOps.quantileByRank(data.toDF("id", "g", "v")
            .select(col("g"), col("v")), "v", "g", pcts)
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSet
      run(xs) == brute(xs, pcts) && run(xs.reverse) == brute(xs, pcts)
    }

  property("sketch at high accuracy == exact on small strata") =
    forAll(rows) { xs =>
      val s = spark
      import s.implicits._
      val df = xs.toDF("id", "g", "v").select(col("g"), col("v"))
      val exact = GraftOps.quantileByRank(df, "v", "g", List(50, 90))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val sk = GraftOps.quantileSketch(df, "v", "g", List(50, 90))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      // percentile_approx's boundary convention differs from type-1 by
      // at most one rank; on small strata assert the REPORT SHAPE (one
      // row per stratum×pct) and that every sketch value is a real data
      // value of its stratum — the mergeability contract, not estimator
      // identity.
      val vals = xs.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      val inData = GraftOps.quantileSketch(df, "v", "g", List(50, 90))
        .collect().forall(r => vals(r.getString(0)).contains(r.getLong(2)))
      sk == exact && inData
    }

  property("null value or stratum fails loudly") =
    forAll(Gen.const(0)) { _ =>
      val s = spark
      import s.implicits._
      Prop.throws(classOf[Exception]) {
        GraftOps.quantileByRank(
          Seq((null.asInstanceOf[java.lang.Long], "a")).toDF("v", "g"),
          "v", "g", List(50)).collect()
      } && Prop.throws(classOf[Exception]) {
        GraftOps.quantileByRank(
          Seq((1L, null.asInstanceOf[String])).toDF("v", "g"),
          "v", "g", List(50)).collect()
      }
    }
}

/** The Bloom sidecar's defining law: verdicts are IDENTICAL with and
  * without it, for any append/retract sequence with a compact anywhere —
  * a bloom-miss row is definitively novel (no false negatives), hits and
  * false positives take the plain pruned-scan path, and retraction's
  * over-approximation (blooms cannot forget until the compact rebuild)
  * only ever routes rows to the exact path. */
object BloomDigestProps extends Properties("digestBloomSidecar") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val universe: Vector[String] =
    (0 until 8).map(i => s"bloom prop content $i body").toVector

  private val ops: Gen[List[(Boolean, Set[Int])]] = for {
    n <- Gen.chooseNum(2, 6)
    o <- Gen.listOfN(n, for {
      isApp <- Gen.oneOf(true, false)
      picks <- Gen.someOf(universe.indices)
    } yield (isApp, picks.toSet))
  } yield o

  property("bloom probe == plain probe == sequenced-set fold, compact " +
    "anywhere") =
    forAll(ops, Gen.chooseNum(0, 6)) { (xs, compactAt) =>
      val s = spark
      import s.implicits._
      val dirB = graft.engine.Tables.scratchDir("prop_blm_")
      val dirP = graft.engine.Tables.scratchDir("prop_blmp_")
      val seed = Seq(0L -> universe(0)).toDF("id", "txt")
      GraftOps.digestIndexBuild(seed, "txt", dirB, nBuckets = 4,
        bloomFpp = Some(0.01))
      GraftOps.digestIndexBuild(seed, "txt", dirP, nBuckets = 4)
      var live = Set(0)
      xs.zipWithIndex.foreach { case ((isApp, picks), i) =>
        val df = picks.toSeq.sorted.map(p => (p.toLong, universe(p)))
          .toDF("id", "txt")
        for (dir <- Seq(dirB, dirP)) {
          if (isApp) GraftOps.digestIndexAppend(df, "txt", dir)
          else GraftOps.digestIndexRetract(df, "txt", dir)
          if (i == compactAt) GraftOps.digestIndexCompact(s, dir)
        }
        if (isApp) live ++= picks else live --= picks
      }
      val probe = universe.indices
        .map(p => (900L + p, universe(p), 1)).toDF("id", "txt", "score")
      def accepted(dir: String) = GraftOps.dedupExactAgainstCorpus(
          probe, "id", "txt", "score", dir)
        .collect().map(r => (r.getLong(0) - 900L).toInt).toSet
      val want = universe.indices.toSet -- live
      val gotB = accepted(dirB)
      val gotP = accepted(dirP)
      GraftOps.digestIndexCompact(s, dirB)
      val gotBFold = accepted(dirB)
      Prop(gotB == want) :| s"bloom probe == model (got $gotB want $want)" &&
        Prop(gotP == want) :| s"plain probe == model (got $gotP want $want)" &&
        Prop(gotBFold == want) :| "the sidecar rebuild changes no answer"
    }
}

/** bm25TopK vs an in-memory Okapi reference, for arbitrary corpora —
  * docs are FIXED-length (6 tokens) so avgdl is exact and every
  * per-(query, doc) score is a ≤ 2-addend double sum, making the
  * comparison bit-exact by construction (two-addend addition is
  * deterministic; no associativity slack): the property pins the
  * formula, the postings join, the per-query ranking, and the rounded
  * tiebreak. Variable-length dl normalization is covered by the q135
  * fixture example and the sf0.01 DuckDB oracle. */
object Bm25Props extends Properties("bm25TopK") {
  import graft.api.GraftOps
  private lazy val spark = graft.engine.SparkTestBase.spark

  private val word: Gen[String] =
    Gen.chooseNum(1, 6).map(i => s"w$i")
  private val doc: Gen[List[String]] = Gen.listOfN(6, word)
  private val corpus: Gen[List[List[String]]] =
    Gen.nonEmptyListOf(doc).map(_.take(8))

  property("ranking equals the in-memory Okapi reference (fixed dl)") =
    forAll(corpus, Gen.chooseNum(1, 4)) { (toks, k) =>
      val s = spark
      import s.implicits._
      val docs = toks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val qs = toks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.take(2)) }
        .toDF("doc_id", "terms")
      val got = GraftOps.bm25TopK(docs, "doc_id", "text", qs, "doc_id",
          "terms", k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toList
      // in-memory reference, mirroring the operator's operation shapes
      val n = toks.size.toDouble
      val avgdl = 6.0
      val dfm: Map[String, Double] = toks.flatMap(_.distinct)
        .groupBy(identity).map { case (t, v) => t -> v.size.toDouble }
      def score(q: Set[String], d: Int): Double = q.toSeq.sorted.map { t =>
        val tf = toks(d).count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          tf * (1.2 + 1.0) /
          (tf + 1.2 * (0.25 + 0.75 * (toks(d).size.toDouble / avgdl)))
      }.sum
      val want = toks.indices.flatMap { qi =>
        val q = toks(qi).take(2).toSet
        val ranked = toks.indices
          .map(d => (d.toLong, BigDecimal(score(q, d))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .filter(_._2 > 0)
          .sortBy { case (d, sc) => (-sc, d) }
          .take(k)
        ranked.zipWithIndex.map { case ((d, sc), i) =>
          (qi.toLong, i + 1, d, sc) }
      }.toList
      Prop(got == want) :| s"got $got\nwant $want"
    }
}

/** The BM25 postings index's defining laws: (1) bm25AgainstCorpus(Q |
  * index) equals the one-shot bm25TopK(liveDocs, Q), where liveDocs is
  * whatever document set the build/append/retract script left live —
  * postings and the (N, Σdl) stats are additive, so retraction is a
  * negative segment and the probe's fold reconstructs the one-shot's
  * tf/df/avgdl exactly (integer sums in double are order-independent);
  * (2) a compact anywhere (folding the arithmetic, dropping
  * net-nonpositive postings) changes no answer. Both paths share the
  * scoring tail, so the law pins the STORE — segments, bucketing,
  * retraction arithmetic, stats folding — not the formula (Bm25Props
  * pins that). */
object Bm25IndexProps extends Properties("bm25Index") {
  import graft.api.GraftOps

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))).map(_.mkString(" "))
  private val universeG: Gen[Vector[String]] =
    Gen.listOfN(6, doc).map(_.toVector)

  property("probe == one-shot bm25TopK over live docs; " +
    "compact changes nothing") =
    forAll(universeG, Gen.listOfN(4, Gen.oneOf(true, false)),
      Gen.chooseNum(0, 3), Gen.chooseNum(1, 3)) {
      (universe, flips, compactAt, k) =>
        val s = spark
        import s.implicits._
        val dir = graft.engine.Tables.scratchDir("prop_bm25_")
        // build on doc 0; then append universe(i) when flips(i-1), else
        // retract the most recently live doc (never the last one) —
        // the documented retract-what-you-appended contract
        GraftOps.bm25IndexBuild(Seq(0L -> universe(0)).toDF("id", "txt"),
          "id", "txt", dir, nBuckets = 4)
        var live = Vector(0L -> universe(0))
        var nextId = 1L
        flips.zipWithIndex.foreach { case (app, i0) =>
          val i = i0 + 1
          if (app) {
            val row = nextId -> universe(i)
            GraftOps.bm25IndexAppend(Seq(row).toDF("id", "txt"),
              "id", "txt", dir)
            live :+= row
            nextId += 1
          } else if (live.size > 1) {
            val victim = live.last
            GraftOps.bm25IndexRetract(Seq(victim).toDF("id", "txt"),
              "id", "txt", dir)
            live = live.init
          }
          if (i0 == compactAt) GraftOps.bm25IndexCompact(s, dir)
        }
        // queries: the first two tokens of the last two universe docs
        val qs = universe.takeRight(2).zipWithIndex
          .map { case (t, i) => (100L + i, t.split(" ").take(2).toSeq) }
          .toDF("qid", "terms")
        def run(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getDouble(3))).toList
        val got = run(GraftOps.bm25AgainstCorpus(qs, "qid", "terms", dir,
          k = k))
        val want = run(GraftOps.bm25TopK(live.toDF("id", "txt"), "id",
          "txt", qs, "qid", "terms", k = k))
        val p1 = Prop(got == want) :| s"probe == one-shot ($got vs $want)"
        GraftOps.bm25IndexCompact(s, dir)
        val got2 = run(GraftOps.bm25AgainstCorpus(qs, "qid", "terms", dir,
          k = k))
        p1 && (Prop(got2 == want) :| "post-compact probe == one-shot")
    }
}

/** dsirScores vs the in-memory DSIR model (per-occurrence 1..2-gram
  * bags, add-one smoothing over the shared feature space, per-doc
  * log-ratio sum) for arbitrary corpora — compared within the 4dp
  * rounding slack (the per-doc sum is a many-addend double sum, so
  * bit-exactness across summation orders is not claimable; 1e-4 is).
  * Plus: the hashed-feature scale path is layout-deterministic, and
  * dsirSelect is exactly the top-k of dsirScores. */
object DsirProps extends Properties("dsirScores") {
  import graft.api.GraftOps

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d"))).map(_.mkString(" "))
  private val corpusG: Gen[List[String]] =
    Gen.chooseNum(2, 6).flatMap(Gen.listOfN(_, doc))
  private val targetG: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, doc))

  private def feats(t: String): Seq[String] = {
    val ts = t.split(" ", -1).toSeq
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  property("scores match the in-memory model within rounding slack; " +
    "select is its exact top-k") =
    forAll(corpusG, targetG, Gen.chooseNum(1, 4)) { (rawT, tgtT, k) =>
      val s = spark
      import s.implicits._
      val raw = rawT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tgt = tgtT.toDF("text")
      val got = GraftOps.dsirScores(raw, "doc_id", "text", tgt, "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val rf = rawT.zipWithIndex.flatMap { case (t, i) =>
        feats(t).map(i.toLong -> _) }
      val tf = tgtT.flatMap(feats)
      val cr = rf.groupBy(_._2).map { case (g, v) => g -> v.size }
      val ct = tf.groupBy(identity).map { case (g, v) => g -> v.size }
      val (nr, nt) = (rf.size.toDouble, tf.size.toDouble)
      val v = (cr.keySet ++ ct.keySet).size.toDouble
      val want = rf.groupBy(_._1).map { case (id, fs) =>
        id -> fs.map { case (_, g) =>
          math.log((ct.getOrElse(g, 0) + 1.0) / (nt + v)) -
            math.log((cr.getOrElse(g, 0) + 1.0) / (nr + v))
        }.sum
      }
      val close = got.keySet == want.keySet && got.forall { case (id, sc) =>
        math.abs(sc - want(id)) <= 1.01e-4
      }
      val sel = GraftOps.dsirSelect(raw, "doc_id", "text", tgt, "text", k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val wantSel = got.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(k)
        .zipWithIndex.map { case ((id, sc), i) => (id, sc, i + 1) }
      (Prop(close) :| s"scores within slack (got $got want $want)") &&
        (Prop(sel.toSeq == wantSel) :|
          s"select == top-k of scores ($sel vs $wantSel)")
    }

  property("hashed-feature path is layout-deterministic") =
    forAll(corpusG, targetG, Gen.chooseNum(1, 4)) { (rawT, tgtT, parts) =>
      val s = spark
      import s.implicits._
      val raw = rawT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tgt = tgtT.toDF("text")
      def run(r: org.apache.spark.sql.DataFrame) =
        GraftOps.dsirScores(r, "doc_id", "text", tgt, "text",
            featureBuckets = Some(64))
          .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val a = run(raw.repartition(parts))
      val b = run(raw.coalesce(1))
      Prop(a.keySet == b.keySet &&
        a.forall { case (id, sc) => math.abs(sc - b(id)) <= 1.01e-4 }) :|
        s"layouts agree ($a vs $b)"
    }
}

/** The DSIR-stats store's defining law (the gram/bm25-index mold):
  * dsirScoreAgainstStats(B | stats(H, T)) equals the one-shot
  * dsirScores(raw = H ∪ B, target = T) restricted to B — for whatever
  * live multiset H an append/retract script leaves on EITHER side (the
  * pool and the target seed both evolve), with a compact anywhere
  * changing nothing. Counts and the N scalars are additive segments, so
  * the probe reconstructs the one-shot's cr/ct/N/V exactly; scores
  * compare within the 4dp slack (distinct summation orders). */
object DsirStatsProps extends Properties("dsirStats") {
  import graft.api.GraftOps

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d"))).map(_.mkString(" "))
  private val universeG: Gen[Vector[String]] =
    Gen.listOfN(7, doc).map(_.toVector)

  property("probe == one-shot over (live pool ∪ batch, live target); " +
    "compact changes nothing") =
    forAll(universeG, Gen.listOfN(4, Gen.chooseNum(0, 2)),
      Gen.chooseNum(0, 3)) { (universe, moves, compactAt) =>
      val s = spark
      import s.implicits._
      val dir = graft.engine.Tables.scratchDir("prop_dsir_")
      // build: pool = universe(0), target seed = universe(1); then four
      // moves: 0 = append to pool, 1 = append to target, 2 = retract
      // the most recent pool append (if any) — the documented contract
      GraftOps.dsirStatsBuild(Seq(0L -> universe(0)).toDF("id", "txt"),
        "id", "txt", Seq(universe(1)).toDF("txt"), "txt", dir,
        nBuckets = 4)
      var pool = Vector(0L -> universe(0))
      var tgtLive = Vector(universe(1))
      var nextId = 1L
      moves.zipWithIndex.foreach { case (mv, i0) =>
        val t = universe(i0 + 2)
        mv match {
          case 0 =>
            GraftOps.dsirStatsAppend(Seq(nextId -> t).toDF("id", "txt"),
              "id", "txt", dir)
            pool :+= (nextId -> t); nextId += 1
          case 1 =>
            GraftOps.dsirStatsAppend(Seq(nextId -> t).toDF("id", "txt"),
              "id", "txt", dir, side = "target")
            tgtLive :+= t; nextId += 1
          case _ if pool.size > 1 =>
            val victim = pool.last
            GraftOps.dsirStatsRetract(Seq(victim).toDF("id", "txt"),
              "id", "txt", dir)
            pool = pool.init
          case _ => ()
        }
        if (i0 == compactAt) GraftOps.dsirStatsCompact(s, dir)
      }
      val batch = universe.takeRight(2).zipWithIndex
        .map { case (t, i) => (900L + i, t) }
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = run(GraftOps.dsirScoreAgainstStats(
        batch.toDF("id", "txt"), "id", "txt", dir))
      val want = run(GraftOps.dsirScores(
        (pool ++ batch).toDF("id", "txt"), "id", "txt",
        tgtLive.toDF("txt"), "txt"))
        .view.filterKeys(_ >= 900L).toMap
      def close(a: Map[Long, Double], b: Map[Long, Double]) =
        a.keySet == b.keySet &&
          a.forall { case (k, x) => math.abs(x - b(k)) <= 1.01e-4 }
      val p1 = Prop(close(got, want)) :| s"probe == one-shot ($got vs $want)"
      GraftOps.dsirStatsCompact(s, dir)
      val got2 = run(GraftOps.dsirScoreAgainstStats(
        batch.toDF("id", "txt"), "id", "txt", dir))
      p1 && (Prop(close(got2, want)) :| "post-compact probe == one-shot")
    }
}

/** bpeTrain vs an in-memory reference BPE (Sennrich's algorithm:
  * count all adjacent symbol pairs weighted by word frequency, merge
  * the max — ties left-asc then right-asc — greedy left-to-right,
  * repeat): the WHOLE merge list must match exactly, for arbitrary
  * corpora, including early stop when every word fuses. Plus encode's
  * lossless invariant: each word's tokens concatenate back to
  * word + marker, under the trained list. */
object BpeProps extends Properties("bpeTrain") {
  import graft.api.TextAnalysis

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.engine.SparkTestBase.spark
  private val Eow = "</w>"

  private val doc: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(m =>
      Gen.listOfN(m, Gen.chooseNum(1, 4).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString))))
      .map(_.mkString(" "))

  private def refBpe(texts: List[String],
      numMerges: Int): List[(Int, String, String, Long)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, v) =>
        (w.map(_.toString).toList :+ Eow) -> v.size.toLong }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= numMerges && !stop) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach(p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, rr), cnt) = counts.toSeq
          .sortBy { case ((l0, r0), c) => (-c, l0, r0) }.head
        out += ((r, l, rr, cnt))
        words = words.toSeq.map { case (syms, f) =>
          val merged = syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == rr)
              acc.init :+ (l + rr)
            else acc :+ x
          }
          merged -> f
        }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        r += 1
      }
    }
    out.toList
  }

  property("the whole merge list equals the reference (ALL THREE train " +
    "methods, local ≡ delta ≡ recount), and encode is lossless under " +
    "it with scan ≡ fold") =
    forAll(Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, doc)),
      Gen.chooseNum(1, 6)) { (texts, k) =>
      val s = spark
      import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def runTrain(method: String) =
        TextAnalysis.bpeTrain(docs, "text", k, method = method)
      val merges = runTrain("delta")
      def asList(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("rank").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getLong(3))).toList
      val got = asList(merges)
      val gotRecount = asList(runTrain("recount"))
      val gotLocal = asList(runTrain("local"))
      val want = refBpe(texts, k)
      def runEnc(encoder: String) =
        TextAnalysis.bpeEncode(docs, "doc_id", "text", merges,
            encoder = encoder)
          .collect().map(r => r.getLong(0) ->
            r.getSeq[String](1).toList).toMap
      val enc = runEnc("fold")
      val encScan = runEnc("scan")
      val lossless = texts.zipWithIndex.forall { case (t, i) =>
        enc(i.toLong).mkString ==
          t.split(" ", -1).map(_ + Eow).mkString
      }
      (Prop(got == want) :| s"delta merges (got $got want $want)") &&
        (Prop(gotRecount == want) :|
          s"recount merges (got $gotRecount want $want)") &&
        (Prop(gotLocal == want) :|
          s"local merges (got $gotLocal want $want)") &&
        (Prop(lossless) :| s"lossless round-trip ($enc vs $texts)") &&
        (Prop(encScan == enc) :|
          s"scan ≡ fold encode (scan $encScan fold $enc)")
    }

  private[api] def refBpeShared(texts: List[String],
      numMerges: Int): List[(Int, String, String, Long)] =
    refBpe(texts, numMerges)
}

/** The lazy-deletion-heap in-memory trainer vs BpeProps' naive
  * reference, DRIVER-ONLY (no Spark jobs), so instances can be big and
  * iterations many enough to stress the stale-entry discipline: counts
  * that fall and recover, exhausted pairs, merge sequences running
  * past the point every word fuses. */
object BpeInMemoryProps extends Properties("bpeTrainInMemory") {
  import graft.api.TextAnalysis

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val Eow = "</w>"

  private val bigDoc: Gen[String] =
    Gen.chooseNum(5, 60).flatMap(m =>
      Gen.listOfN(m, Gen.chooseNum(1, 7).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))))
      .map(_.mkString(" "))

  property("equals the naive reference on larger corpora and deep " +
    "merge sequences (heap stale entries and count-recovery paths)") =
    forAll(Gen.chooseNum(2, 10).flatMap(Gen.listOfN(_, bigDoc)),
      Gen.chooseNum(1, 120)) { (texts, k) =>
      // .toSeq BEFORE the map: mapping a Map to (freq, syms) tuples
      // would re-key by freq and silently collapse same-freq words
      val words = texts.flatMap(_.split(" ", -1))
        .groupBy(identity).toSeq
        .map { case (w, v) =>
          (v.size.toLong, w.map(_.toString).toArray :+ Eow) }
        .toArray
      val got = TextAnalysis.bpeTrainInMemory(words, k).toList
      val want = BpeProps.refBpeShared(texts, k)
      Prop(got == want) :| s"got $got want $want"
    }
}

/** lmPerplexity vs the in-memory add-one bigram model for arbitrary
  * corpora — within the 4dp rounding slack (many-addend double mean),
  * one row per scored doc, NULL ppl exactly for sub-2-token docs. */
object LmPerplexityProps extends Properties("lmPerplexity") {
  import graft.api.GraftOps

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d"))).map(_.mkString(" "))

  property("ppl matches the in-memory model within rounding slack") =
    forAll(Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, doc)),
      Gen.chooseNum(2, 6).flatMap(Gen.listOfN(_, doc))) { (refT, docT) =>
      val s = spark
      import s.implicits._
      val docs = docT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = GraftOps.lmPerplexity(docs, "doc_id", "text",
          refT.toDF("text"), "text")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            r.getInt(2))).toMap
      val refToks = refT.map(_.split(" ", -1).toSeq)
      val uni = refToks.flatten.groupBy(identity)
        .map { case (w, v) => w -> v.size }
      val big = refToks.flatMap(ts => ts.sliding(2).filter(_.size == 2))
        .map(p => (p(0), p(1))).groupBy(identity)
        .map { case (b, v) => b -> v.size }
      val v = uni.size.toDouble
      val want = docT.zipWithIndex.map { case (t, i) =>
        val ts = t.split(" ", -1).toSeq
        val ev = ts.sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq
        val pplOpt = if (ev.isEmpty) None else {
          val m = ev.map { case (p0, w) =>
            math.log((big.getOrElse((p0, w), 0) + 1.0) /
              (uni.getOrElse(p0, 0) + v))
          }.sum / ev.size
          Some(math.exp(-m))
        }
        i.toLong -> (pplOpt, ev.size)
      }.toMap
      val ok = got.keySet == want.keySet && got.forall { case (id, (p, ne)) =>
        val (wp, wne) = want(id)
        ne == wne && ((p, wp) match {
          case (None, None) => true
          case (Some(a), Some(b)) => math.abs(a - b) <= math.max(
            1.01e-4, b * 1e-9)
          case _ => false
        })
      }
      Prop(ok) :| s"got $got want $want"
    }
}

/** The LM-stats store's law: lmPerplexityAgainstStats(B | stats) ≡
  * lmPerplexity(B, R_net) for whatever net reference an arbitrary
  * append/retract/compact script left — unlike the DSIR store, the
  * batch never counts toward the reference (absolute fluency under a
  * frozen corpus). 4dp-boundary comparison, the family's convention. */
object LmStatsProps extends Properties("lmStats") {
  import graft.api.GraftOps

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d"))).map(_.mkString(" "))
  private val universeG: Gen[Vector[String]] =
    Gen.listOfN(7, doc).map(_.toVector)

  property("probe == one-shot over the net reference; compact changes " +
    "nothing") =
    forAll(universeG, Gen.listOfN(4, Gen.chooseNum(0, 1)),
      Gen.chooseNum(0, 3), Gen.oneOf(1, 2)) {
      (universe, moves, compactAt, n) =>
      val s = spark
      import s.implicits._
      val dir = graft.engine.Tables.scratchDir("prop_lmstats_")
      GraftOps.lmStatsBuild(Seq(universe(0)).toDF("txt"), "txt", dir,
        n = n, nBuckets = 4)
      var ref = Vector(universe(0))
      moves.zipWithIndex.foreach { case (mv, i0) =>
        val t = universe(i0 + 1)
        mv match {
          case 0 =>
            GraftOps.lmStatsAppend(Seq(t).toDF("txt"), "txt", dir)
            ref :+= t
          case _ if ref.size > 1 =>
            val victim = ref.last
            GraftOps.lmStatsRetract(Seq(victim).toDF("txt"), "txt", dir)
            ref = ref.init
          case _ => ()
        }
        if (i0 == compactAt) GraftOps.lmStatsCompact(s, dir)
      }
      val batch = universe.takeRight(2).zipWithIndex
        .map { case (t, i) => (900L + i, t) }
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getInt(2))).toList.sortBy(_._1)
      val got = run(GraftOps.lmPerplexityAgainstStats(
        batch.toDF("id", "txt"), "id", "txt", dir))
      val want = run(GraftOps.lmPerplexity(
        batch.toDF("id", "txt"), "id", "txt", ref.toDF("txt"), "txt",
        n = n))
      def close(a: List[(Long, Option[Double], Int)],
          b: List[(Long, Option[Double], Int)]) =
        a.size == b.size && a.zip(b).forall { case ((k1, p1, e1), (k2, p2, e2)) =>
          k1 == k2 && e1 == e2 && ((p1, p2) match {
            case (None, None) => true
            case (Some(x), Some(y)) => math.abs(x - y) <= 1.01e-4
            case _ => false
          })
        }
      val p1 = Prop(close(got, want)) :| s"probe == one-shot ($got vs $want)"
      GraftOps.lmStatsCompact(s, dir)
      val got2 = run(GraftOps.lmPerplexityAgainstStats(
        batch.toDF("id", "txt"), "id", "txt", dir))
      p1 && (Prop(close(got2, want)) :| "post-compact probe == one-shot")
    }
}

/** rrfFuse vs the in-memory rank-fusion model, for arbitrary ranked
  * lists: ≤ 2 lists ⇒ ≤ 2-addend fused sums ⇒ bit-exact comparison. */
object RrfProps extends Properties("rrfFuse") {
  import graft.api.GraftOps
  private lazy val spark = graft.engine.SparkTestBase.spark

  // a ranked list: for each qid in 0..2, a distinct-doc subset ranked
  // 1..m (the shape every retrieval member emits)
  private def rankedFor(qid: Long): Gen[List[(Long, Int, Long)]] =
    Gen.someOf(0L to 5L).map(ds =>
      ds.toList.sorted.zipWithIndex.map { case (d, i) => (qid, i + 1, d) })
  private val oneList: Gen[List[(Long, Int, Long)]] = for {
    a <- rankedFor(0L); b <- rankedFor(1L); c <- rankedFor(2L)
  } yield a ++ b ++ c

  property("fused ranking equals the in-memory RRF model") =
    forAll(oneList, oneList, Gen.chooseNum(1, 5)) { (la, lb, k) =>
      val s = spark
      import s.implicits._
      def df(l: List[(Long, Int, Long)]) =
        l.toDF("qid", "rn", "doc_id")
      val got = GraftOps.rrfFuse(Seq(df(la), df(lb)), k).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toList
      val want = (la ++ lb).groupBy(e => (e._1, e._3)).toSeq
        .map { case ((qid, d), es) =>
          val rrf = BigDecimal(es.map(e => 1.0 / (60 + e._2)).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (qid, d, rrf)
        }
        .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
          rows.sortBy { case (_, d, sc) => (-sc, d) }.take(k).zipWithIndex
            .map { case ((_, d, sc), i) => (qid, i + 1, d, sc) }
        }
        .sortBy(e => (e._1, e._2)).toList
      Prop(got == want) :| s"got $got\nwant $want"
    }
}

/** MisraGriesAgg (the q134 heavy-hitter summary) vs its paper guarantees,
  * for arbitrary corpora, capacities, and partition layouts — pure
  * aggregator laws, no session needed: estimates undercount only and by
  * at most N/(capacity+1) under ANY merge tree (Misra–Gries 1982; merge:
  * Agarwal et al., PODS 2012), every value more frequent than that line
  * survives, and the two-pass candidates-then-exact-count composition
  * therefore equals the brute-force top-k whenever the k-th count clears
  * the line. */
object MisraGriesProps extends Properties("MisraGries") {
  import graft.functions.{MGBuf, MisraGriesAgg}

  private val toks: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(1, 12).map(i => s"t$i"))
  private val caps: Gen[Int] = Gen.chooseNum(1, 8)
  private val parts: Gen[Int] = Gen.chooseNum(1, 5)

  /** Fold the stream in `nParts` chunks, then merge the partials — the
    * shape ObjectHashAggregate's partial/final split produces. */
  private def summarize(xs: List[String], cap: Int,
      nParts: Int): Map[String, Long] = {
    val agg = new MisraGriesAgg(cap)
    val chunks = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts))
      .toList
    agg.finish(chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge))
  }

  property("undercount only, by ≤ N/(cap+1); coverage above the line; " +
    "keys ⊆ true keys — under any partition layout") =
    forAll(toks, caps, parts) { (xs, cap, nParts) =>
      val est = summarize(xs, cap, nParts)
      val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = xs.size.toLong
      val line = n / (cap + 1.0)
      val sound = est.forall { case (k, e) =>
        truth.contains(k) && e >= 1 && e <= truth(k) &&
          truth(k) - e <= line
      }
      val covered = truth.forall { case (k, t) =>
        t <= line || est.contains(k)
      }
      val bounded = est.size <= cap
      Prop(sound) :| s"soundness ($est vs $truth)" &&
        Prop(covered) :| s"coverage above $line ($est vs $truth)" &&
        Prop(bounded) :| "buffer bound"
    }

  property("two-pass (candidates → exact re-count → top-k) equals brute " +
    "force whenever the k-th true count clears N/(cap+1)") =
    forAll(toks, caps, parts) { (xs, cap, nParts) =>
      val k = math.min(3, cap)
      val truth = xs.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
      val brute = truth.toSeq.sortBy { case (kk, c) => (-c, kk) }.take(k)
      val line = xs.size.toLong / (cap + 1.0)
      if (brute.isEmpty || brute.last._2 <= line) Prop.passed
      else {
        val cands = summarize(xs, cap, nParts).keySet
        val twoPass = truth.view.filterKeys(cands).toSeq
          .sortBy { case (kk, c) => (-c, kk) }.take(k)
        Prop(twoPass == brute) :| s"two-pass $twoPass != brute $brute"
      }
    }

  property("merge is commutative on the kept summary") =
    forAll(toks, toks, caps) { (xs, ys, cap) =>
      val agg = new MisraGriesAgg(cap)
      def buf(zs: List[String]): MGBuf = zs.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(buf(xs), buf(ys))) ==
        agg.finish(agg.merge(buf(ys), buf(xs)))
    }
}

/** trainQualityClassifier vs an in-memory full-batch logistic GD over
  * the SAME feature rows (the hash-derivation is a plain groupBy the
  * unit spec covers semantically; the algorithmic content pinned here
  * is the iteration loop): weights within 1e-6 and scores within one
  * 4dp ulp, for arbitrary corpora, labels, iteration counts. */
object QualityClassifierProps extends Properties("qualityClassifier") {
  import graft.api.TextAnalysis

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[(String, Int)] = for {
    m <- Gen.chooseNum(1, 6)
    ws <- Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d", "e"))
    y <- Gen.oneOf(0, 1)
  } yield (ws.mkString(" "), y)

  property("Spark GD == in-memory GD over the same feature rows; " +
    "scores agree") =
    forAll(Gen.chooseNum(2, 6).flatMap(Gen.listOfN(_, doc)),
      Gen.chooseNum(1, 8)) { (docsRaw, iters) =>
      val s = spark
      import s.implicits._
      val docs = docsRaw.zipWithIndex
        .map { case ((t, y), i) => (i.toLong, t, y) }
        .toDF("doc_id", "text", "label")
      val B = 8
      val lr = 0.5
      val model = TextAnalysis.trainQualityClassifier(docs, "doc_id",
          "text", "label", numFeatures = B, iters = iters, lr = lr)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // in-memory GD over the SAME feature rows
      val feats = TextAnalysis.classifierFeats(docs, "doc_id", "text",
          org.apache.spark.sql.functions.col("label"), B, "prop")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
          r.getDouble(3)))
      val byDoc = feats.groupBy(_._1)
      val n = byDoc.size.toDouble
      var w = Map.empty[Int, Double].withDefaultValue(0.0)
      for (_ <- 1 to iters) {
        val resid = byDoc.map { case (did, rows) =>
          val m = rows.map { case (_, _, b, x) => x * w(b) }.sum
          did -> (1.0 / (1.0 + math.exp(-m)) - rows.head._2)
        }
        val grad = feats.groupBy(_._3).map { case (b, rows) =>
          b -> rows.map { case (did, _, _, x) => x * resid(did) }.sum
        }
        w = grad.foldLeft(w) { case (acc, (b, g)) =>
          acc.updated(b, acc(b) - lr * g / n)
        }
      }
      val wOk = (-1 until B).forall(b =>
        math.abs(model.getOrElse(b, 0.0) - w(b)) <= 1e-6)
      // and the scorer reproduces the in-memory probabilities
      val scores = TextAnalysis.qualityScore(docs, "doc_id", "text",
          TextAnalysis.trainQualityClassifier(docs, "doc_id", "text",
            "label", numFeatures = B, iters = iters, lr = lr))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = byDoc.map { case (did, rows) =>
        val m = rows.map { case (_, _, b, x) => x * w(b) }.sum
        did -> 1.0 / (1.0 + math.exp(-m))
      }
      val sOk = want.forall { case (did, p) =>
        math.abs(scores(did) - p) <= 1.01e-4
      }
      (Prop(wOk) :| s"weights (got $model want $w)") &&
        (Prop(sOk) :| s"scores (got $scores want $want)")
    }
}

/** The classifier store's spec-pinned law: for ARBITRARY
  * build/append/retract scripts (retracts always name a live doc with
  * its appended text+label — the store's contract), training against
  * the store equals the one-shot [[TextAnalysis.trainQualityClassifier]]
  * over the net corpus to the suite's 1e-6 weight tolerance, and a
  * compact anywhere in the script changes nothing — the learned gate's
  * erasure story (a retracted document provably stops influencing the
  * next retrain). */
object ClfStoreProps extends Properties("clfStore") {
  import graft.api.TextAnalysis

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.engine.SparkTestBase.spark

  private val doc: Gen[(String, Int)] = for {
    m <- Gen.chooseNum(1, 5)
    ws <- Gen.listOfN(m, Gen.oneOf("a", "b", "c", "d", "e"))
    y <- Gen.oneOf(0, 1)
  } yield (ws.mkString(" "), y)

  property("trainAgainstStore == one-shot train over the net corpus; " +
    "compact changes nothing") =
    forAll(Gen.listOfN(7, doc), Gen.listOfN(4, Gen.chooseNum(0, 1)),
      Gen.chooseNum(0, 3), Gen.chooseNum(1, 5)) {
      (docsRaw, moves, compactAt, iters) =>
      val s = spark
      import s.implicits._
      val universe = docsRaw.zipWithIndex
        .map { case ((t, y), i) => (i.toLong, t, y) }.toVector
      def df(rows: Seq[(Long, String, Int)]) =
        rows.toDF("doc_id", "text", "label")
      val dir = graft.engine.Tables.scratchDir("prop_clfstore_")
      val B = 8
      TextAnalysis.clfStoreBuild(df(universe.take(2)), "doc_id", "text",
        "label", dir, numFeatures = B)
      var live = universe.take(2)
      var next = 2
      moves.zipWithIndex.foreach { case (mv, i0) =>
        mv match {
          case 0 if next < universe.length =>
            TextAnalysis.clfStoreAppend(df(Seq(universe(next))), "doc_id",
              "text", "label", dir)
            live :+= universe(next)
            next += 1
          case _ if live.size > 1 =>
            val victim = live.last
            TextAnalysis.clfStoreRetract(df(Seq(victim)), "doc_id",
              "text", "label", dir)
            live = live.init
          case _ => ()
        }
        if (i0 == compactAt) TextAnalysis.clfStoreCompact(s, dir)
      }
      def wmap(m: org.apache.spark.sql.DataFrame) = m.collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val got = wmap(TextAnalysis.trainClassifierAgainstStore(s, dir,
        iters = iters))
      val want = wmap(TextAnalysis.trainQualityClassifier(df(live),
        "doc_id", "text", "label", numFeatures = B, iters = iters))
      val ok = got.keySet == want.keySet && got.forall { case (b, w) =>
        math.abs(w - want(b)) <= 1e-6 }
      Prop(ok) :| s"live=${live.map(_._1)} got=$got want=$want"
    }
}
