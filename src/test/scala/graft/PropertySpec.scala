package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{BottomKLongBuffer, DistKernel, RngPrune, TopKBuffer, VectorDistance}

/** ScalaCheck properties over the engine's pure kernels (SURVEY.md §5's
  * property list): distance-kernel laws (the analogue of the reference's
  * SIMD-vs-scalar parity suite, `Test/src/DistanceTest.cpp:88-96`,
  * `Test/src/SIMDTest.cpp:51`), bounded top-k buffer correctness, and the
  * RNG prune rule's invariants
  * (`AnnService/inc/Core/Common/RelativeNeighborhoodGraph.h:18-35`).
  */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"property '$name' failed: ${res.status}")
  }

  /** For properties that launch Spark jobs per case: fewer cases. */
  private def checkN(name: String, n: Int, p: Prop): Unit = {
    val res = SCTest.check(params.withMinSuccessfulTests(n), p)
    assert(res.passed, s"property '$name' failed: ${res.status}")
  }

  private def evalDist(metric: String, a: Array[Double], b: Array[Double]): Double =
    VectorDistance(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType)), metric)
      .eval(null).asInstanceOf[Double]

  private val genVec: Gen[Array[Double]] = for {
    d <- Gen.chooseNum(1, 16)
    xs <- Gen.listOfN(d, Gen.chooseNum(-1000.0, 1000.0))
  } yield xs.toArray

  private def genVecPair: Gen[(Array[Double], Array[Double])] = for {
    a <- genVec
    b <- Gen.listOfN(a.length, Gen.chooseNum(-1000.0, 1000.0))
  } yield (a, b.toArray)

  test("distance: l2sq and cos are symmetric, dot == -ip") {
    check("symmetry", Prop.forAll(genVecPair) { case (a, b) =>
      evalDist("l2sq", a, b) == evalDist("l2sq", b, a) &&
      evalDist("cos", a, b) == evalDist("cos", b, a) &&
      evalDist("dot", a, b) == -evalDist("ip", a, b)
    })
  }

  test("distance: l2sq is a non-negative squared metric with zero self-distance") {
    check("l2sq-laws", Prop.forAll(genVecPair) { case (a, b) =>
      evalDist("l2sq", a, a) == 0.0 && evalDist("l2sq", a, b) >= 0.0
    })
  }

  test("distance: sqrt(l2sq) satisfies the triangle inequality") {
    val gen = for {
      (a, b) <- genVecPair
      c <- Gen.listOfN(a.length, Gen.chooseNum(-1000.0, 1000.0))
    } yield (a, b, c.toArray)
    check("triangle", Prop.forAll(gen) { case (a, b, c) =>
      val ab = math.sqrt(evalDist("l2sq", a, b))
      val bc = math.sqrt(evalDist("l2sq", b, c))
      val ac = math.sqrt(evalDist("l2sq", a, c))
      ac <= ab + bc + 1e-6 * (1.0 + ab + bc)
    })
  }

  test("distance: cosine distance lies in [0, 2] and is scale-invariant") {
    check("cos-range", Prop.forAll(genVecPair) { case (a, b) =>
      val d = evalDist("cos", a, b)
      d >= -1e-12 && d <= 2.0 + 1e-12
    })
    val genScaled = for {
      a <- genVec
      s <- Gen.chooseNum(0.001, 100.0)
    } yield (a, s)
    check("cos-scale", Prop.forAll(genScaled) { case (a, s) =>
      val d = evalDist("cos", a, a.map(_ * s))
      if (a.forall(_ == 0.0)) d == 1.0 // zero-norm contract (DistanceUtils.h:105-116)
      else math.abs(d) < 1e-9 // same direction → distance ~0 regardless of scale
    })
  }

  test("distance: codegen'd column equals interpreted eval (SIMD-parity analogue)") {
    // the reference asserts its SIMD kernels match the scalar path bit-for-bit
    // (SIMDTest.cpp); here: whole-stage-codegen'd VectorDistance vs the
    // interpreted nullSafeEval, on float inputs widened per-element
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong,
        Array.fill(8)(rnd.nextFloat() * 200f - 100f),
        Array.fill(8)(rnd.nextFloat() * 200f - 100f))
    }
    val df = spark.createDataFrame(rows).toDF("id", "a", "b")
    for (m <- VectorDistance.Metrics) {
      val got = df.select(col("id"), graft.functions.dist.byName(m)(col("a"), col("b")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach { case (id, a, b) =>
        val want = evalDist(m, a.map(_.toDouble), b.map(_.toDouble))
        assert(got(id) == want, s"metric $m id $id: codegen ${got(id)} != interpreted $want")
      }
    }
  }

  private val genScored: Gen[List[(Long, Double)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0L, 50L) // small id range → deliberate dist ties
      d <- Gen.oneOf(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0.0, 0.5))
    } yield (id, d))

  test("topk buffer: equals sort-take(k) under any insertion order, ties on id") {
    val gen = for { xs <- genScored; k <- Gen.chooseNum(1, 12) } yield (xs, k)
    check("topk-sort", Prop.forAll(gen) { case (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (id, d) => buf.insert(d, id) }
      val want = xs.map { case (id, d) => (id, d) }.sortBy { case (id, d) => (d, id) }.take(k)
      buf.sorted.toList == want
    })
  }

  test("topk buffer: split-merge equals single-buffer (partial aggregation law)") {
    val gen = for {
      xs <- genScored
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, k, cut)
    check("topk-merge", Prop.forAll(gen) { case (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut)
      val bl = new TopKBuffer(k); l.foreach { case (id, d) => bl.insert(d, id) }
      val br = new TopKBuffer(k); r.foreach { case (id, d) => br.insert(d, id) }
      var i = 0
      while (i < br.size) { bl.insert(br.dists(i), br.ids(i)); i += 1 }
      val whole = new TopKBuffer(k); xs.foreach { case (id, d) => whole.insert(d, id) }
      bl.sorted.toList == whole.sorted.toList
    })
  }

  test("topk distinct buffer: equals topk over the distinct-id set (replica-dedup law)") {
    // each id carries ONE deterministic dist (the SPANN contract); the stream
    // repeats ids (replicas) in arbitrary order and may split across buffers
    val gen = for {
      base <- Gen.mapOf(Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0.0, 10.0)))
      reps <- Gen.listOf(Gen.oneOf(base.keys.toSeq :+ 0L))
      k <- Gen.chooseNum(1, 8)
      cut <- Gen.chooseNum(0, reps.length)
    } yield (base + (0L -> base.getOrElse(0L, 1.0)), reps, k, cut)
    check("topk-distinct", Prop.forAll(gen) { case (dists, stream, k, cut) =>
      val want = dists.view.filterKeys(stream.toSet).toList
        .map { case (id, d) => (id, d) }.sortBy { case (id, d) => (d, id) }.take(k)
      val whole = new TopKBuffer(k, distinct = true)
      stream.foreach(id => whole.insert(dists(id), id))
      val (l, r) = stream.splitAt(cut)
      val bl = new TopKBuffer(k, distinct = true)
      val br = new TopKBuffer(k, distinct = true)
      l.foreach(id => bl.insert(dists(id), id))
      r.foreach(id => br.insert(dists(id), id))
      var i = 0
      while (i < br.size) { bl.insert(br.dists(i), br.ids(i)); i += 1 }
      whole.sorted.toList == want && bl.sorted.toList == want
    })
  }

  test("norm-pruned L2 scan equals the full flat scan (triangle-prune exactness law)") {
    // r15 perf: NearestHeadsExpr's L2 path scans norm-sorted candidates with
    // triangle-inequality stops — the kept (dist, id) set must equal the
    // unpruned scan's on any input, ties and duplicate norms included
    val gen = for {
      dim <- Gen.chooseNum(1, 8)
      nh <- Gen.chooseNum(1, 60)
      heads <- Gen.listOfN(nh, Gen.listOfN(dim,
        Gen.oneOf(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0.0, 2.0))))
      q <- Gen.listOfN(dim,
        Gen.oneOf(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0.0, 2.0)))
      k <- Gen.chooseNum(1, 8)
    } yield (q.toArray, heads.map(_.toArray).toArray, k)
    check("norm-prune", Prop.forAll(gen) { case (q, heads, k) =>
      val dim = q.length
      val ids = heads.indices.map(_.toLong).toArray
      val flat = new Array[Double](heads.length * dim)
      heads.indices.foreach(h => System.arraycopy(heads(h), 0, flat, h * dim, dim))
      val norms = heads.map(hv => hv.map(x => x * x).sum)
      val plain = new TopKBuffer(k)
      DistKernel.scanFlat(q, flat, ids, norms, dim, DistKernel.L2, plain)
      val order = norms.zipWithIndex
        .sortBy(_._1)(Ordering.Double.TotalOrdering).map(_._2)
      val flatS = new Array[Double](heads.length * dim)
      order.indices.foreach(i =>
        System.arraycopy(heads(order(i)), 0, flatS, i * dim, dim))
      val pruned = new TopKBuffer(k)
      DistKernel.scanFlatNormPruned(q, flatS, order.map(ids),
        order.map(h => math.sqrt(norms(h))), dim, pruned)
      pruned.sorted.toList == plain.sorted.toList
    })
  }

  private val genCands: Gen[List[(Long, Double, Array[Double])]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0L, 1000L)
      v <- Gen.listOfN(4, Gen.chooseNum(-50.0, 50.0))
    } yield (id, 0.0, v.toArray))
      .map(_.distinctBy(_._1))
      .map { cs =>
        // dist-to-node consistent with a node at the origin
        cs.map { case (id, _, v) => (id, RngPrune.l2sq(v, Array.fill(4)(0.0)), v) }
      }

  test("rng prune: accepted ⊆ candidates, bounded, order-invariant, closest kept") {
    val gen = for {
      cs <- genCands
      f <- Gen.oneOf(0.5, 1.0, 2.0)
      cap <- Gen.chooseNum(1, 8)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (cs, f, cap, seed)
    check("rng-basic", Prop.forAll(gen) { case (cs, f, cap, seed) =>
      val acc = RngPrune.prune(cs, f, cap)
      val ids = cs.map(_._1).toSet
      val shuffled = new scala.util.Random(seed).shuffle(cs)
      acc.size <= cap &&
      acc.forall(ids.contains) &&
      RngPrune.prune(shuffled, f, cap) == acc &&
      (cs.isEmpty || acc.headOption.contains(
        cs.minBy { case (id, d, _) => (d, id) }._1))
    })
  }

  test("rng prune: idempotent — pruning the accepted set changes nothing") {
    val gen = for {
      cs <- genCands
      f <- Gen.oneOf(0.5, 1.0, 2.0)
      cap <- Gen.chooseNum(1, 8)
    } yield (cs, f, cap)
    check("rng-idempotent", Prop.forAll(gen) { case (cs, f, cap) =>
      val acc = RngPrune.prune(cs, f, cap)
      val accSet = acc.toSet
      val accCands = cs.filter(c => accSet.contains(c._1))
      RngPrune.prune(accCands, f, cap) == acc
    })
  }

  test("SDC tables: symmetric, zero diagonal, equal to reconstruction l2sq") {
    import graft.functions.PQ
    val genCb: Gen[PQ.Codebooks] = for {
      m <- Gen.chooseNum(1, 4)
      k <- Gen.chooseNum(2, 8)
      dsub <- Gen.chooseNum(1, 4)
      cs <- Gen.listOfN(m, Gen.listOfN(k,
        Gen.listOfN(dsub, Gen.chooseNum(-100.0, 100.0))))
    } yield PQ.Codebooks(m, k, dsub, cs.map(_.map(_.toArray).toArray).toArray)
    check("sdc laws", Prop.forAll(genCb) { cb =>
      val t = PQ.sdcTables(cb)
      val sym = t.forall(sub => sub.indices.forall(a =>
        sub.indices.forall(b => sub(a)(b) == sub(b)(a))))
      val diag = t.forall(sub => sub.indices.forall(a => sub(a)(a) == 0.0))
      // table entry IS the subspace reconstruction distance
      val recon = t.zipWithIndex.forall { case (sub, s) =>
        sub.indices.forall { a =>
          sub.indices.forall { b =>
            val ca = cb.centers(s)(a); val cs2 = cb.centers(s)(b)
            val d = ca.zip(cs2).map { case (x, y) => (x - y) * (x - y) }.sum
            math.abs(sub(a)(b) - d) < 1e-9
          }
        }
      }
      sym && diag && recon
    })
  }

  test("LSH band split: bands reassemble the code exactly (lossless banding)") {
    val genCode: Gen[Long] = Gen.chooseNum(0L, 255L)
    check("band reassembly", Prop.forAll(genCode) { code =>
      // 4 bands of 2 planes, as bandedCodes/lshBandCtes define them
      val bands = (0 until 4).map(b => (code >> (b * 2)) % 4)
      val rebuilt = bands.zipWithIndex.map { case (bv, b) => bv << (b * 2) }.sum
      rebuilt == code &&
      // two codes agree on band b iff their b-th 2-bit slices are equal —
      // the pigeonhole the candidate equi-join relies on
      bands.forall(bv => bv >= 0 && bv < 4)
    })
  }

  test("minhash coefficients: affine products stay int64-exact under M31") {
    // (a_j·h + b_j) with h < M31 must not overflow 2^62 (Dedup.scala contract)
    for (j <- 0 until 64) {
      val a = graft.operators.Dedup.minhashA(j)
      val b = graft.operators.Dedup.minhashB(j)
      assert(a > 0 && a < Dedup31 && b >= 0 && b < Dedup31, s"coeff bounds at j=$j")
      assert(a <= (Long.MaxValue - b) / (Dedup31 - 1), s"overflow possible at j=$j")
    }
  }
  private val Dedup31 = graft.operators.Dedup.M31

  test("bpe fold: the in-row string fold equals plain-Scala greedy pair merge") {
    // the reference semantics: replace every LEFT-TO-RIGHT-GREEDY (x, y)
    // adjacency with the merged symbol; newly formed symbols never
    // re-participate within the same pass
    def greedy(syms: List[String], x: String, y: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          out += (x + y); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val genSym = Gen.oneOf("a", "b", "c", "ab", "bc")
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      syms <- Gen.listOfN(n, genSym)
      x <- genSym
      y <- genSym
    } yield (syms, x, y)
    import spark.implicits._
    check("bpe-fold", Prop.forAll(gen) { case (syms, x, y) =>
      val folded = Seq(syms.mkString(" ")).toDF("seg")
        .withColumn("syms", split(col("seg"), " "))
        .select(aggregate(
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          element_at(col("syms"), 1),
          (acc, s) => when(
            (acc === lit(x) || acc.endsWith(s" $x")) && s === lit(y),
            concat(acc, lit(y))).otherwise(concat(acc, lit(" "), s))))
        .head().getString(0)
      folded == greedy(syms, x, y).mkString(" ")
    })
  }

  test("bottom-k long buffer: equals distinct-sort-take(k); split-merge law (KMV)") {
    // small value range → deliberate duplicates (the distinct contract)
    val genVals = Gen.listOf(Gen.chooseNum(0L, 60L))
    val gen = for {
      xs <- genVals
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, k, cut)
    check("bottomk-sort", Prop.forAll(gen) { case (xs, k, _) =>
      val buf = new BottomKLongBuffer(k)
      xs.foreach(buf.insert)
      buf.sorted.toList == xs.distinct.sorted.take(k)
    })
    check("bottomk-merge", Prop.forAll(gen) { case (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut)
      val bl = new BottomKLongBuffer(k); l.foreach(bl.insert)
      val br = new BottomKLongBuffer(k); r.foreach(br.insert)
      var i = 0
      while (i < br.size) { bl.insert(br.vals(i)); i += 1 }
      val whole = new BottomKLongBuffer(k); xs.foreach(whole.insert)
      bl.sorted.toList == whole.sorted.toList
    })
  }

  test("curriculum closed-form tier/pct equal Spark's own ntile/percent_rank") {
    import spark.implicits._
    // random per-source score sets with deliberate raw-score ties; compare
    // the two-level-rank arithmetic against the window functions directly
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      buckets <- Gen.chooseNum(1, 7)
      scores <- Gen.listOfN(n, Gen.chooseNum(0, 12))
    } yield (buckets, scores)
    checkN("curriculum-ntile", 12, Prop.forAll(gen) { case (buckets, scores) =>
      val docs = scores.zipWithIndex.map { case (s, i) =>
        // text whose quality varies with s deterministically: s copies of a
        // stopword among filler makes stop_ratio (hence quality) vary
        (i.toLong, "src", ("the " * s) + ("zz " * (13 - s)))
      }.toDF("doc_id", "source", "text")
      val got = graft.operators.Pipeline.curriculum(docs, buckets)
        .select("doc_id", "tier", "pct").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      val want = docs
        .withColumn("quality",
          graft.operators.TextAnalysis.qualityRaw(col("text")))
        .select(col("doc_id"), ntile(buckets).over(w).as("tier"),
          round(percent_rank().over(w), 6).as("pct"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(_._1)
      got.toList == want.toList
    })
  }

  test("gini: equals the sorted-rank reference; bounded in [0, 1)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
    checkN("gini-reference", 12, Prop.forAll(gen) { vals =>
      val got = graft.operators.Pipeline.gini(vals.toDF("v"), "v")
        .collect()(0)
      val sorted = vals.sorted
      val n = sorted.length.toLong
      val tot = sorted.sum
      val ri = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want =
        if (tot == 0) 0.0
        else BigDecimal(2.0 * ri / (n.toDouble * tot) - (n + 1).toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got.getLong(0) == n && got.getLong(1) == tot &&
        got.getDouble(2) == want &&
        got.getDouble(2) >= 0.0 && got.getDouble(2) < 1.0
    })
  }

  test("waterfillAllocate: never over budget, never over cap, saturation " +
      "is exactly allocated == cap") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 6)
      ws <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
      cs <- Gen.listOfN(n, Gen.chooseNum(0L, 3000L))
      b <- Gen.chooseNum(0L, 8000L)
    } yield (ws, cs, b)
    checkN("waterfill-laws", 10, Prop.forAll(gen) { case (ws, cs, b) =>
      val per = ws.zip(cs).zipWithIndex
        .map { case ((w, c), i) => (s"s$i", w, c) }
        .toDF("source", "weight1e6", "cap")
      val got = graft.operators.Pipeline.waterfillAllocate(per, b).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      // allocations live in [0, cap]; the saturation flag is EXACTLY
      // allocated == cap (a computed hit on the cap saturates that round);
      // floor division can only under-allocate, never overspend
      got.forall { case (_, cap, a, sat) =>
        a >= 0 && a <= cap && sat == (a == cap) } &&
        got.map(_._3).sum <= b
    })
  }

  test("wasserstein1: equals the sorted-sample L1 reference on equal-size " +
      "samples; symmetric") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      a <- Gen.listOfN(n, Gen.chooseNum(0, 40).map(_ / 4.0))
      b <- Gen.listOfN(n, Gen.chooseNum(0, 40).map(_ / 4.0))
    } yield (a, b)
    checkN("w1-reference", 10, Prop.forAll(gen) { case (a, b) =>
      import graft.operators.Eval
      val g1 = Eval.wasserstein1(a.toDF("v"), b.toDF("v"), "v")
        .collect()(0).getDouble(2)
      val g2 = Eval.wasserstein1(b.toDF("v"), a.toDF("v"), "v")
        .collect()(0).getDouble(2)
      // equal-size closed form: mean |a_(i) − b_(i)| over sorted samples
      val want = a.sorted.zip(b.sorted)
        .map { case (x, y) => math.abs(x - y) }.sum / a.length
      g1 == g2 && math.abs(g1 - want) < 1e-6
    })
  }

  test("kaplanMeier equals a plain-Scala product-limit reference on " +
      "random censored cohorts") {
    import spark.implicits._
    val H = 6 // horizon in hours; censored subjects carry duration H
    val gen = for {
      n <- Gen.chooseNum(3, 10)
      durs <- Gen.listOfN(n, Gen.chooseNum(1, 5))
      obs <- Gen.listOfN(n, Gen.chooseNum(0, 9).map(_ < 7))
    } yield durs.zip(obs)
    checkN("km-reference", 6, Prop.forAll(gen) { subjects =>
      // all users sign up at 10:00; observed user u purchases dur hours
      // later; a horizon anchor pins max ts at +H hours
      val rows = subjects.zipWithIndex.flatMap { case ((dur, ob), u) =>
        val su = (u * 10 + 1L, "2026-01-01 10:00:00", u.toLong, "signup", 0.0)
        if (ob) Seq(su, (u * 10 + 2L, f"2026-01-01 ${10 + dur}%02d:00:00",
          u.toLong, "purchase", 0.0))
        else Seq(su)
      } :+ (99999L, f"2026-01-01 ${10 + H}%02d:00:00", 888L, "view", 0.0)
      val got = graft.operators.Events.kaplanMeier(
        rows.toDF("event_id", "_ts", "user_id", "event_type", "value")
          .withColumn("ts", to_timestamp(col("_ts"))).drop("_ts"))
        .orderBy("t_sec")
        .select("t_sec", "n_risk", "n_events", "n_censored", "survival")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      // plain-Scala product-limit with the same 8dp log staging
      val durations = subjects.map { case (dur, ob) =>
        (if (ob) dur.toLong else H.toLong) * 3600L -> ob }
      val hist = durations.groupBy(_._1).map { case (t, xs) =>
        (t, xs.count(_._2).toLong, xs.count(!_._2).toLong) }.toSeq.sortBy(_._1)
      var atRisk = durations.size.toLong
      var lnSum = BigDecimal(0)
      var dead = false
      val want = hist.flatMap { case (t, d, c) =>
        val row = if (d > 0) {
          if (d == atRisk) dead = true
          else lnSum += BigDecimal(math.log(1.0 - d.toDouble / atRisk))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
          val s = if (dead) 0.0
            else BigDecimal(math.exp(lnSum.toDouble))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((t, atRisk, d, c, s))
        } else None
        atRisk -= (d + c)
        row
      }
      got == want
    })
  }

  test("rboAt: equals the per-depth definition on random rankings; " +
      "bounded by the self-agreement maximum") {
    import spark.implicits._
    val k = 5; val p = 0.9
    val gen = for {
      pa <- Gen.pick(k, 0L until 12L)
      pb <- Gen.pick(k, 0L until 12L)
    } yield (pa.toList, pb.toList)
    checkN("rbo-definition", 10, Prop.forAll(gen) { case (pa, pb) =>
      import graft.operators.Eval
      def rk(ids: List[Long]) = ids.zipWithIndex
        .map { case (id, i) => (1L, i + 1, id) }.toDF("query_id", "rank", "id")
      val got = Eval.rboAt(rk(pa), rk(pb), k, p).collect()(0).getDouble(1)
      // direct definition: (1−p)/p Σ_d p^d · |A_d ∩ B_d| / d, with each
      // match's contribution staged through the same 12dp weights
      val w = Eval.rboWeights(k, p).toMap
      val want = pa.zipWithIndex.flatMap { case (id, i) =>
        val j = pb.indexOf(id)
        if (j < 0) None else Some(w(math.max(i, j).toLong + 1))
      }.sum
      val selfMax = Eval.rboWeights(k, p).map(_._2).sum
      got == BigDecimal(want.toDouble).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble &&
        got <= selfMax.toDouble + 1e-9 && got >= 0.0
    })
  }

  test("AutoTune.markBest: the Spark struct-min pick equals the plain-Scala " +
      "floor-then-cost rule on random sweep tables") {
    import spark.implicits._
    // random (cfg, n_true, n_hit≤n_true, n_cand) tables with duplicate-free
    // config keys; floors span never-met .. always-met
    val genRow = for {
      nTrue <- Gen.chooseNum(0L, 50L)
      nHit <- Gen.chooseNum(0L, nTrue)
      nCand <- Gen.chooseNum(0L, 10000L)
    } yield (nTrue, nHit, nCand)
    val gen = for {
      n <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(n, genRow)
      floorBp <- Gen.oneOf(0, 5000, 8000, 10000, 10001)
    } yield (rows.zipWithIndex.map { case ((t, h, c), i) => (i, t, h, c) },
      floorBp)
    checkN("markBest-reference", 12, Prop.forAll(gen) { case (rows, floorBp) =>
      val table = rows.toDF("cfg", "n_true", "n_hit", "n_cand")
      val got = graft.operators.AutoTune
        .markBest(table, Seq("cfg"), floorBp)
        .collect().filter(_.getAs[Boolean]("best"))
        .map(_.getAs[Int]("cfg")).toSeq
      val meets = rows.filter { case (_, t, h, _) =>
        h * 10000L >= floorBp.toLong * t }
      val want =
        if (meets.nonEmpty) meets.minBy { case (cfg, _, _, c) => (c, cfg) }._1
        else rows.minBy { case (cfg, _, h, _) => (-h, cfg) }._1
      got == Seq(want)
    })
  }

  test("kendallTau: the grid prefix-sum closed form equals brute-force " +
      "pair counting with tie correction on random tied samples") {
    import spark.implicits._
    import graft.operators.Eval
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, 6L))
      ys <- Gen.listOfN(n, Gen.chooseNum(0L, 6L))
    } yield xs.zip(ys)
    checkN("kendall-brute", 12, Prop.forAll(gen) { pairs =>
      val got = Eval.kendallTau(pairs.toDF("x", "y"), "x", "y")
        .collect()(0).getDouble(1)
      var cc = 0L; var dd = 0L
      for (i <- pairs.indices; j <- 0 until i) {
        val sx = math.signum((pairs(i)._1 - pairs(j)._1).toDouble)
        val sy = math.signum((pairs(i)._2 - pairs(j)._2).toDouble)
        if (sx * sy > 0) cc += 1 else if (sx * sy < 0) dd += 1
      }
      val n = pairs.length.toLong
      def ties(vs: Seq[Long]) =
        vs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      val da = n * (n - 1) - ties(pairs.map(_._1))
      val db = n * (n - 1) - ties(pairs.map(_._2))
      val want =
        if (da > 0 && db > 0)
          BigDecimal(2.0 * (cc - dd) / math.sqrt(da.toDouble * db.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
      math.abs(got - want) < 2e-6
    })
  }

  test("ksStat: equals the plain-Scala two-sample sup-gap on random " +
      "integer samples") {
    import spark.implicits._
    import graft.operators.Eval
    val gen = for {
      na <- Gen.chooseNum(1, 30); nb <- Gen.chooseNum(1, 30)
      as <- Gen.listOfN(na, Gen.chooseNum(0, 9))
      bs <- Gen.listOfN(nb, Gen.chooseNum(0, 9))
    } yield (as.map(_.toDouble), bs.map(_.toDouble))
    checkN("ks-reference", 12, Prop.forAll(gen) { case (as, bs) =>
      val got = Eval.ksStat(as.toDF("v"), bs.toDF("v"), "v")
        .collect()(0).getDouble(2)
      val vals = (as ++ bs).distinct.sorted
      val want = vals.map { v =>
        math.abs(as.count(_ <= v).toDouble / as.size -
          bs.count(_ <= v).toDouble / bs.size)
      }.max
      math.abs(got - want) < 2e-6
    })
  }

  test("quantileNormalize: per-source mapping is monotone, covers every " +
      "(source, v), and preserves per-source counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Pipeline
    val gen = for {
      n <- Gen.chooseNum(2, 60)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("s1", "s2", "s3")
        v <- Gen.chooseNum(0L, 12L)
      } yield (s, v))
    } yield rows
    checkN("qnorm-invariants", 10, Prop.forAll(gen) { rows =>
      val got = Pipeline.quantileNormalize(rows.toDF("source", "v"),
          "source", col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val bySrc = got.groupBy(_._1)
      val inKeys = rows.groupBy(identity).map { case ((s, v), g) =>
        (s, v) -> g.size.toLong }
      // coverage + counts
      val covers = inKeys.forall { case ((s, v), c) =>
        got.exists(r => r._1 == s && r._2 == v && r._4 == c) } &&
        got.length == inKeys.size
      // monotone: higher v never maps below a lower v's image
      val mono = bySrc.values.forall { rs =>
        rs.toSeq.sortBy(_._2).sliding(2).forall {
          case Seq(a, b) => a._3 <= b._3
          case _ => true
        }
      }
      covers && mono
    })
  }

  test("video codec: synthAviGray → decodeVideo is exact for random " +
      "frame counts, dims, and gray sequences") {
    import graft.operators.Multimodal
    val gen = for {
      nf <- Gen.chooseNum(1, 5)
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      grays <- Gen.listOfN(nf, Gen.chooseNum(0, 255))
    } yield (nf, w, h, grays)
    checkN("avi-roundtrip", 20, Prop.forAll(gen) { case (nf, w, h, grays) =>
      val avi = Multimodal.synthAviGray(grays(_), nf, w, h)
      Multimodal.decodeVideo(avi) match {
        case Some(frames) =>
          frames.length == nf && frames.zipWithIndex.forall {
            case ((fw, fh, plane), i) =>
              fw == w && fh == h && plane.length == w * h &&
                plane.forall(_ == grays(i) / 255f)
          }
        case None => false
      }
    })
  }
}
