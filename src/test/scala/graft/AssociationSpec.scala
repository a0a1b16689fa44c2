package graft

import graft.operators.Association

class AssociationSpec extends SparkSpec {

  test("basketLift: exact counts and lift on a hand-checked fixture; " +
      "duplicate lines dedupe; mega-basket dropped") {
    import spark.implicits._
    // baskets: 1:{a,b} 2:{a,b} 3:{a,c} 4:{b} 5: 70-item mega (dropped)
    // basket 2 lists item a twice — must count once
    val rows =
      Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"), (2L, "b"),
        (3L, "a"), (3L, "c"), (4L, "b")) ++
        (1 to 70).map(i => (5L, s"x$i"))
    val got = Association.basketLift(rows.toDF("b", "i"), "b", "i",
      minPairCount = 2L, maxBasket = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // kept baskets N=4; cnt a=3 b=3 c=1; pairs: (a,b)=2 (a,c)=1
    // only (a,b) passes minPairCount; lift = 2*4/(3*3)
    assert(got.toSeq === Seq(("a", "b", 2L, 3L, 3L,
      BigDecimal(2.0 * 4 / (3.0 * 3)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("basketLift: lift direction — attracting pair > 1, repelling < 1") {
    import spark.implicits._
    // p,q always together (4 of 8 baskets); p,r never together
    val rows = (1 to 4).flatMap(b => Seq((b.toLong, "p"), (b.toLong, "q"))) ++
      (5 to 8).flatMap(b => Seq((b.toLong, "r"), (b.toLong, "s")))
    val got = Association.basketLift(rows.toDF("b", "i"), "b", "i",
      minPairCount = 1L, maxBasket = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5)))
      .toMap
    assert(got(("p", "q")) === 2.0) // 4·8/(4·4)
    assert(got(("r", "s")) === 2.0)
    assert(!got.contains(("p", "r"))) // zero co-occurrence never surfaces
  }

  test("mutualInformation: independence → mi 0; identical balanced binary " +
      "→ mi = ln 2, nmi 1; NULLs excluded; constant column → nmi 0") {
    import spark.implicits._
    // perfectly independent 2×2 (every cell 2): knowing x says nothing
    val ind = Seq.tabulate(8)(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val gi = Association.mutualInformation(ind, "x", "y").collect()(0)
    assert(gi.getLong(0) === 8L)
    assert(gi.getDouble(3) === 0.0 && gi.getDouble(4) === 0.0)
    // identical balanced binary: H(A) = H(B) = MI = ln 2, nmi = 1
    val same = (Seq.fill(4)(("a0", "b0")) ++ Seq.fill(4)(("a1", "b1")))
      .toDF("x", "y")
    val gs = Association.mutualInformation(same, "x", "y").collect()(0)
    assert(gs.getDouble(1) === 0.693147 && gs.getDouble(2) === 0.693147)
    assert(gs.getDouble(3) === 0.693147 && gs.getDouble(4) === 1.0)
    // NULL categories are not categories: n stays 8
    val withNull = same.unionByName(
      Seq((Option.empty[String], Option("b0")),
        (Option("a0"), Option.empty[String]))
        .toDF("x", "y"))
    val gn = Association.mutualInformation(withNull, "x", "y").collect()(0)
    assert(gn.getLong(0) === 8L && gn.getDouble(4) === 1.0)
    // constant column: h_a = 0 → mi 0, nmi defined as 0
    val const = Seq(("k", "b0"), ("k", "b1")).toDF("x", "y")
    val gc = Association.mutualInformation(const, "x", "y").collect()(0)
    assert(gc.getDouble(1) === 0.0 && gc.getDouble(3) === 0.0 &&
      gc.getDouble(4) === 0.0)
  }

  test("categoricalAssociation: independence → chi2 0; perfect 2×2 " +
      "dependence → V 1; hand-computed mixed case") {
    import spark.implicits._
    // perfectly independent 2×2: every (a, b) cell = 2
    val ind = Seq.tabulate(8)(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val gi = Association.categoricalAssociation(ind, "x", "y").collect()(0)
    assert(gi.getLong(0) === 8L && gi.getDouble(3) === 0.0 &&
      gi.getDouble(4) === 0.0)
    // perfect dependence: a0↔b0, a1↔b1 (4 rows each)
    val dep = (Seq.fill(4)(("a0", "b0")) ++ Seq.fill(4)(("a1", "b1")))
      .toDF("x", "y")
    val gd = Association.categoricalAssociation(dep, "x", "y").collect()(0)
    // chi2 = n·min(r−1,c−1) = 8 → V = 1
    assert(gd.getDouble(3) === 8.0 && gd.getDouble(4) === 1.0)
    // hand case: cells a0b0=3 a0b1=1 a1b0=1 a1b1=3 (n=8, margins all 4)
    // e = 2 everywhere → chi2 = 4·(1)²/2 = 2; V = sqrt(2/8) = 0.5
    val mix = (Seq.fill(3)(("a0", "b0")) ++ Seq(("a0", "b1"), ("a1", "b0")) ++
      Seq.fill(3)(("a1", "b1"))).toDF("x", "y")
    val gm = Association.categoricalAssociation(mix, "x", "y").collect()(0)
    assert(gm.getDouble(3) === 2.0 && gm.getDouble(4) === 0.5)
    // single-category margin: V defined as 0, chi2 0 (1×2 table)
    val one = Seq(("a0", "b0"), ("a0", "b1")).toDF("x", "y")
    val go = Association.categoricalAssociation(one, "x", "y").collect()(0)
    assert(go.getLong(1) === 1L && go.getDouble(4) === 0.0)
  }
}
