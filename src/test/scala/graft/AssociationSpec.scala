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
}
