package graft

import java.nio.file.{Files, Paths}

/** The driver-contract plumbing itself: oracle JSON escaping, the
  * partial-run layout a killed Verify must leave behind, and the
  * queries ↔ oracles key alignment the hash compare depends on.
  */
class VerifySpec extends SparkSpec {

  test("every query has an oracle and every oracle a query (driver contract)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val ro = SparkEntry.rowsOnly
    val dyn = SparkEntry.dynamicOracleNames
    // the explicit carve-outs: rows-only queries are real queries with NO
    // oracle, dynamic-oracle queries get theirs authored at Verify time —
    // never a silent omission, never a dangling registry entry
    assert((ro -- q).isEmpty, s"rowsOnly names without a query: ${ro -- q}")
    assert((ro & o).isEmpty, s"rowsOnly names that DO have an oracle: ${ro & o}")
    assert((dyn -- q).isEmpty, s"dynamic oracle names without a query: ${dyn -- q}")
    assert((dyn & o).isEmpty, s"dynamic names that ALSO have a static oracle: ${dyn & o}")
    assert((dyn & ro).isEmpty, s"dynamic names marked rows-only: ${dyn & ro}")
    assert((q -- o -- ro -- dyn).isEmpty, s"queries without oracle: ${q -- o -- ro -- dyn}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("dynamic oracles generate for exactly their declared names") {
    val gen = SparkEntry.oracleSqlDynamic(spark, sf0001)
    assert(gen.keySet === SparkEntry.dynamicOracleNames)
    gen.values.foreach(sql => assert(sql.trim.nonEmpty))
    // the q217 oracle must inline the fitted basis as literals — one
    // UNION ALL branch per output dimension, arithmetic over embeddings
    val q217 = gen("q217_pca_project")
    assert(q217.contains("FROM embeddings"))
    assert("UNION ALL".r.findAllIn(q217).size === 7, "expected 8 dim branches")
  }

  test("rows-only queries still dump non-empty output (the weaker gate)") {
    SparkEntry.rowsOnly.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.count() > 0, s"$name: rows-only query returned 0 rows")
    }
  }

  test("writeOracleJson escapes control characters and survives a JSON parse") {
    val dir = Files.createTempDirectory("verify_json").toString
    val tricky = Map(
      "q_a" -> "SELECT 1 AS \"x\"\n\tFROM t -- back\\slash",
      "q_b" -> "line1\rline2end")
    Verify.writeOracleJson(dir, tricky)
    val raw = Files.readString(Paths.get(s"$dir/oracle_sql.json"))
    // a control char surviving unescaped would break the driver's json.load
    assert(!raw.exists(c => c < ' '), s"unescaped control char in: $raw")
    import spark.implicits._
    val parsed = spark.read.json(Seq(raw).toDS()).head()
    assert(parsed.getAs[String]("q_a") === tricky("q_a"))
    assert(parsed.getAs[String]("q_b") === tricky("q_b"))
  }

  test("a partial (killed) run still leaves a comparable outDir") {
    // the round-8 failure mode: oracle_sql.json written LAST turned a
    // stalled round into `{}`. The contract now: the oracle file lists
    // EVERY query up front; each finished query is its own parquet dir —
    // so a kill after n queries leaves n comparable results + the full
    // oracle map (compare reports the rest as MISSING, not nothing)
    val outDir = Files.createTempDirectory("verify_partial").toString
    Verify.writeOracleJson(outDir, SparkEntry.oracleSql)
    val finished = Seq("q30_text_stats", "q31_lang_id")
    finished.foreach { name =>
      SparkEntry.queries(name)(spark, sf0001)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val oracleRaw = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(oracleRaw.contains("\"" + k + "\""), s"oracle map missing $k")
    }
    finished.foreach { name =>
      assert(spark.read.parquet(s"$outDir/$name").count() > 0, name)
    }
    // and the unfinished majority is absent but detectable
    assert(!Files.exists(Paths.get(s"$outDir/q01_knn_l2")))
  }
}
