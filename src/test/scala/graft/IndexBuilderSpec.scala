package graft

import java.nio.file.Files

import graft.sources.LegacyFormats
import graft.tools.IndexBuilder

/** The ini-driven build/search driver (`AnnService/src/IndexBuilder/
  * main.cpp`): reference-format binary vectors + queries + truth in, built
  * index + recall report out — the full `IndexBuilder.exe -c config.ini`
  * flow against files this library wrote in the reference's own formats.
  */
class IndexBuilderSpec extends SparkSpec {

  test("ini-driven build → save → search → truth recall, reference formats end-to-end") {
    val dir = Files.createTempDirectory("idxbuilder").toString
    val n = 200
    val dim = 10
    val vecs = (0 until n).map(i => Array.fill(dim)(i.toFloat))
    LegacyFormats.writeDefault(s"$dir/base.bin", vecs)
    val qids = Seq(0, 5, 9)
    LegacyFormats.writeDefault(s"$dir/query.bin", qids.map(vecs(_)))
    // exact top-3 on the line fixture: self at 0, then the two unit
    // neighbors at l2sq = dim (ties broken on id, smaller first)
    val truth = qids.map { j =>
      if (j == 0) Seq((0, 0f), (1, 10f), (2, 40f))
      else Seq((j, 0f), (j - 1, 10f), (j + 1, 10f))
    }
    LegacyFormats.writeTruthDefault(s"$dir/truth.bin", truth)
    val ini =
      s"""[Base]
         |ValueType=Float
         |DistCalcMethod=L2
         |Dim=$dim
         |VectorPath=$dir/base.bin
         |VectorType=DEFAULT
         |QueryPath=$dir/query.bin
         |QueryType=DEFAULT
         |TruthPath=$dir/truth.bin
         |TruthType=DEFAULT
         |IndexDirectory=$dir/index
         |
         |[SelectHead]
         |isExecute=true
         |Ratio=0.1
         |
         |[BuildSSDIndex]
         |isExecute=true
         |ReplicaCount=4
         |InternalResultNum=16
         |
         |[SearchSSDIndex]
         |isExecute=true
         |ResultNum=3
         |""".stripMargin
    val report = IndexBuilder.run(spark, ini)
    // the search phase ran and is perfect on this fixture
    val summary = report.recallSummary.get.head()
    assert(summary.getDouble(0) === 1.0, s"avg recall ${summary.getDouble(0)}")
    assert(summary.getLong(3) === 3L)
    val top = report.results.get.where(org.apache.spark.sql.functions.col("rank") === 1)
      .orderBy("query_id").collect().map(_.getLong(2))
    assert(top.toSeq === qids.map(_.toLong))
    // the saved index reloads and searches
    val loaded = AnnIndex.load(spark, s"$dir/index")
    assert(loaded.search(
      report.results.get.sparkSession.range(1)
        .selectExpr("id AS query_id", s"array(${Array.fill(dim)("5.0F").mkString(",")}) AS qvec"),
      1).head().getLong(2) === 5L)
  }

  test("ini SelectHeadType=BKT engages the tree-walk head selection (B6)") {
    val dir = Files.createTempDirectory("idxbkt").toString
    val n = 200
    val dim = 10
    val vecs = (0 until n).map(i => Array.fill(dim)(i.toFloat))
    LegacyFormats.writeDefault(s"$dir/base.bin", vecs)
    val qids = Seq(0, 5, 9)
    LegacyFormats.writeDefault(s"$dir/query.bin", qids.map(vecs(_)))
    val ini =
      s"""[Base]
         |ValueType=Float
         |DistCalcMethod=L2
         |Dim=$dim
         |VectorPath=$dir/base.bin
         |VectorType=DEFAULT
         |QueryPath=$dir/query.bin
         |QueryType=DEFAULT
         |
         |[SelectHead]
         |isExecute=true
         |SelectHeadType=BKT
         |SelectDynamically=true
         |Ratio=0.1
         |BKTKmeansK=4
         |BKTLeafSize=8
         |
         |[BuildSSDIndex]
         |isExecute=true
         |ReplicaCount=4
         |InternalResultNum=16
         |
         |[SearchSSDIndex]
         |isExecute=true
         |ResultNum=3
         |""".stripMargin
    val report = IndexBuilder.run(spark, ini)
    // dynamic walk landed a ratio-sized head set (binary search targets 10%)
    val hn = report.index.heads.get.count()
    assert(hn > 0 && math.abs(hn.toDouble / n - 0.1) < 0.1,
      s"BKT dynamic head count $hn vs target ${n / 10}")
    // heads are selected corpus vectors, not synthetic centroids
    assert(report.index.heads.get
      .join(report.index.vectors.select(
        org.apache.spark.sql.functions.col("id").as("head_id")),
        Seq("head_id"), "left_anti").count() === 0)
    // two-stage search over the walk-selected heads finds every query itself
    val top = report.results.get
      .where(org.apache.spark.sql.functions.col("rank") === 1)
      .orderBy("query_id").collect().map(_.getLong(2))
    assert(top.toSeq === qids.map(_.toLong))
  }

  test("IndexSearcher: gentruth → load → search → recall, the -g/-i/-x/-r flow") {
    import graft.tools.IndexSearcher
    val dir = Files.createTempDirectory("idxsearcher").toString
    val vecs = (0 until 150).map(i => Array.fill(8)(i.toFloat))
    LegacyFormats.writeDefault(s"$dir/base.bin", vecs)
    LegacyFormats.writeDefault(s"$dir/query.bin", Seq(3, 70, 149).map(vecs(_)))
    // -g: generate the truth file by exact search over the data file
    IndexSearcher.genTruth(spark,
      s"$dir/base.bin", s"$dir/query.bin", s"$dir/truth.bin", k = 3)
    // the generated file is a valid reference-format truth file
    val truthBack = LegacyFormats.readTruthDefault(spark, s"$dir/truth.bin")
    assert(truthBack.count() === 9)
    assert(truthBack.where(
      org.apache.spark.sql.functions.col("rank") === 1).count() === 3)
    // build + save an index over the same corpus, then the search-only flow
    val conf = GraftConf(headRatio = 0.1, replicaCount = 4, internalK = 16)
    AnnIndex(spark, LegacyFormats.readDefault(spark, s"$dir/base.bin"), conf)
      .build().save(s"$dir/index")
    val report = IndexSearcher.run(spark, s"$dir/index", s"$dir/query.bin",
      k = 3, truthPath = Some(s"$dir/truth.bin"))
    assert(report.recallSummary.get.head().getDouble(0) === 1.0)
  }

  test("QuantizerTool: train → blob → reload quantizes identically") {
    import graft.tools.QuantizerTool
    val dir = Files.createTempDirectory("quanttool").toString
    // integer-grid vectors: PQ training is exact, codes are stable (≥256
    // rows — the 256-code Lloyd seeds from the smallest-id vectors)
    val vecs = (0 until 400).map(i =>
      Array(i % 10, i / 10, (i * 3) % 7, (i * 5) % 11).map(_.toFloat))
    LegacyFormats.writeDefault(s"$dir/base.bin", vecs)
    val report = QuantizerTool.run(spark, s"$dir/base.bin",
      dim = 4, quantizedDim = 2, outPath = s"$dir/quantizer.bin")
    val back = LegacyFormats.readQuantizer(s"$dir/quantizer.bin")
    assert(back.cb.centers.length === report.rcb.cb.centers.length)
    // the reloaded blob quantizes a probe vector to the same codes
    def codes(r: graft.functions.PQ.RotatedCodebooks, v: Seq[Double]): Seq[Int] =
      r.cb.quantizeOne(r.rotate(v).toIndexedSeq).toSeq
    val probe = vecs(37).map(_.toDouble).toSeq
    assert(codes(back, probe) === codes(report.rcb, probe))
    // OPQ variant trains and writes too
    val opq = QuantizerTool.run(spark, s"$dir/base.bin",
      dim = 4, quantizedDim = 2, outPath = s"$dir/opq.bin",
      quantizerType = "OPQQuantizer")
    val opqBack = LegacyFormats.readQuantizer(s"$dir/opq.bin")
    assert(codes(opqBack, probe) === codes(opq.rcb, probe))
  }

  test("isExecute=false skips the search phase; missing sections default sanely") {
    val dir = Files.createTempDirectory("idxbuilder2").toString
    LegacyFormats.writeDefault(s"$dir/base.bin",
      (0 until 50).map(i => Array.fill(4)(i.toFloat)))
    val ini =
      s"""[Base]
         |ValueType=Float
         |Dim=4
         |VectorPath=$dir/base.bin
         |VectorType=DEFAULT
         |
         |[SearchSSDIndex]
         |isExecute=false
         |""".stripMargin
    val report = IndexBuilder.run(spark, ini)
    assert(report.results.isEmpty && report.recallSummary.isEmpty)
    assert(report.index.count === 50)
  }

  test("CorpusCurator: ini-driven curation pipeline end-to-end") {
    import org.apache.spark.sql.functions.col
    import graft.tools.CorpusCurator
    val outDir = java.nio.file.Files.createTempDirectory("curator_out").toString
    val evalDir = java.nio.file.Files.createTempDirectory("curator_eval").toString
    // eval split: every 10th doc (the q71/q98 convention)
    Tables.documents(spark, sf0001).where(col("doc_id") % 10 === 7)
      .write.mode("overwrite").parquet(s"$evalDir/eval.parquet")
    val ini =
      s"""[input]
         |sfdir=$sf0001
         |[rules]
         |isExecute=true
         |minTokens=5
         |[importance]
         |isExecute=true
         |targetLang=en
         |minScore=-1.5
         |[dedup]
         |isExecute=true
         |jaccardThreshold=0.3
         |[phash]
         |isExecute=true
         |maxHamming=0
         |[decontaminate]
         |isExecute=true
         |evalPath=$evalDir/eval.parquet
         |maxOverlap=0.3
         |[mixture]
         |isExecute=true
         |weights=src0:0.5
         |default=1.0
         |[split]
         |isExecute=true
         |trainPct=80
         |valPct=10
         |[output]
         |dir=$outDir
         |report=true
         |""".stripMargin
    val r = CorpusCurator.run(spark, ini)
    assert(r.kept > 0 && r.kept < r.in, s"kept ${r.kept} of ${r.in}")
    val written = spark.read.parquet(s"$outDir/corpus")
    assert(written.count() === r.kept)
    assert(written.columns.contains("split"))
    assert(written.select("split").distinct().count() >= 2)
    // near-dup dedup kept one canonical doc per group: no surviving exact dups
    assert(graft.operators.Dedup.exact(written)
      .where(col("doc_id") =!= col("canon_id")).count() === 0)
    // src0 downweighted to ~50%
    val bySrc = written.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val inSrc = Tables.documents(spark, sf0001).groupBy("source").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(bySrc("src0").toDouble / inSrc("src0") < 0.75, s"src0: $bySrc vs $inSrc")
    val report = spark.read.parquet(s"$outDir/report")
    assert(report.columns.toSet ===
      Set("source", "n_docs", "n_tokens", "mean_quality", "dup_rate", "top_lang"))
  }
}
