package graft

/** Parameter registry (M6): the typed mirror of the reference's
  * macro-generated SetParameter/GetParameter tables
  * (`BKT/ParameterDefinitionList.h:1-54`, `SPANN/ParameterDefinitionList.h:1-128`).
  * String-keyed get/set with defaults, as the wrappers expose it
  * (`CoreInterface.h:60-63`).
  */
case class GraftConf(
    metric: String = "l2sq", // DistCalcMethod
    resultK: Int = 10, // SearchResult count
    internalK: Int = 64, // SearchInternalResultNum
    replicaCount: Int = 8, // ReplicaCount
    postingLimit: Int = 1000, // PostingPageLimit equivalent (rows per head)
    headRatio: Double = 0.2, // SelectHead Ratio
    maxDistRatio: Double = 8.0, // MaxDistRatio
    rngFactor: Double = 1.0, // RNGFactor
    kmeansK: Int = 32, // BKTKmeansK
    kmeansIters: Int = 5,
    balanceLambda: Double = 0.0, // lambda (DynamicFactorSelect picks it in ref)
    deleteRefineThreshold: Double = 0.4, // DeletePercentageForRefine
    headBuckets: Int = 256,
    // two-level routing (searchTwoStageHier): engage when the head set
    // exceeds hierThreshold rows (beyond comfortable broadcast); heads get
    // superRatio·|heads| super-heads, each head routes to routeReplicas of
    // them, queries probe superK
    hierThreshold: Long = 2000000L,
    superRatio: Double = 0.05,
    superK: Int = 8,
    routeReplicas: Int = 2,
    // adaptive stage-1 widening (the reference's dynamic-pivot compensation,
    // `BKTIndex.cpp:150,204`): probe the top internalK heads always, plus
    // heads ranked up to wideK within closeRatio of the per-query best.
    // wideK = 0 (default) disables — fixed internalK probe
    wideK: Int = 0,
    closeRatio: Double = 1.0,
    // every other reference-valid parameter name ([[GraftConf.ReferenceDefaults]])
    // is accepted and stored here — tuning knobs a caller can read back and
    // plumb into the operator calls, or documented no-ops Spark replaces
    extra: Map[String, String] = Map.empty) {

  def set(name: String, value: String): GraftConf = name.toLowerCase match {
    case "distcalcmethod" | "metric" => copy(metric = value.toLowerCase match {
      case "l2" | "l2sq" => "l2sq"
      case "cosine" | "cos" => "cos"
      case "innerproduct" | "ip" => "ip"
      case other => sys.error(s"unknown metric $other")
    })
    case "resultk" | "k" => copy(resultK = value.toInt)
    case "searchinternalresultnum" | "internalk" => copy(internalK = value.toInt)
    case "replicacount" => copy(replicaCount = value.toInt)
    case "postinglimit" | "postingpagelimit" => copy(postingLimit = value.toInt)
    case "ratio" | "headratio" => copy(headRatio = value.toDouble)
    case "maxdistratio" => copy(maxDistRatio = value.toDouble)
    case "rngfactor" => copy(rngFactor = value.toDouble)
    case "bktkmeansk" | "kmeansk" => copy(kmeansK = value.toInt)
    case "kmeansiters" => copy(kmeansIters = value.toInt)
    case "lambda" | "balancelambda" => copy(balanceLambda = value.toDouble)
    case "deletepercentageforrefine" => copy(deleteRefineThreshold = value.toDouble)
    case "headbuckets" => copy(headBuckets = value.toInt)
    case "hierthreshold" => copy(hierThreshold = value.toLong)
    case "superratio" => copy(superRatio = value.toDouble)
    case "superk" => copy(superK = value.toInt)
    case "routereplicas" => copy(routeReplicas = value.toInt)
    case "widek" => copy(wideK = value.toInt)
    case "closeratio" => copy(closeRatio = value.toDouble)
    case "internalresultnum" => copy(internalK = value.toInt)
    case "resultnum" => copy(resultK = value.toInt)
    case other if GraftConf.ReferenceDefaults.contains(other) =>
      copy(extra = extra + (other -> value))
    case other => sys.error(s"unknown parameter $other")
  }

  def get(name: String): String = name.toLowerCase match {
    case "distcalcmethod" | "metric" => metric
    case "resultk" | "k" => resultK.toString
    case "searchinternalresultnum" | "internalk" => internalK.toString
    case "replicacount" => replicaCount.toString
    case "postinglimit" | "postingpagelimit" => postingLimit.toString
    case "ratio" | "headratio" => headRatio.toString
    case "maxdistratio" => maxDistRatio.toString
    case "rngfactor" => rngFactor.toString
    case "bktkmeansk" | "kmeansk" => kmeansK.toString
    case "kmeansiters" => kmeansIters.toString
    case "lambda" | "balancelambda" => balanceLambda.toString
    case "deletepercentageforrefine" => deleteRefineThreshold.toString
    case "headbuckets" => headBuckets.toString
    case "hierthreshold" => hierThreshold.toString
    case "superratio" => superRatio.toString
    case "superk" => superK.toString
    case "routereplicas" => routeReplicas.toString
    case "widek" => wideK.toString
    case "closeratio" => closeRatio.toString
    case "internalresultnum" => internalK.toString
    case "resultnum" => resultK.toString
    case other => extra.getOrElse(other,
      GraftConf.ReferenceDefaults.getOrElse(other,
        sys.error(s"unknown parameter $other")))
  }
}

object GraftConf {
  /** Parse `key=value` pairs (ini-style lines also accepted). */
  def fromParams(params: Map[String, String]): GraftConf =
    params.foldLeft(GraftConf()) { case (c, (k, v)) => c.set(k, v) }

  /** Reference ini parsing (`Helper/SimpleIniReader.cpp:30-130` semantics):
    * blank lines and `;` comment lines skipped; `[Section]` headers trimmed
    * and lowercased, a DUPLICATED section is an error; `key=value` splits at
    * the first `=` with the key trimmed + lowercased and the value kept
    * verbatim to the (right-trimmed) end of line, a duplicated key within a
    * section is an error, a non-header line without `=` is an error. Keys
    * before any header land in the "" section, as the reference's
    * `currSection` initialization does. Returns section → (key → value).
    */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[String, String]]()
    var curr = out.getOrElseUpdate("",
      scala.collection.mutable.LinkedHashMap[String, String]())
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith(";")) {
        if (line.startsWith("[")) {
          require(line.endsWith("]"), s"unterminated section header: $line")
          val name = line.substring(1, line.length - 1).trim.toLowerCase
          require(name.nonEmpty, "empty section name")
          require(!out.contains(name), s"duplicated section [$name]")
          curr = out.getOrElseUpdate(name,
            scala.collection.mutable.LinkedHashMap[String, String]())
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"not a key=value line: $line")
          val key = line.substring(0, eq).trim.toLowerCase
          require(key.nonEmpty, s"empty parameter name: $line")
          require(!curr.contains(key), s"duplicated parameter $key")
          curr.put(key, line.substring(eq + 1))
        }
      }
    }
    out.iterator.filter(_._2.nonEmpty).map { case (s, m) => s -> m.toMap }.toMap
  }

  /** Build a conf from the given ini sections, applied in order (the
    * `IndexBuilder -c buildconfig.ini` entry path): typed knobs route
    * through [[GraftConf.set]]; keys the registry does not know (ValueType,
    * VectorPath, isExecute, ... — the SSDServing driver options consumed
    * outside the index) are STORED verbatim, exactly as the reference's
    * IniReader keeps every pair for later `GetParameter` lookup.
    */
  def fromIni(text: String, sections: Seq[String]): GraftConf = {
    val parsed = parseIni(text)
    sections.map(_.toLowerCase).foldLeft(GraftConf()) { (c, s) =>
      parsed.getOrElse(s, Map.empty).foldLeft(c) { case (cc, (k, v)) =>
        try cc.set(k, v)
        catch {
          // only UNKNOWN names fall through to verbatim storage — a typed
          // knob with a malformed value still fails loudly
          case e: RuntimeException
              if e.getMessage != null &&
                e.getMessage.startsWith("unknown parameter") =>
            cc.copy(extra = cc.extra + (k -> v))
        }
      }
    }
  }

  /** The remaining parameter names of the reference's macro registries
    * (`BKT/ParameterDefinitionList.h:7-54`, `KDT/ParameterDefinitionList.h:
    * 5-45`, `SPANN/ParameterDefinitionList.h:6-128`), lowercased → reference
    * default (BKT's value where the lists disagree). `set` accepts every name
    * here and `get` returns the set value or this default, so an ini file
    * written for the reference round-trips unchanged. Three kinds:
    *
    *  - TUNING knobs whose Spark analogue is a function parameter on the
    *    relevant operator (`TPTNumber`/`TPTLeafSize`/`NeighborhoodSize`/
    *    `CEF`/`RefineIterations`/... → [[graft.operators.KnnGraph]] args;
    *    `BKTLeafSize`/`Samples`/`BKTLambdaFactor` → [[graft.operators.BalancedKMeans]];
    *    `SelectThreshold`/`SplitFactor`/`SplitThreshold`/`Count` →
    *    [[graft.operators.Spann]] head selection; `MaxCheck`/dynamic-pivot
    *    counts → covered by the typed `wideK`/`closeRatio` widening) — the
    *    facade stores them for callers that plumb them through explicitly;
    *  - FILE-layout names (`TreeFilePath`, `IndexDirectory`, ...): the Spark
    *    engine persists parquet folders via [[graft.sources.IndexStore]];
    *    stored verbatim, used by nothing;
    *  - EXECUTION machinery Spark replaces (`NumberOfThreads`, `IOThreads
    *    PerHandler`, GPU/SSD/zstd/block-size knobs): accepted no-ops — the
    *    cluster scheduler, shuffle, and parquet codecs own those decisions.
    */
  val ReferenceDefaults: Map[String, String] = Map(
    // --- BKT/KDT tree + graph build (BKT/ParameterDefinitionList.h:7-38) ---
    "treefilepath" -> "tree.bin",
    "graphfilepath" -> "graph.bin",
    "vectorfilepath" -> "vectors.bin",
    "deletevectorfilepath" -> "deletes.bin",
    "enablebfs" -> "0",
    "bktnumber" -> "1",
    "kdtnumber" -> "1",
    "treenumber" -> "1",
    "bktleafsize" -> "8",
    "samples" -> "1000",
    "samplesnumber" -> "1000",
    "bktlambdafactor" -> "100.0",
    "numtopdimensionkdtsplit" -> "5",
    "isoldversion" -> "false",
    "tptnumber" -> "32",
    "tptleafsize" -> "2000",
    "numtopdimensiontptreesplit" -> "5",
    "numtopdimensiontptsplit" -> "5",
    "neighborhoodsize" -> "32",
    "graphneighborhoodscale" -> "2.0",
    "graphcefscale" -> "2.0",
    "refineiterations" -> "2",
    "enablerebuild" -> "0",
    "cef" -> "1000",
    "addcef" -> "500",
    "maxcheckforrefinegraph" -> "8192",
    "tptbalancefactor" -> "2",
    // --- search-time budgets (BKT/ParameterDefinitionList.h:44-48) ---
    "maxcheck" -> "8192",
    "thresholdofnumberofcontinuousnobetterpropagation" -> "3",
    "numberofinitialdynamicpivots" -> "50",
    "numberofotherdynamicpivots" -> "4",
    "hashtableexponent" -> "2",
    "addcountforrebuild" -> "1000",
    // --- dataset blocks / metadata (BKT/ParameterDefinitionList.h:49-53) ---
    "datablocksize" -> "1048576",
    "datacapacity" -> "2147483647",
    "metarecordsize" -> "10",
    // --- SPANN basic (SPANN/ParameterDefinitionList.h:6-35) ---
    "valuetype" -> "Float",
    "indexalgotype" -> "BKT",
    "dim" -> "-1",
    "vectorpath" -> "",
    "vectortype" -> "DEFAULT",
    "vectorsize" -> "-1",
    "vectordelimiter" -> "|",
    "querypath" -> "",
    "querytype" -> "DEFAULT",
    "querysize" -> "-1",
    "querydelimiter" -> "|",
    "warmuppath" -> "",
    "warmuptype" -> "DEFAULT",
    "warmupsize" -> "-1",
    "warmupdelimiter" -> "|",
    "truthpath" -> "",
    "truthtype" -> "DEFAULT",
    "generatetruth" -> "false",
    "indexdirectory" -> "SPANN",
    "headvectorids" -> "SPTAGHeadVectorIDs.bin",
    "deletedids" -> "DeletedIDs.bin",
    "headvectors" -> "SPTAGHeadVectors.bin",
    "headindexfolder" -> "HeadIndex",
    "ssdindex" -> "SPTAGFullList.bin",
    "deleteheadvectors" -> "false",
    "ssdindexfilenum" -> "1",
    "quantizerfilepath" -> "",
    // --- SPANN SelectHead (SPANN/ParameterDefinitionList.h:40-67) ---
    "isexecute" -> "false",
    "savebkt" -> "false",
    "analyzeonly" -> "false",
    "calcstd" -> "false",
    "selectdynamically" -> "true",
    "nooutput" -> "false",
    "selectthreshold" -> "6",
    "splitfactor" -> "5",
    "splitthreshold" -> "25",
    "splitmaxtry" -> "8",
    "count" -> "0",
    "recursivechecksmallcluster" -> "true",
    "printsizecount" -> "true",
    "selectheadtype" -> "BKT",
    "buildhead" -> "false",
    // --- SPANN SSD build/search (SPANN/ParameterDefinitionList.h:78-128) ---
    "buildssdindex" -> "false",
    "enabledeltaencoding" -> "false",
    "enablepostinglistrearrange" -> "false",
    "enabledatacompression" -> "false",
    "enabledicttraining" -> "true",
    "mindicttrainingbuffersize" -> "10240000",
    "dictbuffercapacity" -> "204800",
    "zstdcompresslevel" -> "0",
    "outputemptyreplicaid" -> "false",
    "batches" -> "1",
    "tmpdir" -> ".",
    "recalltestsamplenumber" -> "100",
    "excludehead" -> "true",
    "postingvectorlimit" -> "118",
    "searchresult" -> "",
    "logfile" -> "",
    "qpslimit" -> "0",
    "truthresultnum" -> "-1",
    "hashexponent" -> "4",
    "querycountlimit" -> "2147483647",
    "searchpostingpagelimit" -> "3",
    "rerank" -> "0",
    "enableadc" -> "false",
    "recallanalysis" -> "false",
    "debugbuildinternalresultnum" -> "64",
    "iterativesearchheadbatch" -> "32",
    // --- execution machinery Spark replaces: threads / IO / GPU ---
    "numberofthreads" -> "1",
    "iothreadsperhandler" -> "4",
    "iotimeout" -> "30",
    "gpugraphtype" -> "2",
    "gpurefinesteps" -> "0",
    "gpurefinedepth" -> "30",
    "gpuleafsize" -> "500",
    "headnumgpus" -> "1",
    "gpussdnumtrees" -> "100",
    "gpussdleafsize" -> "200",
    "numgpus" -> "1")
}
