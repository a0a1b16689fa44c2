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
    closeRatio: Double = 1.0) {

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
    case other => sys.error(s"unknown parameter $other")
  }
}

object GraftConf {
  /** Parse `key=value` pairs (ini-style lines also accepted). */
  def fromParams(params: Map[String, String]): GraftConf =
    params.foldLeft(GraftConf()) { case (c, (k, v)) => c.set(k, v) }
}
