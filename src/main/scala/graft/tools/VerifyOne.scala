package graft.tools

/** Targeted single-query Verify: dump ONE `SparkEntry.queries` entry + its
  * oracle SQL in the exact layout `tools/compare_oracle.py` expects — a fast
  * iteration loop while authoring a new oracle-gated query (the full Verify
  * sweep takes minutes; one query takes seconds).
  *
  * Usage: `runMain graft.tools.VerifyOne <name[,name2,…]> <sfDir> <outDir>`
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val picked = names.split(",").toSeq
    val spark = graft.Verify.session()
    new java.io.File(outDir).mkdirs()
    picked.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    graft.Verify.writeOracleJson(outDir,
      graft.SparkEntry.oracleSql.view.filterKeys(picked.contains).toMap)
    spark.stop()
  }
}
