package graft

import org.apache.spark.sql.{functions => F, SparkSession}

/** Thin command-line surface over the [[Store]] facade — the verbs of the
  * reference's `biocache` CLI (`cmd/CMD2.scala` in /root/reference) mapped
  * onto parquet datasets, so an operator of the reference can drive the
  * same lifecycle here: load → process → index → query/export/delete.
  *
  * Every verb is one facade call plus parquet IO; all heavy lifting stays
  * in the library (and therefore on the cluster — the CLI itself never
  * touches rows).
  */
object Cli {

  val usage: String =
    """usage:
      |  load-dwca   <archive.zip> <dataResourceUid> <outParquet>
      |  load-csv    <csvPath> <dataResourceUid> <outParquet>
      |  process     <recordsParquet> <outParquet>
      |  sample      <recordsParquet> <layersParquet> <outParquet>
      |  index       <processedParquet> <outParquet>
      |  facet       <indexParquet> <field>
      |  export-dwca <recordsParquet> <dataResourceUid> <name> <out.zip>
      |  export-avro <recordsParquet> <outAvroDir>
      |  delete-keys <recordsParquet> <keysCsv> <outParquet>
      |  duplicates  <candidatesParquet> <outParquet>
      |  rename-column <inParquet> <from> <to> <outParquet>
      |  delete-column <inParquet> <column> <outParquet>
      |  duplicates-incr <candidatesParquet> <changedKeysCsv>
      |              <previousParquet> <outParquet>
      |  explain     <queryName> <sfDir>
      |  curate      <corpusParquet> <benchmarkParquet> <outParquet>
      |  compact     <tableDir> <targetBytes>
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Seq[String]): Unit = args.toList match {
    case "load-dwca" :: zip :: dr :: out :: Nil =>
      val raw = spark.read.format("dwca").load(zip)
      sources.DwcSource.withIdentity(raw, dr,
          uniqueTerms = Seq("id"))
        .write.mode("overwrite").parquet(out)
    case "load-csv" :: path :: dr :: out :: Nil =>
      Store.loadCsv(spark, path, dr, uniqueTerms = Seq("occurrenceID"))
        .write.mode("overwrite").parquet(out)
    case "process" :: in :: out :: Nil =>
      Store.process(spark.read.parquet(in))
        .write.mode("overwrite").parquet(out)
    case "sample" :: in :: layers :: out :: Nil =>
      Store.sample(spark, spark.read.parquet(in),
          spark.read.parquet(layers))
        .write.mode("overwrite").parquet(out)
    case "index" :: in :: out :: Nil =>
      Store.writeIndex(Store.buildIndex(spark.read.parquet(in)), out)
    case "facet" :: in :: field :: Nil =>
      Store.facet(spark.read.parquet(in), field)
        .collect().foreach(r => println(s"${r.get(0)}\t${r.get(1)}"))
    case "export-dwca" :: in :: dr :: name :: outZip :: Nil =>
      sources.DwcaExport.`export`(
        spark.read.parquet(in), dr, name, outZip)
    case "delete-keys" :: in :: keysCsv :: out :: Nil =>
      val doomed = spark.read.option("header", "true").csv(keysCsv)
        .select(F.col("rowKey"))
      Store.deleteByKeys(spark.read.parquet(in), doomed)
        .write.mode("overwrite").parquet(out)
    case "export-avro" :: in :: out :: Nil =>
      sources.AvroExport.write(spark.read.parquet(in), out)
    case "rename-column" :: in :: from :: to :: out :: Nil =>
      spark.read.parquet(in).withColumnRenamed(from, to)
        .write.mode("overwrite").parquet(out)
    case "delete-column" :: in :: column :: out :: Nil =>
      spark.read.parquet(in).drop(column)
        .write.mode("overwrite").parquet(out)
    case "duplicates" :: in :: out :: Nil =>
      Store.detectDuplicates(spark, spark.read.parquet(in))
        .write.mode("overwrite").parquet(out)
    case "duplicates-incr" :: in :: keysCsv :: prev :: out :: Nil =>
      import spark.implicits._
      val changed = spark.read.option("header", "true").csv(keysCsv)
        .select(F.col("rowKey"))
      val previous = spark.read.parquet(prev)
        .as[operators.DuplicationDetection.DupResult]
      Store.detectDuplicatesIncremental(spark,
          spark.read.parquet(in), changed, previous)
        .write.mode("overwrite").parquet(out)
    case "curate" :: in :: benchPath :: out :: Nil =>
      operators.Curation.curateCorpus(
          spark.read.parquet(in), spark.read.parquet(benchPath),
          "doc_id", "text", "n_chars", minQuality = 150)
        .write.mode("overwrite").parquet(out)
    case "compact" :: tableDir :: target :: Nil =>
      // serving-path table maintenance: plan → rewrite → atomic swap
      // (reference: the post-load SOLR commit/optimise step,
      // index/SolrIndexDAO.scala:509-575)
      operators.Maintenance.compactTable(spark, tableDir, target.toLong)
        .collect().foreach(r => println(
          s"${r.get(0)}\tbin=${r.get(1)}\tfiles_in=${r.get(2)}" +
            s"\tbytes_in=${r.get(3)}\tout=${r.get(4)}"))
    case "explain" :: name :: sfDir :: Nil =>
      val df = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
        .apply(spark, sfDir)
      // plan-shape audit: the properties the 100 TB design notes promise.
      // The query RUNS first — AQE only commits join strategies, partition
      // coalescing, and codegen spans in the final (post-execution) plan.
      // Executed by driving THIS df's physical plan with a no-op action so
      // no rows ever land on the driver — auditing a 100 TB query's plan
      // must not OOM the auditor. (Not the noop sink or Dataset.foreach:
      // both spawn a SEPARATE QueryExecution, leaving this df's adaptive
      // plan unfinalized and the shape line empty.)
      df.queryExecution.executedPlan.execute().foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      println(plan)
      // count operators in the post-AQE final section only — the appended
      // "Initial Plan" would double-count every node
      val finalPlan = plan.split("== Initial Plan ==")(0)
      def cnt(pat: String) = pat.r.findAllIn(finalPlan).size
      val spans = "\\*\\(\\d+\\)".r.findAllIn(finalPlan).toSet.size
      println(s"[shape] exchanges=${cnt("Exchange")}" +
        s" bhj=${cnt("BroadcastHashJoin")} smj=${cnt("SortMergeJoin")}" +
        s" bnlj=${cnt("BroadcastNestedLoopJoin")}" +
        s" cartesian=${cnt("CartesianProduct")}" +
        s" codegenSpans=$spans" +
        s" pushedFilters=${if (plan.contains("PushedFilters: [")) "yes" else "no"}")
    case verb :: rest if verbs(verb) =>
      throw new IllegalArgumentException(
        s"wrong arguments for '$verb' (got ${rest.length})\n$usage")
    case other =>
      throw new IllegalArgumentException(
        s"unknown command: ${other.mkString(" ")}\n$usage")
  }

  private val verbs = Set("load-dwca", "load-csv", "process", "sample",
    "index", "facet", "export-dwca", "export-avro", "delete-keys",
    "duplicates", "duplicates-incr", "rename-column", "delete-column",
    "explain", "curate", "compact")
}
