package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All implemented operators, in SURVEY §2 order. */
  def all: Seq[QueryDef] =
    graft.queries.Relational.defs ++
    graft.queries.Relational2.defs ++
    graft.cdc.CdcQueries.defs ++
    graft.pipelines.Dedup.defs ++
    graft.pipelines.Similarity.defs ++
    graft.pipelines.TextAnalysis.defs ++
    graft.pipelines.Embeddings.defs ++
    graft.pipelines.Packing.defs ++
    graft.pipelines.Multimodal.defs ++
    graft.pipelines.Ingest.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q04_agg_group").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
