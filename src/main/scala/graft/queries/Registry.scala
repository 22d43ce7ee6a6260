package graft.queries

/** All declared check queries, aggregated for SparkEntry. */
object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.all ++ RelationalQueries2.all ++
      RelationalQueries3.all ++ RelationalQueries4.all ++
      RelationalQueries5.all ++
      TpchQueries.all ++ MapReduceQueries.all ++ StorageQueries.all ++
      StorageQueries2.all ++ StorageQueries3.all ++
      StorageQueries4.all ++ StorageQueries5.all ++
      StorageQueries6.all ++ StorageQueries7.all ++
      StorageQueries8.all ++ StorageQueries9.all ++
      DataPipelineQueries.all ++ DataPipelineQueries2.all ++
      DataPipelineQueries3.all ++ DataPipelineQueries4.all ++
      DataPipelineQueries5.all ++ DataPipelineQueries6.all ++
      DataPipelineQueries7.all ++ DataPipelineQueries8.all ++
      DataPipelineQueries9.all ++
      MultimodalQueries.all ++ StreamingQueries.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
