package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline operator coverage: dedup (exact / MinHash-LSH /
  * SimHash / n-gram Jaccard / embedding-cosine), similarity search (brute
  * force + LSH), text analysis, multimodal plumbing. Oracles are provided
  * where DuckDB can express the semantics; hash-family ops (xxhash64-based)
  * get the driver's rows-only check.
  */
object LlmQueries {

  /** Aggregated registry — the family files own the implementations; this
    * object keeps the single public surface SparkEntry and the specs use. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.queries ++ SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  val oracleSql: Map[String, String] =
    DedupQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      TextQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      PipelineQueries.oracleSql
}
