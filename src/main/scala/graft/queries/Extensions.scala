package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming

/** Beyond-reference scale-out operators (SURVEY.md §2.8): dedup,
  * similarity search, text analysis, multimodal plumbing, streaming.
  * Spark side runs the graft.ext library (DataFrame API); the oracle
  * text re-expresses the same computation in DuckDB SQL.
  *
  * Cross-engine determinism: md5 hex strings as the only hash, ratios
  * and dot products as floor-scaled BIGINTs (see graft.ext scaladoc).
  */
object Extensions {
  val qs: Seq[Q] =
    ExtQText.qs ++
    ExtQDedup.qs ++
    ExtQSimilarity.qs ++
    ExtQMultimodal.qs ++
    ExtQStreaming.qs ++
    ExtQCuration.qs ++
    ExtQStats.qs ++
    ExtQExperiment.qs ++
    ExtQEvents.qs ++
    ExtQGraph.qs ++
    ExtQLayout.qs ++
    ExtQRelOps.qs
}
