package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.curation.Curation
import graft.dedup.Dedup

/** Declarative configuration for the CURATION flow — the training-data
  * twin of [[PipelineConfig]] (which configures the analysis flow). The
  * reference runs everything through configuration modules
  * (pipeline_configuration_spec.py:183); a curation user picks a dedup
  * policy, mixture weights, and export shaping the same way, and the
  * interpreter composes the already-verified operators. The config only
  * decides WHICH stages exist and their parameters, never how they
  * execute — a configured run plans identically to the hand-written
  * composition (ConfigSpec pins the equality).
  */
sealed trait DedupMode

/** Verbatim-copy dedup: md5 digest groups, first quality-kept doc wins. */
case object ExactDedup extends DedupMode

/** Near-dup dedup: MinHash-LSH candidates → Jaccard-verified pairs →
  * connected components → best-quality member kept per component. */
final case class NearDupKeepBest(shingleN: Int = 3, numPerms: Int = 16,
                                 bands: Int = 4, tau: Double = 0.5) extends DedupMode

/** @param dedup          verbatim or near-dup policy
  * @param mixtureWeights per-source keep-permille weights (0-100 scale,
  *                       as `Curation.mixtureKeep`)
  * @param defaultWeight  weight for sources absent from the map
  * @param split          optional (trainPct, valPct) deterministic
  *                       train/val/test assignment on the export
  * @param shuffleShards  optional shard count: deterministic shard
  *                       assignment on the export (the trainingShards
  *                       layout key)
  */
final case class CurationConfig(dedup: DedupMode = ExactDedup,
                                mixtureWeights: Map[String, Int] = Map.empty,
                                defaultWeight: Int = 100,
                                split: Option[(Int, Int)] = None,
                                shuffleShards: Option[Int] = None)

/** Interprets a CurationConfig into the composed curation plans. */
object ConfiguredCuration {

  private def pairsFor(df: DataFrame, id: Column, text: Column,
                       n: NearDupKeepBest): DataFrame =
    Dedup.minhashDedupVerified(df, id, text, n.shingleN, n.numPerms, n.bands, n.tau)

  /** The per-stage accounting report for the configured flow — the same
    * rows `curation_funnel` / `curation_funnel_fuzzy` produce for the
    * equivalent hand-written composition. */
  def funnel(df: DataFrame, id: Column, text: Column, source: Column,
             cfg: CurationConfig): DataFrame = cfg.dedup match {
    case ExactDedup =>
      Curation.curationFunnel(df, id, text, source, cfg.mixtureWeights, cfg.defaultWeight)
    case n: NearDupKeepBest =>
      Curation.fuzzyCurationFunnel(df, id, text, source, pairsFor(df, id, text, n),
        graft.text.TextFeatures.qualityColumns(text).last,
        cfg.mixtureWeights, cfg.defaultWeight)
  }

  /** The curated export: mixture survivors in export shape
    * (doc_id, source, n_tok), plus `split` / `shard` columns when the
    * config asks for them. Split and shard assignments are the
    * deterministic digest coins — re-running the configured export
    * reproduces the identical dataset. */
  def export(df: DataFrame, id: Column, text: Column, source: Column,
             cfg: CurationConfig): DataFrame = {
    val base = cfg.dedup match {
      case ExactDedup =>
        Curation.curationSurvivors(df, id, text, source,
          cfg.mixtureWeights, cfg.defaultWeight)
          .select(col("doc_id"), col("source"), col("n_tok"))
      case n: NearDupKeepBest =>
        Curation.fuzzyCurationExport(df, id, text, source, pairsFor(df, id, text, n),
          graft.text.TextFeatures.qualityColumns(text).last,
          cfg.mixtureWeights, cfg.defaultWeight)
    }
    val withSplit = cfg.split match {
      case Some((train, valPct)) =>
        // row-local projection, not a self-join: the split coin is a pure
        // function of doc_id, and the former join re-evaluated the entire
        // fuzzy dedup pipeline a second time as its build side (export
        // doc_ids are unique, so join ≡ projection row-for-row)
        base.withColumn("split", Curation.datasetSplitCol(col("doc_id"), train, valPct))
      case None => base
    }
    cfg.shuffleShards match {
      case Some(shards) =>
        withSplit.withColumn("shard", Curation.hashShard(col("doc_id"), shards))
      case None => withSplit
    }
  }
}
