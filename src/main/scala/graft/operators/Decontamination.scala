package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the curation pass that keeps evaluation
  * data out of a training corpus: a training document is contaminated
  * when it shares at least `minShingles` DISTINCT word k-shingles with
  * the POOLED shingle dictionary of the evaluation set (the union over
  * all eval documents — the standard n-gram-overlap decontamination
  * form; per-single-eval-document thresholds would need a per-pair
  * count instead of one dictionary join).
  *
  * Scale shape: the EVAL side is small by nature (benchmarks are
  * thousands of documents, the corpus is billions), so its distinct
  * hashed-shingle dictionary broadcasts; the corpus side explodes to
  * (id, shingle-hash) pairs that hit the broadcast dictionary map-side —
  * only the MATCHING pairs reach the per-document count shuffle, and the
  * (tiny) overlap counts broadcast back onto the id list. The corpus
  * text itself never shuffles. Shingles compare as 64-bit hashes
  * (collisions negligible — the MinHash-oracle argument).
  */
object Decontamination {

  /** @return one row per `train` document: (idCol, n_overlap,
    *         contaminated) — distinct shared shingles vs the eval set
    *         and the ≥ `minShingles` flag */
  def overlapCounts(train: DataFrame, eval_ : DataFrame, idCol: String,
                    textCol: String, shingleK: Int = 3,
                    minShingles: Int = 5): DataFrame = {
    val evalDict = eval_
      .select(explode(TextAnalysis.hashedShingles(col(textCol), shingleK)).as("__g"))
      .distinct()
    val hits = train
      .select(col(idCol), explode(TextAnalysis.hashedShingles(col(textCol), shingleK)).as("__g"))
      .join(broadcast(evalDict), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n")) // shingle sets are distinct per doc already
    // no broadcast hint on the counts side: usually tiny (AQE broadcasts
    // it), but a heavily-contaminated corpus must not OOM the driver
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).cast("int").as("n_overlap"),
        (coalesce(col("__n"), lit(0L)) >= minShingles).as("contaminated"))
  }
}
