package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the classic corpus-statistics weighting
  * (Salton & Buckley, "Term-weighting approaches in automatic text
  * retrieval", 1988): score(term, doc) = tf · ln(N / df). Pipelines use
  * it for topic tagging, keyword indexing, and per-domain vocabulary
  * drift checks over a training corpus.
  *
  * Scale shape: one explode to (doc, term) pairs, one map-side-
  * combinable aggregate to term frequencies, one aggregate over the
  * pairs to document frequencies (already distinct per doc, so a plain
  * count), then a pairs⋈df equi-join on the term — the document-
  * frequency dictionary is |vocab| rows, NOT broadcast by hint because
  * real vocabularies (especially n-gram ones) outgrow a broadcast;
  * AQE may still choose to. The final top-k is a per-document window —
  * partitioned by doc id, so no global sort and no single reducer.
  * Scores are rounded to 6dp BEFORE ranking so the ordering is
  * reproducible across engines (the cosine-oracle precision argument).
  */
object Tfidf {

  /** Top-`k` terms per document by tf·idf, ties broken by term.
    *
    * @return (idCol, term, tf, score, rank) — `score` rounded to 6dp,
    *         rank 1..k dense within each document
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val pairs = docs
      .select(col(idCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    pairs
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs)) // 1 row — the only legitimate crossJoin
      .withColumn("score", round(col("tf") * log(col("__n") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }
}
