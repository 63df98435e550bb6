package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF characteristic-term extraction over a document table (SURVEY.md
  * §2.8 engine-added: "tokenization + TF-IDF over documents.text").
  *
  * Classic formulation: tf(d,w) = term count in d, idf(w) = ln(N / df(w))
  * with df = number of documents containing w. A term appearing in every
  * document scores exactly 0 (ln 1), so boilerplate vanishes from the top-k.
  *
  * Scale shape: one explode pass; tf is a (doc, term) groupBy; df is a
  * vocab-bounded groupBy over tf's output (map-side combinable); the final
  * join shuffles on term, bounded by vocab — the same profile as the
  * frequency queries. N is a one-row corpus-count aggregate broadcast-
  * cross-joined into the scoring plan — part of the SAME job, not a
  * separate driver-side action (count over docs, deliberately NOT
  * count(distinct doc_id) over tf, which would miss termless documents).
  * ln is not cross-engine bit-stable, so the gate entry is rows-only;
  * TextOpsSpec pins hand-computed values.
  */
object TfIdf {

  /** Top-k terms per document by tf·idf; ties broken by term ascending.
    * Returns (idCol, term, tf, df, tfidf, rn).
    */
  def topTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDf)) // one row: N rides along instead of a 2nd action
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rn"))
  }
}
