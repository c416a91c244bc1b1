package graft.similarity

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al.,
  * SIGIR'09) of a lexical BM25 list and a semantic cosine list for the
  * SAME query document — the fusion step every retrieval-augmented
  * curation stack runs between its keyword index and its vector index.
  * The reference ranks by single signals only; an LLM-data pipeline
  * fuses them (mining paraphrase near-dups that either signal alone
  * misses, and building retrieval eval sets).
  *
  * Query = the longest document that has an embedding (deterministic:
  * n_chars DESC, doc_id ASC — doc_id keys the embeddings table by
  * construction of the corpus). Lexical query terms are that doc's
  * top-3 tokens by term frequency; the semantic query is its vector.
  *
  * Scale shape: the corpus pays ONE tokenize into the staged tf frame
  * (same staging discipline as tfidf/bm25); the query side — query
  * doc, 3-token idf table, query vector, totals — is all 1-to-3-row
  * broadcasts, so lexical scoring is a scan-local map over tf and
  * semantic scoring a scan-local map over vectors; both lists then
  * reduce through TakeOrderedAndProject (no global sort, no full-
  * corpus window) and the fusion join runs on two ≤TopN-row frames.
  * At index-backed scale the semantic scan swaps for `LshAnn.annTopK`
  * candidates; the fusion algebra is list-source-agnostic.
  *
  * Oracle-exact end-to-end: BM25 scores are the repo's exact-rational
  * int64 formulation (see `TextFunctions.bm25Search`), cosines are
  * bit-identical across engines (`graft_dot` ≡ `list_dot_product`
  * accumulation order), ranks are integer row_numbers with total
  * tiebreaks, and each RRF term 1/(60+rank) is one IEEE division of
  * exact integers, summed in fixed textual order before round4.
  */
object Hybrid {

  /** List depth per signal (the standard fusion cut). */
  val TopN = 50

  /** RRF smoothing constant (Cormack et al.'s k = 60). */
  val RrfK = 60

  /** q_hybrid_search: doc_id, lex_rank, sem_rank (−1 = absent from that
    * list), rrf — fused candidates ordered by fused score.
    */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val vecs = Knn.vectors(spark, dir) // vec_id, e, norm
    // Query doc: longest doc that HAS a vector — a KEYLESS max-struct
    // aggregate (map-side partials, no sort), which is also the one
    // broadcast-build shape the plan gate can PROVE is a single row
    // (PlanShapeSpec's bounded-BNLJ rule); (n_chars, −doc_id) max ≡
    // (n_chars DESC, doc_id ASC) top-1.
    val qdoc = docs
      .join(vecs.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("m"))
      .select((-col("m.neg_id")).as("q_doc"))

    // ---- Lexical list: BM25 over the corpus for the query doc's top-3 terms.
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
    val tf = graft.Staging.staged(
      tokens.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")), "hybrid_tf")
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val totals = tf.agg(count_distinct(col("doc_id")).as("n_docs"), sum("tf").as("t_tok"))
    val qtoks = tf
      .join(broadcast(qdoc), col("doc_id") === col("q_doc"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(3)
      .select("tok")
    val idf = dfreq
      .join(broadcast(qtoks), "tok")
      .join(broadcast(totals))
      .withColumn("idf4",
        floor((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) * 10000 + 0.5).cast("long"))
      .select("tok", "idf4")
    val lexScored = tf
      .join(broadcast(idf), "tok")
      .join(dl, "doc_id")
      .join(broadcast(totals))
      .join(broadcast(qdoc))
      .filter(col("doc_id") =!= col("q_doc"))
      .withColumn("score4",
        floor(
          (col("idf4") * 22L * col("tf") * col("t_tok")).cast("double")
            / (lit(10L) * col("tf") * col("t_tok") + lit(3L) * col("t_tok")
                + lit(9L) * col("dl") * col("n_docs")).cast("double")
            + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(sum("score4").as("s4"))
    val lex = lexScored
      .orderBy(col("s4").desc, col("doc_id").asc)
      .limit(TopN)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("s4").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "lex_rank")

    // ---- Semantic list: exact cosine of every vector vs the query vector.
    // Re-aggregated keyless after the 1-row equi probe for the same
    // provable-single-row broadcast shape (first() is deterministic on
    // a one-row frame).
    val qv = vecs
      .join(broadcast(qdoc), col("vec_id") === col("q_doc"))
      .agg(first(col("vec_id")).as("q_id"), first(col("e")).as("qe"), first(col("norm")).as("qn"))
    val semScored = vecs
      .join(broadcast(qv))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("graft_dot(qe, e)") / (col("qn") * col("norm")))
    val sem = semScored
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopN)
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))

    // ---- RRF fusion over the two ≤TopN-row lists.
    lex
      .join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(RrfK.toLong) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfK.toLong) + col("sem_rank")), lit(0.0)))
      .select(
        col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(-1L)).as("sem_rank"),
        Num.round4(col("rrf_raw")).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
  }
}
