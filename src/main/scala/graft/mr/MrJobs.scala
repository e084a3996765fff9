package graft.mr

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}

/** The reference's two shipped jobs re-expressed *through the generic
  * MapReduce contract* (not the declarative TextOps plans) and checked
  * against the same DuckDB oracles — proving the contract computes
  * what the reference's user API computes. A user porting any
  * reference job writes exactly this shape.
  */
object MrJobs {

  /** The reference tokenizer: re.findall(r"\b[a-z]+\b", text.lower())
    * (reference word_count.py:35-41).
    */
  private val Token = "[a-z]+".r
  def tokenize(text: String): List[String] =
    Token.findAllIn(text.toLowerCase).toList

  /** Word count via the associative path (map emits (word, 1); the
    * combiner sums map-side — reference word_count.py:44-56 but
    * without shipping every 1 through the shuffle).
    */
  def mrWordCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select("text").as[String]
    MapReduce.runReduced[String, String, Long, (String, Long)](
      docs,
      text => tokenize(text).map(w => (w, 1L)),
      _ + _,
      (word, n) => (word, n))
      .toDF("word", "cnt")
  }

  /** Inverted index via the generic reduce (needs the full doc-id set
    * per word — reference inverted_index.py:50-62). Map-side
    * per-document dedup before the shuffle, like the reference's
    * set(words) (inverted_index.py:44-47).
    */
  def mrInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select("doc_id", "text").as[(Long, String)]
    MapReduce.run[(Long, String), String, Long, (String, String)](
      docs,
      { case (docId, text) => tokenize(text).distinct.map(w => (w, docId)) },
      (word, docIds) =>
        Iterator((word, docIds.toSeq.distinct.sorted.mkString(","))))
      .toDF("word", "docs")
  }

  private def oracleOf(name: String): String =
    graft.text.TextOps.all.find(_.name == name).get.oracle.get

  val all: Seq[Q] = Seq(
    Q("mr_word_count", oracleOf("word_count"))(mrWordCount),
    Q("mr_inverted_index", oracleOf("inverted_index"))(mrInvertedIndex),
  )
}
