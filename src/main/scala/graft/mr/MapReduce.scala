package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** File metadata handed to a custom record iterator — the reference
  * passes {"size", "file_path"} (reference worker.py:131-135,
  * README.md:62-69).
  */
final case class FileMeta(path: String, size: Long)

/** The reference's generic MapReduce contract, typed and Spark-native.
  *
  * The reference's entire user API is three dynamically-loaded Python
  * functions (reference worker.py:40-50, design.md:47-49):
  *   iterator: (file_bytes, meta) → yield (k, v)      [optional]
  *   map:      (k1, v1) → iterable[(k2, v2)]
  *   reduce:   (k2, list[v2]) → iterable[out]
  * executed as scan → flatMap → hash-partition shuffle → group-by-key
  * → reduce (reference worker.py:118-214). Here that pipeline is
  * `Dataset.flatMap → groupByKey → flatMapGroups`: Spark's shuffle
  * replaces the reference's per-worker Parquet shuffle files, its
  * DAGScheduler replaces the master's task loop, and closure
  * serialization replaces exec'ing job scripts from HDFS.
  *
  * Deliberate divergences from the reference (documented defects,
  * SURVEY.md §2.5):
  *  - deterministic Murmur3 partitioning — the reference uses Python's
  *    per-process salted hash(), so the same key can land in different
  *    partitions from different workers (reference worker.py:136);
  *    MapReduceSpec's partition-invariance property pins our fix;
  *  - no silent loss: the reference skips unreadable shuffle files
  *    (reference worker.py:177-186); Spark re-runs the stage;
  *  - values stay typed end-to-end instead of str-coerced at the
  *    shuffle boundary (reference worker.py:137-145).
  *
  * Scale: `run` groups with no combiner — faithful to the reference's
  * reduce contract, which may see all values of a key (OK for bounded
  * groups; the word-count-shaped jobs the reference ships have
  * stopword-skewed keys, so at 100 TB prefer [[runReduced]]).
  * [[runReduced]] is the associative path: `reduceGroups` runs an
  * Aggregator with map-side partial aggregation — the combiner the
  * reference lacks — so skewed keys never materialize a full group.
  */
object MapReduce {

  /** S1 — whole-file scan: one record per file, all bytes + metadata
    * (reference worker.py:129-133). Column pruning applies: dropping
    * `content` before an action prunes the byte read entirely.
    */
  def wholeFiles(spark: SparkSession, path: String): Dataset[(Array[Byte], FileMeta)] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"), col("path"), col("length"))
      .as[(Array[Byte], String, Long)]
      .map { case (bytes, p, len) => (bytes, FileMeta(p, len)) }
  }

  /** S2 — default line-record reader: (line_index_within_file, line),
    * the record shape used when no iterator fn is given (reference
    * worker.py:141-145). Whole-file read + split keeps the per-file
    * index exact; the reference reads whole files too.
    */
  def textLines(spark: SparkSession, path: String): Dataset[(Long, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(_.split("\n", -1).iterator.zipWithIndex
        .map { case (line, i) => (i.toLong, line) })
  }

  /** S3 — custom record iterator (UDTF-like): user generator over
    * (bytes, meta), e.g. the reference's word_count.py:10-21 iterator.
    */
  def iterate[K: Encoder, V: Encoder](
      files: Dataset[(Array[Byte], FileMeta)],
      iteratorFn: (Array[Byte], FileMeta) => IterableOnce[(K, V)])(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    files.flatMap { case (bytes, meta) => iteratorFn(bytes, meta) }

  /** C1–C4 — the full contract: flatMap, deterministic hash shuffle,
    * group-by-key, generic reduce. `reduceFn` receives the key and an
    * iterator over all its values, exactly `reduce_fn(key, values)`
    * (reference worker.py:200-207) — but streamed, not a list.
    */
  def run[IN, K2, V2, OUT](
      input: Dataset[IN],
      mapFn: IN => IterableOnce[(K2, V2)],
      reduceFn: (K2, Iterator[V2]) => IterableOnce[OUT])(
      implicit kv: Encoder[(K2, V2)], k: Encoder[K2], out: Encoder[OUT]): Dataset[OUT] =
    input.flatMap(mapFn)
      .groupByKey(_._1)
      .flatMapGroups((key, pairs) => reduceFn(key, pairs.map(_._2)))

  /** Associative-reduce fast path: map-side partial aggregation (the
    * combiner the reference lacks), then one value per key reaches the
    * reducer side. Use when reduce is a commutative monoid fold — the
    * only shape that scales past memory on skewed keys.
    */
  def runReduced[IN, K2, V2, OUT](
      input: Dataset[IN],
      mapFn: IN => IterableOnce[(K2, V2)],
      combineFn: (V2, V2) => V2,
      finishFn: (K2, V2) => OUT)(
      implicit kv: Encoder[(K2, V2)], k: Encoder[K2], out: Encoder[OUT]): Dataset[OUT] =
    input.flatMap(mapFn)
      .groupByKey(_._1)
      .reduceGroups((a: (K2, V2), b: (K2, V2)) => (a._1, combineFn(a._2, b._2)))
      .map { case (key, (_, v)) => finishFn(key, v) }
}
