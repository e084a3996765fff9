package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.text.SplitHash

/** Table-lifecycle / warehouse-maintenance operators — the jobs a
  * 100 TB lakehouse runs BETWEEN queries: snapshot reconciliation,
  * small-file compaction planning, zone-map (min/max) data skipping,
  * and deterministic k-fold assignment for training splits. The
  * reference has no lifecycle surface at all (its storage story is
  * "write one text file per reduce partition", reference
  * worker.py:200-209, and re-upload for every run); these operators
  * are what replaces that story when the corpus is a long-lived
  * table instead of a per-job upload.
  *
  * Scale shapes: snapshotDiff is ONE full-outer equi-join on the
  * primary key (both sides shuffle-partitioned on it — the standard
  * reconciliation plan at any size); compactionPlan's window is
  * partitioned per day so no task ever sees more than one day's file
  * manifest (manifests are file-count-sized, not data-sized);
  * zoneMapPrune is a single partial+final aggregate producing one row
  * per file; kfoldAssign is a map-only hash bucket plus one
  * K-row aggregate. Nothing here collects to the driver.
  */
object Maintenance {

  // ---- snapshot diff ------------------------------------------------

  /** Symmetric snapshot reconciliation (table diff): given yesterday's
    * and today's versions of a keyed table, emit every key whose row
    * was added, removed, or changed — the integrity check run after a
    * backfill, and the input to an incremental downstream refresh
    * (the symmetric counterpart of [[Relational.cdcMerge]], which
    * APPLIES a known changeset; this RECOVERS the changeset from two
    * snapshots). Rows are compared by an md5 signature over the
    * non-key columns, so the join carries two narrow (key, sig)
    * frames, never the full row width — at 100 TB the signature is
    * what makes the diff network-viable.
    *
    * The two "snapshots" are carved deterministically from `orders`
    * so both engines reproduce them: keys ≡7 (mod 10) exist only in
    * the new snapshot (added), keys ≡3 only in the old (removed),
    * keys ≡5 have their total doubled in the new one (changed).
    */
  /** The deterministic two-snapshot carve shared by [[snapshotDiff]]
    * and [[psiDrift]] (and replayed by both oracles via
    * [[CarveOldWhere]]/[[CarveNewWhere]]/[[CarveNewPrice]]): keys ≡7
    * (mod 10) exist only in the new snapshot, keys ≡3 only in the
    * old, keys ≡5 carry a doubled total in the new one. ONE
    * definition — a drift between the diff and the drift monitor
    * would silently invalidate the "reuses snapshotDiff's snapshots"
    * contract.
    */
  private def snapshotMod = pmod(col("o_orderkey"), lit(10))
  private[ops] def snapshotOld(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(snapshotMod =!= 7)
  private[ops] def snapshotNew(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(snapshotMod =!= 3)
      .withColumn("o_totalprice",
        when(snapshotMod === 5, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
  private val CarveOldWhere = "o_orderkey % 10 <> 7"
  private val CarveNewWhere = "o_orderkey % 10 <> 3"
  private val CarveNewPrice =
    "CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 2 ELSE o_totalprice END"

  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    // the signature is schema-driven — EVERY non-key column of the
    // snapshot, not a hand-picked subset, so widening orders can never
    // silently exempt a column from change detection. Types with
    // ambiguous text forms render canonically (fixed-scale decimal,
    // ISO date); concat_ws drops nulls, fine for the NOT NULL fixture
    // (a nullable schema would want explicit null sentinels).
    def sig(df: DataFrame, alias: String): DataFrame = {
      val parts = df.columns.filterNot(_ == "o_orderkey").sorted.map {
        case c @ "o_totalprice" => col(c).cast("decimal(18,2)").cast("string")
        case c @ "o_orderdate"  => date_format(col(c), "yyyy-MM-dd")
        case c                  => col(c).cast("string")
      }
      df.select(col("o_orderkey"),
        md5(concat_ws("|", parts: _*).cast("binary")).as(alias))
    }
    val old = sig(snapshotOld(s, dir), "sig_old")
    val nw = sig(snapshotNew(s, dir), "sig_new")
    old.join(nw, Seq("o_orderkey"), "full")
      .select(col("o_orderkey"),
        when(col("sig_old").isNull, lit("added"))
          .when(col("sig_new").isNull, lit("removed"))
          .when(col("sig_old") =!= col("sig_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** The oracle never needs the signature: the carve-out rules are
    * semantic, so it classifies by membership + value equality. Keys
    * with equal rows on both sides fall out of the WHERE — exactly
    * the rows whose signatures match on the Spark side.
    */
  private val snapshotDiffOracle =
    s"""WITH old AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE $CarveOldWhere),
      |new AS (
      |  SELECT o_orderkey, $CarveNewPrice AS o_totalprice
      |  FROM orders WHERE $CarveNewWhere)
      |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
      |  CASE WHEN old.o_orderkey IS NULL THEN 'added'
      |       WHEN new.o_orderkey IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status
      |FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
      |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
      |   OR old.o_totalprice <> new.o_totalprice""".stripMargin

  // ---- compaction planning ------------------------------------------

  /** Fragments-per-partition in the simulated layout, and the target
    * output size a compaction pass packs them into. 40 fragments/day
    * at the fixture's event volume yields multi-file groups at every
    * scale factor without degenerating to one group per day.
    */
  val CompactionFragments = 40
  val CompactionTargetBytes = 512L

  /** Small-file compaction planner — the scheduled maintenance job
    * that keeps a streaming-ingested table readable: group each
    * day-partition's file fragments into contiguous runs of ≈target
    * total bytes (each run becomes ONE rewritten output file). The
    * "files" are simulated from `events` — fragment id = a
    * content-stable hash bucket of the event id (what a 40-writer
    * ingestion would produce), fragment size = its rows' payload
    * bytes. Packing is the contiguous cumulative-sum rule:
    * group = floor((running_bytes − 1) / target), the one-pass
    * SQL-expressible variant of greedy bin packing (first-fit would
    * need a serial scan; the cumulative rule plans every partition
    * independently and parallel).
    *
    * Scale: the window is partitioned per day and ranges over a
    * day's FILE MANIFEST (≤ [[CompactionFragments]] rows here,
    * file-count-sized in production) — never over event rows. The
    * heavy part (sizing the fragments) is one partial+final
    * aggregate over the fact table.
    */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val frags = Tables.events(s, dir)
      .select(
        floor(unix_micros(col("ts")) / lit(dayUs.toDouble)).cast("long").as("day"),
        pmod(SplitHash.fold(col("event_id").cast("string").cast("binary")),
          lit(CompactionFragments.toLong)).as("file_id"),
        (length(col("props")) + lit(32L)).as("bytes"))
      .groupBy(col("day"), col("file_id"))
      .agg(sum(col("bytes")).as("f_bytes"))
    val cum = sum(col("f_bytes"))
      .over(Window.partitionBy(col("day")).orderBy(col("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    frags.select(col("day"), col("file_id"), col("f_bytes"),
      packingGroup(cum, CompactionTargetBytes).as("grp"))
  }

  /** The contiguous cumulative-sum packing rule: a fragment belongs
    * to the group its running total ENDS in, with exact-boundary
    * totals staying in the lower group (the −1). Exposed so
    * MaintenanceSpec can drive it over adversarial synthetic
    * manifests (boundary-aligned sizes, oversized fragments) that
    * the fixture cannot plant.
    */
  private[ops] def packingGroup(cum: Column, target: Long): Column =
    floor((cum - 1) / lit(target.toDouble)).cast("long")

  private val compactionOracle =
    s"""WITH frags AS (
       |  SELECT CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
       |    ${SplitHash.foldSql("CAST(event_id AS VARCHAR)")}
       |      % $CompactionFragments AS file_id,
       |    CAST(SUM(length(props) + 32) AS BIGINT) AS f_bytes
       |  FROM events GROUP BY 1, 2)
       |SELECT day, file_id, f_bytes,
       |  CAST(FLOOR((SUM(f_bytes) OVER (PARTITION BY day ORDER BY file_id
       |    ROWS UNBOUNDED PRECEDING) - 1) / $CompactionTargetBytes.0) AS BIGINT)
       |    AS grp
       |FROM frags""".stripMargin

  // ---- zone-map data skipping ---------------------------------------

  /** Predicate window for the zone-map report: a range that PARTIALLY
    * overlaps its boundary files, so the report exercises skip, keep,
    * and keep-with-partial-match — the conservative case that proves
    * min/max pruning never claims exactness.
    */
  val ZoneLo = "1995-02-15"
  val ZoneHi = "1995-08-15"

  /** Zone-map (min/max statistics) skipping report — the file-level
    * metadata pass a lakehouse scan planner runs BEFORE touching
    * data: per file, the min/max of the predicate column and whether
    * the ship-date range predicate can skip the file outright
    * (max < lo or min > hi). Files are simulated as ship-month runs —
    * the clustering an ingestion-time-ordered write (or a date
    * Z-order) produces, which is the layout that makes zone maps
    * effective at all; the fixture's key columns are intentionally
    * uncorrelated with dates, so a key-span layout here would show
    * the (equally real) zero-skip degenerate case instead. This is
    * the operator behind parquet row-group statistics / Iceberg
    * manifests / Delta data skipping, surfaced as a query so its
    * guarantee is checkable: a `skipped` file provably contains NO
    * qualifying rows (MaintenanceSpec re-scans to prove it, and
    * pins a kept file with both matching and non-matching rows —
    * pruning is conservative, not exact).
    *
    * One partial+final aggregate, one row per file out. At 100 TB
    * the same plan reads the manifest instead of the data — the
    * point of the operator is that min/max is all it needs.
    */
  def zoneMapPrune(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_day"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_day"))
      .select(col("file_id"), col("n_rows"), col("min_day"), col("max_day"),
        (col("max_day") < lit(ZoneLo) || col("min_day") > lit(ZoneHi))
          .as("skipped"))

  private val zoneMapOracle =
    s"""WITH z AS (
       |  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
       |      AS file_id,
       |    COUNT(*) AS n_rows,
       |    strftime(MIN(CAST(l_shipdate AS TIMESTAMP)), '%Y-%m-%d') AS min_day,
       |    strftime(MAX(CAST(l_shipdate AS TIMESTAMP)), '%Y-%m-%d') AS max_day
       |  FROM lineitem GROUP BY 1)
       |SELECT file_id, n_rows, min_day, max_day,
       |  (max_day < '$ZoneLo' OR min_day > '$ZoneHi') AS skipped
       |FROM z""".stripMargin

  // ---- referential repair -------------------------------------------

  /** Orphaned-foreign-key repair — the remediation step after
    * [[Aggregates.qualityConstraints]] REPORTS violations: fact rows
    * whose dimension key no longer resolves (here a carved dimension
    * — customers with key ≡3 (mod 50) "deleted" — plants real
    * orphans) are remapped to the −1 sentinel member and tagged, so
    * downstream joins stay inner (no silent row loss) and the repair
    * is auditable row-by-row. One left equi join against the
    * deduplicated dimension KEY SET (never the full dim width); at
    * 100 TB both sides shuffle-partition on the key — the standard
    * conformance pass of every dimensional load.
    */
  def fkRepair(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(pmod(col("c_custkey"), lit(50)) =!= 3)
      .select(col("c_custkey"))
    Tables.orders(s, dir)
      .join(dim, col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"),
        when(col("c_custkey").isNull, lit(-1L)).otherwise(col("o_custkey"))
          .as("custkey_repaired"),
        col("c_custkey").isNull.as("was_orphan"))
  }

  private val fkRepairOracle =
    """SELECT o_orderkey,
      |  CASE WHEN c_custkey IS NULL THEN -1 ELSE o_custkey END
      |    AS custkey_repaired,
      |  c_custkey IS NULL AS was_orphan
      |FROM orders LEFT JOIN
      |  (SELECT c_custkey FROM customer WHERE c_custkey % 50 <> 3) c
      |  ON o_custkey = c_custkey""".stripMargin

  // ---- distribution drift (PSI) -------------------------------------

  /** Population Stability Index between the two snapshot versions'
    * price distributions — the drift monitor run on every model
    * feature before a retrain ships: bucket CURRENT data by the
    * REFERENCE snapshot's deciles and score
    * Σ (p_cur − p_ref) · ln(p_cur / p_ref). Reuses [[snapshotDiff]]'s
    * carved snapshots (the doubled prices of the ≡5 keys are real
    * upper-tail drift, so the index is exercised, not vacuous).
    *
    * Shape: one sort-aggregate computes the reference deciles
    * (collected as B−1 plan literals — the [[Aggregates.histogramEquidepth]]
    * discipline), then each snapshot is one map-only binning pass +
    * one 10-row aggregate; the per-bucket PSI term is a scalar
    * expression over the joined 10-row frames. Empty current buckets
    * are floored at p=1e-6 (the standard PSI guard) so the index
    * stays finite.
    */
  val PsiBuckets = 10

  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val ref = snapshotOld(s, dir).select(col("o_totalprice").as("v"))
    val cur = snapshotNew(s, dir).select(col("o_totalprice").as("v"))
    val qs = (1 until PsiBuckets).map(_.toDouble / PsiBuckets)
    val boundaries = ref
      .agg(percentile(col("v"), array(qs.map(lit): _*)).as("bs"))
      .head().getSeq[Double](0)
    def bucketed(df: DataFrame, n: String): DataFrame =
      df.groupBy(Aggregates.bucketByBoundaries(col("v"), boundaries)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as(n))
    val refB = bucketed(ref, "n_ref")
    val curB = bucketed(cur, "n_cur")
    val refTot = sum(col("n_ref")).over(graft.Bounded.global)
    val curTot = sum(col("n_cur")).over(graft.Bounded.global)
    // the totals window is over the 10-row bucket frame (model-sized)
    refB.join(curB, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        greatest(col("n_ref") / refTot.cast("double"), lit(1e-6)).as("p_ref"),
        greatest(col("n_cur") / curTot.cast("double"), lit(1e-6)).as("p_cur"))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref"))
          * log(col("p_cur") / col("p_ref")), 6).as("psi_term"))
  }

  private val psiOracle = {
    val cases = Aggregates.bucketCasesSql("v", PsiBuckets)
    s"""WITH refs AS (
       |  SELECT o_totalprice AS v FROM orders WHERE $CarveOldWhere),
       |curs AS (
       |  SELECT $CarveNewPrice AS v FROM orders WHERE $CarveNewWhere),
       |b AS (SELECT quantile_cont(v,
       |  [${Aggregates.quantilePointsSql(PsiBuckets)}]) AS qs FROM refs),
       |rb AS (SELECT CAST($cases AS BIGINT) AS bucket, COUNT(*) AS n_ref
       |       FROM refs, b GROUP BY 1),
       |cb AS (SELECT CAST($cases AS BIGINT) AS bucket, COUNT(*) AS n_cur
       |       FROM curs, b GROUP BY 1),
       |j AS (
       |  SELECT COALESCE(rb.bucket, cb.bucket) AS bucket,
       |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
       |  FROM rb FULL JOIN cb ON rb.bucket = cb.bucket),
       |p AS (
       |  SELECT bucket, n_ref, n_cur,
       |    GREATEST(n_ref / CAST((SELECT SUM(n_ref) FROM j) AS DOUBLE), 1e-6)
       |      AS p_ref,
       |    GREATEST(n_cur / CAST((SELECT SUM(n_cur) FROM j) AS DOUBLE), 1e-6)
       |      AS p_cur
       |  FROM j)
       |SELECT bucket, n_ref, n_cur,
       |  round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       |  round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
       |FROM p""".stripMargin
  }

  // ---- k-fold assignment --------------------------------------------

  val KFolds = 5L

  /** Deterministic k-fold cross-validation assignment over the
    * document corpus — the split layer under any eval protocol that
    * trains K times: fold = content-stable hash of doc_id mod K (the
    * [[SplitHash]] discipline every split/sampling operator shares,
    * so fold membership can never desynchronize from hashSplit's
    * train/val/test labels), reported as a per-fold balance audit
    * (doc count, payload bytes, distinct languages). Map-only bucket
    * + one K-row aggregate; the per-doc assignment never shuffles.
    */
  def kfoldAssign(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(pmod(SplitHash.fold(col("doc_id").cast("string").cast("binary")),
        lit(KFolds)).as("fold"), col("n_chars"), col("lang"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))

  private val kfoldOracle =
    s"""SELECT ${SplitHash.foldSql("CAST(doc_id AS VARCHAR)")} % $KFolds AS fold,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  COUNT(DISTINCT lang) AS n_langs
       |FROM documents GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("snapshot_diff", snapshotDiffOracle)(snapshotDiff),
    Q("compaction_plan", compactionOracle)(compactionPlan),
    Q("zone_map_prune", zoneMapOracle)(zoneMapPrune),
    Q("kfold_assign", kfoldOracle)(kfoldAssign),
    Q("psi_drift", psiOracle)(psiDrift),
    Q("fk_repair", fkRepairOracle)(fkRepair),
  )
}
