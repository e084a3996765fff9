package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar function surface (SURVEY.md §2.4): string, date, math,
  * conditional, JSON, array. All row-level and codegen'd — these stay
  * inside WholeStageCodegen with the scan, so at scale they cost one
  * pass over the data with pushdown intact.
  *
  * Oracle parity notes baked into each query:
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all semantics.
  *  - DuckDB floor() returns DOUBLE where Spark returns LONG — the
  *    oracle casts.
  *  - round() on doubles is avoided entirely: Spark rounds the exact
  *    decimal value, DuckDB rounds in double space; they can disagree
  *    in the last ulp.
  */
object ScalarOps {

  def scalarString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").contains("e"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("pre5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "@").as("repl"))

  def scalarDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since"))

  def scalarMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        (col("l_orderkey") % 7).as("k_mod7"),
        (col("l_extendedprice") * col("l_extendedprice")).as("price_sq"),
        greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
        least(col("l_quantity"), lit(25.0)).as("qty_lo"))

  def scalarCase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("band"),
        col("o_orderstatus").isin("F", "P").as("closed"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"))
      .groupBy(col("band"), col("closed"), col("st"))
      .agg(count(lit(1)).as("n"))

  /** JSON extraction from the events.props payload column. */
  def scalarJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))

  /** Schema-full JSON parsing (from_json → typed struct) and
    * re-serialization (to_json) — the other half of the JSON surface
    * next to scalar_json's path extraction. Round-tripping through a
    * declared schema is what a pipeline does when it trusts the
    * payload shape; the canonical re-serialized form is compared, not
    * the raw string.
    */
  def jsonStruct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
      .select(col("event_id"), col("p.k").as("k"),
        to_json(struct(col("p.k").as("k"))).as("canon"))

  /** Spark 4 VARIANT — the semi-structured path for payloads whose
    * shape is NOT declared up front (from_json needs a schema,
    * get_json_object re-parses the string per extraction). parse_json
    * builds the binary variant once; variant_get navigates it typed;
    * schema_of_variant reports the discovered shape. At 100 TB this
    * is the ingestion-side answer to schema drift: land the payload
    * as VARIANT, extract lazily, let the shape vary row to row
    * without a reader schema change.
    */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(parse_json(col("props")).as("v"))
      .select(variant_get(col("v"), "$.k", "int").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))

  /** MapType functions: construct a map, read keys/values/lookups.
    * The fixtures carry no MapType column, so the map is built from
    * order columns — the functions under test are map_keys /
    * map_values / element_at. DuckDB's map extraction returns a
    * single-element LIST, so the oracle unwraps with [1].
    */
  def mapOps(s: SparkSession, dir: String): DataFrame = {
    val m = map(
      lit("status"), col("o_orderstatus"),
      lit("priority"), col("o_orderpriority"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        element_at(m, "status").as("status"),
        element_at(m, "priority").as("priority"),
        array_join(sort_array(map_keys(m)), ",").as("keys"),
        size(map_values(m)).cast("long").as("n_vals"))
  }

  /** Array functions over the embedding vector column. */
  def arrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        size(filter(col("embedding"), _ > 0f)).cast("long").as("n_pos"),
        element_at(col("embedding"), 1).as("first_elem"))

  private val ZBits = 16

  /** Morton (Z-order) interleave of two key columns — the
    * space-filling-curve layout key behind multi-column data
    * clustering at scale: sort/partition a 100 TB table by zkey and
    * range scans on EITHER key touch a bounded band of files, where
    * single-column sort order helps only its own column. Pure bit
    * arithmetic (32 shift-and-mask terms, fully codegen'd, identical
    * in DuckDB), so the layout transform itself is under the
    * differential gate. Top-N by zkey keeps the output stable and
    * demonstrates the clustering order.
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame = {
    def interleave(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (0 until ZBits).map { i =>
        (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)) +
          (shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
      }.reduce(_ + _)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        interleave(pmod(col("l_partkey"), lit(1 << ZBits)),
          pmod(col("l_suppkey"), lit(1 << ZBits))).as("zkey"))
      // full tiebreak: rows equal on every output column are
      // interchangeable at the LIMIT cut, anything less is not
      .orderBy(col("zkey"), col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .limit(100)
  }

  val all: Seq[Q] = Seq(
    Q("zorder_key",
      s"""SELECT l_orderkey, l_partkey, l_suppkey, zkey FROM (
         |  SELECT l_orderkey, l_partkey, l_suppkey,
         |    ${(0 until ZBits).map(i =>
              s"((((l_partkey % ${1 << ZBits}) >> $i) & 1) << ${2 * i}) + " +
              s"((((l_suppkey % ${1 << ZBits}) >> $i) & 1) << ${2 * i + 1})")
              .mkString("(", " + ", ")")} AS zkey
         |  FROM lineitem)
         |ORDER BY zkey, l_orderkey, l_partkey, l_suppkey
         |LIMIT 100""".stripMargin)(zorderKey),
    Q("scalar_string",
      """SELECT p_partkey, upper(p_name) AS up_name, length(p_name) AS name_len,
        |  substr(p_name, 1, 5) AS pre5,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, 'a', '@', 'g') AS repl
        |FROM part WHERE p_name LIKE '%e%'""".stripMargin)(scalarString),
    Q("scalar_date",
      """SELECT o_orderkey,
        |  EXTRACT(YEAR FROM o_orderdate) AS yr,
        |  EXTRACT(MONTH FROM o_orderdate) AS mon,
        |  EXTRACT(DAY FROM o_orderdate) AS dom,
        |  EXTRACT(QUARTER FROM o_orderdate) AS qtr,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders""".stripMargin)(scalarDate),
    Q("scalar_math",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  l_orderkey % 7 AS k_mod7,
        |  l_extendedprice * l_extendedprice AS price_sq,
        |  greatest(l_quantity, 25.0) AS qty_hi,
        |  least(l_quantity, 25.0) AS qty_lo
        |FROM lineitem""".stripMargin)(scalarMath),
    Q("scalar_case",
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  o_orderstatus IN ('F', 'P') AS closed,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2, 3""".stripMargin)(scalarCase),
    Q("scalar_json",
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin)(scalarJson),
    Q("variant_extract",
      """SELECT CAST(props->>'k' AS INT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin)(variantExtract),
    Q("json_struct",
      // COALESCE: Spark's to_json(struct(null k)) emits '{}' while a
      // NULL in the DuckDB concat would null the whole string — keep
      // the oracle aligned if a props row is ever malformed.
      """SELECT event_id,
        |  CAST(props->>'k' AS INT) AS k,
        |  COALESCE('{"k":' || CAST(props->>'k' AS INT) || '}', '{}') AS canon
        |FROM events""".stripMargin)(jsonStruct),
    Q("map_ops",
      """SELECT o_orderkey,
        |  m['status'][1] AS status,
        |  m['priority'][1] AS priority,
        |  array_to_string(list_sort(map_keys(m)), ',') AS keys,
        |  len(map_values(m)) AS n_vals
        |FROM (SELECT o_orderkey,
        |  map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
        |  FROM orders)""".stripMargin)(mapOps),
    Q("array_ops",
      """SELECT vec_id, len(embedding) AS dim,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  embedding[1] AS first_elem
        |FROM embeddings""".stripMargin)(arrayOps),
  )
}
