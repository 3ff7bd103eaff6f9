package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar function families (SURVEY.md §2.H) — the CQL built-in
  * surface (time, blob, uuid, token, writetime/ttl, collections,
  * JSON) plus the string/math functions any analytics engine needs.
  * Everything here is a codegen'd built-in Column expression — no
  * UDFs — so the whole projection stays inside WholeStageCodegen.
  */
object ScalarFns extends QueryGroup {

  /** CQL time functions: toDate/toTimestamp/toUnixTimestamp ↦
    * to_date/date_trunc/unix_millis + calendar parts. */
  def fnTime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        to_date(col("o_orderdate")).as("as_date"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        Tables.epochMs(col("o_orderdate")).as("epoch_ms"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")

  /** String functions over part names. */
  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_brand")).as("lower_brand"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("type_word"),
        regexp_replace(col("p_name"), "a", "@").as("name_subst"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"))
      .orderBy("p_partkey")

  /** Math functions over part price/size; transcendentals rounded to
    * 6 dp to absorb last-ulp libm differences across engines. */
  def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice")).as("price_ceil"),
        abs(col("p_size") - 25).as("size_dev"),
        round(sqrt(col("p_size")), 6).as("size_sqrt"),
        round(log(col("p_retailprice")), 6).as("price_ln"),
        round(log10(col("p_retailprice")), 6).as("price_log10"),
        pow(col("p_size"), 2).cast("long").as("size_sq"),
        pmod(col("p_partkey"), lit(7)).as("key_mod7"))
      .orderBy("p_partkey")

  /** CQL blobAsX/XAsBlob: string↔binary casts, hex, base64, hashes. */
  def fnBlob(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        hex(col("p_name").cast("binary")).as("name_hex"),
        base64(col("p_name").cast("binary")).as("name_b64"),
        md5(col("p_name").cast("binary")).as("name_md5"),
        sha2(col("p_name").cast("binary"), 256).as("name_sha256"),
        octet_length(col("p_name")).as("name_bytes"))
      .orderBy("p_partkey")

  /** CQL uuid(): nondeterministic ⇒ no oracle (rows-only). */
  def fnUuid(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy("o_orderkey")
      .limit(100)
      .select(col("o_orderkey"), expr("uuid()").as("row_uuid"))

  /** CQL token(pk): the real Murmur3Partitioner ring position
    * ([[graft.plans.CassTokenExpr]] — round 6 upgrade from the
    * xxhash64 stand-in; bigint keys hash over their 8-byte big-endian
    * CQL serialization). DuckDB has no murmur3-x64-128, so the oracle
    * reads the engine's persisted token relation
    * ([[Ring.tokenPath]], hash-exact since r15) while Murmur3Spec
    * anchors the kernel against Guava's canonical murmur3_128. */
  def fnToken(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.plans.CassTokenExpr.token(col("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        tok.as("token"),
        pmod(tok, lit(32)).as("bucket"))
      .orderBy("o_orderkey")
  }

  /** WRITETIME/TTL model (SURVEY.md §1.1): events.ts is the cell
    * writetime; TTL = writetime + 7 days, filtered against a fixed
    * read time so the query stays deterministic. */
  def fnWritetimeTtl(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        Tables.epochMs(col("ts")).as("writetime_ms"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("ttl_expires"))
      .filter(col("ttl_expires") > lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
      .orderBy("event_id")

  /** Collection (list) element access / size / slice / sort. */
  def fnArray(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(words).as("n_words"),
        element_at(words, 1).as("first_word"),
        element_at(words, 3).as("third_word"),
        // array logic under test; joined to a scalar so the driver's
        // pandas compare can hash the column (arrays are unhashable there)
        array_join(array_sort(slice(words, 1, 4)), ",").as("first4_sorted"))
      .orderBy("doc_id")
  }

  /** Map construction + key/value access. The oracle mirrors the
    * extracted scalars (DuckDB MAP extraction types differ, so the
    * oracle recomputes the same outputs from the base columns). */
  def fnMap(s: SparkSession, dir: String): DataFrame = {
    val m = map(lit("type"), col("event_type"), lit("user"), col("user_id").cast("string"))
    Tables.events(s, dir)
      .select(
        col("event_id"),
        array_join(map_keys(m), ",").as("m_keys"),
        element_at(m, "type").as("m_type"),
        element_at(m, "user").as("m_user"),
        size(m).as("m_size"))
      .orderBy("event_id")
  }

  /** CQL SELECT JSON / fromJson: extract from the events.props JSON. */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_value"),
        to_json(struct(col("event_id"), col("event_type"))).as("row_json"))
      .orderBy("event_id")

  /** CQL 5 vector similarity functions (similarity_dot_product /
    * similarity_cosine / similarity_euclidean) against one query
    * vector, over the whole embeddings table. All three are composed
    * from the same float-multiply/double-accumulate kernel as the
    * similarity operators ([[graft.plans.DotProductExpr]] — codegen'd),
    * and the oracle reproduces that accumulation EXACTLY in DuckDB
    * (float element ops, double running sum), so this float surface is
    * hash-checkable, not rows-only. The query side is one broadcast
    * row; the corpus is scanned once with row-local work — the same
    * plan at any scale. */
  def fnVector(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val dotQ = graft.functions.Vectors.fdot(col("embedding"), col("q"))
    val dotSelf = graft.functions.Vectors.fdot(col("embedding"), col("embedding"))
    val dotQQ = graft.functions.Vectors.fdot(col("q"), col("q"))
    val sqDiff = aggregate(
      zip_with(col("embedding"), col("q"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, p) => acc + p)
    emb.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        round(dotQ, 6).as("sim_dot"),
        round(dotQ / (sqrt(dotSelf) * sqrt(dotQQ)), 6).as("sim_cosine"),
        round(sqrt(sqDiff), 6).as("dist_euclidean"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_vector" -> (fnVector _),
    "fn_time" -> (fnTime _),
    "fn_string" -> (fnString _),
    "fn_math" -> (fnMath _),
    "fn_blob" -> (fnBlob _),
    "fn_uuid" -> (fnUuid _),
    "fn_token" -> (fnToken _),
    "fn_writetime_ttl" -> (fnWritetimeTtl _),
    "fn_array" -> (fnArray _),
    "fn_map" -> (fnMap _),
    "fn_json" -> (fnJson _)
  )

  val oracles: Map[String, String] = Map(
    // The three list_aggregate sums mirror DotProductExpr's semantics
    // bit-for-bit: FLOAT element arithmetic, each product cast to
    // DOUBLE, accumulated left-to-right. (DuckDB's own
    // list_dot_product accumulates in FLOAT and would NOT match.)
    "fn_vector" -> """
      WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
      d AS (
        SELECT vec_id,
          list_aggregate(list_transform(range(1, len(embedding) + 1),
            i -> CAST(embedding[i] * q[i] AS DOUBLE)), 'sum') AS dot_q,
          list_aggregate(list_transform(range(1, len(embedding) + 1),
            i -> CAST(embedding[i] * embedding[i] AS DOUBLE)), 'sum') AS dot_self,
          list_aggregate(list_transform(range(1, len(q) + 1),
            i -> CAST(q[i] * q[i] AS DOUBLE)), 'sum') AS dot_qq,
          list_aggregate(list_transform(range(1, len(embedding) + 1),
            i -> CAST((embedding[i] - q[i]) * (embedding[i] - q[i]) AS DOUBLE)), 'sum') AS sqdiff
        FROM embeddings CROSS JOIN q)
      SELECT vec_id,
        ROUND(dot_q, 6) AS sim_dot,
        ROUND(dot_q / (sqrt(dot_self) * sqrt(dot_qq)), 6) AS sim_cosine,
        ROUND(sqrt(sqdiff), 6) AS dist_euclidean
      FROM d ORDER BY vec_id""",
    "fn_time" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS y,
        CAST(month(o_orderdate) AS INTEGER) AS m,
        CAST(day(o_orderdate) AS INTEGER) AS d,
        CAST(o_orderdate AS DATE) AS as_date,
        date_trunc('month', o_orderdate) AS month_start,
        epoch_ms(o_orderdate) AS epoch_ms,
        last_day(o_orderdate) AS month_end,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
      FROM orders ORDER BY o_orderkey""",
    "fn_string" -> """
      SELECT p_partkey,
        upper(p_name) AS upper_name,
        lower(p_brand) AS lower_brand,
        substring(p_name, 1, 5) AS name5,
        CAST(length(p_name) AS INTEGER) AS name_len,
        concat_ws('-', p_brand, p_type) AS brand_type,
        regexp_extract(p_type, '([A-Z]+)', 1) AS type_word,
        regexp_replace(p_name, 'a', '@', 'g') AS name_subst,
        trim('  ' || p_brand || '  ') AS trimmed
      FROM part ORDER BY p_partkey""",
    "fn_math" -> """
      SELECT p_partkey,
        CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        CAST(abs(p_size - 25) AS INTEGER) AS size_dev,
        ROUND(sqrt(p_size), 6) AS size_sqrt,
        ROUND(ln(p_retailprice), 6) AS price_ln,
        ROUND(log10(p_retailprice), 6) AS price_log10,
        CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT) AS size_sq,
        p_partkey % 7 AS key_mod7
      FROM part ORDER BY p_partkey""",
    "fn_blob" -> """
      SELECT p_partkey,
        hex(encode(p_name)) AS name_hex,
        to_base64(encode(p_name)) AS name_b64,
        md5(p_name) AS name_md5,
        sha256(p_name) AS name_sha256,
        CAST(octet_length(encode(p_name)) AS INTEGER) AS name_bytes
      FROM part ORDER BY p_partkey""",
    "fn_writetime_ttl" -> """
      SELECT event_id,
        epoch_ms(ts) AS writetime_ms,
        ts + INTERVAL 7 DAY AS ttl_expires
      FROM events
      WHERE ts + INTERVAL 7 DAY > TIMESTAMP '2024-01-15 00:00:00'
      ORDER BY event_id""",
    "fn_array" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        string_split(text, ' ')[1] AS first_word,
        string_split(text, ' ')[3] AS third_word,
        array_to_string(list_sort(string_split(text, ' ')[1:4]), ',') AS first4_sorted
      FROM documents ORDER BY doc_id""",
    "fn_map" -> """
      SELECT event_id,
        'type,user' AS m_keys,
        event_type AS m_type,
        CAST(user_id AS VARCHAR) AS m_user,
        2 AS m_size
      FROM events ORDER BY event_id""",
    "fn_json" -> """
      SELECT event_id,
        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_value,
        '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS row_json
      FROM events ORDER BY event_id""",
    // fn_token: the murmur3 kernel stays Guava-anchored (Murmur3Spec);
    // the oracle reads the engine's persisted token relation
    // (Ring.tokenPath) and hash-checks the bucket arithmetic on top
    "fn_token" -> """
      SELECT o_orderkey, token,
        ((token % 32) + 32) % 32 AS bucket
      FROM read_parquet('__TOK_ORDERS_PATH__/*.parquet')
      ORDER BY o_orderkey"""
    // fn_uuid: no oracle (nondeterministic by definition)
  )
}
