"""Scalar function family queries (SURVEY.md §2.9).

One query per function family, each exercising several functions of
that family through the engine's compatibility layer
(functions/scalar.py). Oracle notes:
  - DuckDB lacks sha1/crc32/xxhash64/url_* — those functions run as
    rows-only entries (fn_crypto_engine_specific) or with emulated
    oracles (fn_url).
  - double->int CAST rounds in DuckDB but truncates in ANSI Spark —
    oracles use explicit floor/round, never a bare cast.
  - trig outputs are rounded at 1e-10: JVM StrictMath and C libm may
    legitimately differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_0_235_spark.catalog import load_table
from presto_0_235_spark.functions import scalar as ps
from presto_0_235_spark.queries.registry import register
from presto_0_235_spark.session import ensure_session_defaults


@register(
    "fn_string_basic",
    oracle="""
SELECT p_partkey,
       length(p_name) AS name_len,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       substr(p_name, 1, 5) AS head,
       trim('  ' || p_name || ' ') AS trimmed,
       reverse(p_type) AS rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
       replace(p_name, ' ', '_') AS snake,
       p_brand || '/' || p_type AS joined,
       split_part(p_name, ' ', 2) AS second_word,
       instr(p_name, 'e') AS first_e
FROM part WHERE p_partkey < 500
""",
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions (StringFunctions.java:927 — length,
    substr/trim/upper/lower/replace/reverse/lpad/concat/split_part/
    strpos; all 1-based like Presto)."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.length("p_name").cast("bigint").alias("name_len"),
            F.upper("p_name").alias("up"),
            F.lower("p_brand").alias("lo"),
            F.substring("p_name", 1, 5).alias("head"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
                "trimmed"
            ),
            F.reverse("p_type").alias("rev"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
            F.replace("p_name", F.lit(" "), F.lit("_")).alias("snake"),
            F.concat_ws("/", "p_brand", "p_type").alias("joined"),
            ps.split_part("p_name", " ", 2).alias("second_word"),
            ps.strpos("p_name", "e").cast("bigint").alias("first_e"),
        )
    )


@register(
    "fn_string_distance",
    oracle="""
SELECT p_partkey,
       levenshtein(p_name, 'red widget') AS lev,
       hamming(substr(p_name, 1, 3), 'red') AS ham,
       translate(p_name, 'aeiou', 'AEIOU') AS shouted,
       repeat('*', p_size % 5 + 1) AS stars
FROM part WHERE p_partkey < 300
""",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String distances + translate/repeat (levenshtein_distance,
    hamming_distance in StringFunctions.java; hamming built UDF-free
    from zip_with per scalar.hamming_distance)."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            ps.levenshtein_distance("p_name", F.lit("red widget"))
            .cast("bigint")
            .alias("lev"),
            ps.hamming_distance(
                F.substring("p_name", 1, 3), F.lit("red")
            )
            .cast("bigint")
            .alias("ham"),
            F.translate("p_name", "aeiou", "AEIOU").alias("shouted"),
            F.repeat(F.lit("*"), (F.col("p_size") % 5 + 1).cast("int")).alias(
                "stars"
            ),
        )
    )


@register(
    "fn_regex",
    oracle="""
SELECT doc_id,
       regexp_matches(text, 'table|query') AS mentions_sql,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
       len(regexp_extract_all(text, 'data[a-z]*')) AS n_data_words,
       regexp_replace(text, ' +', '_', 'g') AS underscored
FROM documents WHERE doc_id < 30
""",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (JoniRegexpFunctions.java:319 — regexp_like,
    regexp_extract, regexp_extract_all, regexp_replace). Patterns kept
    in the Joni/RE2/Java-common subset."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select(
            "doc_id",
            F.col("text").rlike("table|query").alias("mentions_sql"),
            F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias(
                "second_word"
            ),
            F.size(F.regexp_extract_all("text", F.lit(r"data[a-z]*"), 0))
            .cast("bigint")
            .alias("n_data_words"),
            F.regexp_replace("text", r" +", "_").alias("underscored"),
        )
    )


@register(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       dayofyear(o_orderdate) AS doy,
       extract(isodow FROM o_orderdate) AS dow_iso,
       week(o_orderdate) AS wk,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS plus_week,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         AS days_since_95
FROM orders WHERE o_orderkey < 2000
""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (DateTimeFunctions.java:1401 — extract
    fields, ISO dow/week, date_trunc, date_add/date_diff with
    unit-first Presto signatures, date_format, to_unixtime)."""
    ensure_session_defaults(spark)
    od = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.year(od).cast("bigint").alias("yr"),
            F.month(od).cast("bigint").alias("mo"),
            F.dayofmonth(od).cast("bigint").alias("dy"),
            F.quarter(od).cast("bigint").alias("qtr"),
            F.dayofyear(od).cast("bigint").alias("doy"),
            ps.day_of_week_iso(od).alias("dow_iso"),
            F.weekofyear(od).cast("bigint").alias("wk"),
            F.last_day(od).alias("month_end"),
            F.date_trunc("month", od).cast("date").alias("month_start"),
            F.date_format(od, "yyyy-MM").alias("ym"),
            F.unix_timestamp(od).alias("epoch_s"),
            ps.date_add_unit("day", 7, od).cast("date").alias("plus_week"),
            ps.date_diff_unit(
                "day", F.lit("1995-01-01").cast("date"), od
            ).alias("days_since_95"),
        )
    )


@register(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(-l_quantity) AS abs_qty,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       round(l_discount * 100, 1) AS disc_pct,
       CAST(sign(l_quantity - 25) AS DOUBLE) AS side,
       mod(l_orderkey, 7) AS m7,
       ROUND(sqrt(l_quantity), 10) AS root,
       ROUND(cbrt(l_quantity), 10) AS cuberoot,
       ROUND(exp(ln(l_quantity)), 9) AS roundtrip,
       ROUND(log10(l_extendedprice), 10) AS lg10,
       ROUND(log2(l_quantity), 10) AS lg2,
       ROUND(power(l_quantity, 1.5), 8) AS pow15,
       ROUND(sin(l_discount), 12) AS sin_d,
       ROUND(atan2(l_discount, l_tax + 0.01), 12) AS angle,
       ROUND(degrees(l_discount), 10) AS deg,
       isnan(l_discount / 1.0) AS never_nan
FROM lineitem WHERE l_orderkey < 300
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (MathFunctions.java:1291 — abs/ceil/floor/round/
    sign/mod/sqrt/cbrt/exp/ln/log/power/trig/degrees/is_nan)."""
    ensure_session_defaults(spark)
    q = F.col("l_quantity")
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(-q).alias("abs_qty"),
            F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
            F.round(F.col("l_discount") * 100, 1).alias("disc_pct"),
            F.signum(q - 25).alias("side"),
            (F.col("l_orderkey") % 7).alias("m7"),
            F.round(F.sqrt(q), 10).alias("root"),
            F.round(F.cbrt(q), 10).alias("cuberoot"),
            F.round(F.exp(F.log(q)), 9).alias("roundtrip"),
            F.round(F.log10("l_extendedprice"), 10).alias("lg10"),
            F.round(F.log2(q), 10).alias("lg2"),
            F.round(F.pow(q, 1.5), 8).alias("pow15"),
            F.round(F.sin("l_discount"), 12).alias("sin_d"),
            F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01), 12)
            .alias("angle"),
            F.round(F.degrees("l_discount"), 10).alias("deg"),
            F.isnan(F.col("l_discount") / 1.0).alias("never_nan"),
        )
    )


@register(
    "fn_bitwise_base",
    oracle="""
SELECT n_nationkey,
       n_nationkey & 12 AS band,
       n_nationkey | 3 AS bor,
       xor(n_nationkey, 21) AS bxor,
       n_nationkey << 2 AS shl,
       n_nationkey >> 1 AS shr,
       lower(to_base(n_nationkey + 240, 16)) AS hex_repr,
       CAST(concat('0x', to_base(n_nationkey + 240, 16)) AS BIGINT)
         AS from_hex_roundtrip
FROM nation
""",
)
def fn_bitwise_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops (BitwiseFunctions.java:136) + from_base/to_base
    radix conversion (MathFunctions.java)."""
    ensure_session_defaults(spark)
    k = F.col("n_nationkey")
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("band"),
        k.bitwiseOR(F.lit(3)).alias("bor"),
        k.bitwiseXOR(F.lit(21)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
        ps.to_base(k + 240, 16).alias("hex_repr"),
        ps.from_base(ps.to_base(k + 240, 16), 16).alias(
            "from_hex_roundtrip"
        ),
    )


@register(
    "fn_array",
    oracle="""
SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_words,
       array_to_string(list_sort(string_split(p_name, ' ')), ',')
         AS words_sorted,
       list_contains(string_split(p_name, ' '), 'red') AS has_red,
       COALESCE(list_position(string_split(p_name, ' '), 'red'), 0)
         AS red_pos,
       string_split(p_name, ' ')[2] AS word2,
       string_split(p_name, ' ')[9] AS word9_null,
       array_to_string(string_split(p_name, ' ')[1:2], '-') AS first_two,
       list_reduce(generate_series(1, p_size % 10 + 1), (a, b) -> a + b)
         AS seq_sum,
       array_to_string(list_transform(string_split(p_name, ' '),
                                      w -> upper(w)), ',') AS up_words,
       COALESCE(array_to_string(list_filter(string_split(p_name, ' '),
                                            w -> length(w) > 4), ','), '')
         AS long_words
FROM part WHERE p_partkey < 400
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (40+ files in MAIN/operator/scalar/ — transform,
    filter, reduce/aggregate, sort, contains, position, slice,
    element_at, sequence; Presto subscripts are 1-based and
    element_at returns NULL out-of-bounds, matching Spark
    element_at/try_element_at)."""
    ensure_session_defaults(spark)
    words = F.split(F.col("p_name"), " ")
    seq = F.sequence(F.lit(1), F.col("p_size") % 10 + 1)
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.size(words).cast("bigint").alias("n_words"),
            F.array_join(F.array_sort(words), ",").alias("words_sorted"),
            F.array_contains(words, "red").alias("has_red"),
            F.array_position(words, "red").alias("red_pos"),
            F.element_at(words, 2).alias("word2"),
            ps.element_at_1based(words, 9).alias("word9_null"),
            F.array_join(F.slice(words, 1, 2), "-").alias("first_two"),
            F.aggregate(seq, F.lit(0), lambda a, b: a + b)
            .cast("bigint")
            .alias("seq_sum"),
            F.array_join(
                F.transform(words, lambda w: F.upper(w)), ","
            ).alias("up_words"),
            F.array_join(
                F.filter(words, lambda w: F.length(w) > 4), ","
            ).alias("long_words"),
        )
    )


@register(
    "fn_array_advanced",
    oracle="""
WITH t AS (
  SELECT p_partkey,
         string_split(p_name, ' ') AS words,
         string_split(p_type, '') AS chars
  FROM part WHERE p_partkey < 300
)
SELECT p_partkey,
       array_to_string(flatten([words, chars]), '|') AS flat,
       array_to_string(list_transform(generate_series(1, least(len(words), len(chars))),
                       i -> words[i] || '#' || chars[i]), ',') AS zipped,
       len(list_intersect(words, chars)) > 0 AS overlaps,
       CAST(len(list_distinct(list_concat(words, chars))) AS BIGINT) AS union_n,
       CAST(len(list_filter(words, w -> NOT list_contains(chars, w)))
            AS BIGINT) AS except_n,
       array_to_string(list_transform(generate_series(1, greatest(len(words) - 1, 1)),
                       i -> array_to_string(words[i:i+1], ' ')), '/') AS bigrams,
       words[-1] AS last_word,
       array_to_string(list_reverse_sort(words), ',') AS rev_sorted
FROM t
""",
)
def fn_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advanced array functions (ArrayFlattenFunction, ZipWithFunction,
    ArraysOverlapFunction, ArrayUnionFunction, ArrayExceptFunction,
    ArrayNgramsFunction, ArraySortComparatorFunction — SURVEY.md §2.9
    array row): flatten, zip_with, arrays_overlap, union/except
    counts, word bigrams (ngrams), negative indexing, descending
    sort."""
    ensure_session_defaults(spark)
    words = F.split(F.col("p_name"), " ")
    chars = F.split(F.col("p_type"), "")
    n = F.least(F.size(words), F.size(chars))
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.array_join(F.flatten(F.array(words, chars)), "|").alias("flat"),
            F.array_join(
                F.zip_with(
                    F.slice(words, 1, n),
                    F.slice(chars, 1, n),
                    lambda w, c: F.concat(w, F.lit("#"), c),
                ),
                ",",
            ).alias("zipped"),
            F.arrays_overlap(words, chars).alias("overlaps"),
            F.size(F.array_union(words, chars)).cast("bigint").alias("union_n"),
            F.size(F.array_except(words, chars)).cast("bigint").alias("except_n"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(words) - 1, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
                ),
                "/",
            ).alias("bigrams"),
            F.element_at(words, -1).alias("last_word"),
            F.array_join(F.reverse(F.array_sort(words)), ",").alias("rev_sorted"),
        )
    )


@register(
    "fn_map_advanced",
    oracle="""
SELECT o_orderkey,
       'count:' || CAST(cnt AS VARCHAR) || ';total:'
         || CAST(CAST(total AS BIGINT) AS VARCHAR) AS merged_repr,
       cnt * 2 AS zipped_count
FROM (
  SELECT o_orderkey, 1 AS cnt, floor(o_totalprice) AS total
  FROM orders WHERE o_orderkey < 1000
)
""",
)
def fn_map_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_entries / map_zip_with / map_entries round-trip
    (MapFromEntriesFunction, MapZipWithFunction — SURVEY.md §2.9 map
    row). The engine really builds maps and zips them; the oracle
    states the expected flattened representation (DuckDB's map
    surface is too thin to mirror the lambda ops)."""
    ensure_session_defaults(spark)
    m1 = F.map_from_entries(
        F.array(
            F.struct(F.lit("count").alias("key"), F.lit(1).cast("long").alias("value")),
            F.struct(
                F.lit("total").alias("key"),
                F.floor(F.col("o_totalprice")).cast("long").alias("value"),
            ),
        )
    )
    doubled = F.map_zip_with(m1, m1, lambda k, v1, v2: v1 + v2)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.array_join(
                F.sort_array(
                    F.transform(
                        F.map_entries(m1),
                        lambda e: F.concat_ws(":", e["key"], e["value"]),
                    )
                ),
                ";",
            ).alias("merged_repr"),
            F.element_at(doubled, F.lit("count")).alias("zipped_count"),
        )
    )


@register(
    "fn_map",
    oracle="""
SELECT p_partkey,
       3 AS n_entries,
       'brand:' || p_brand || ',size:' || CAST(p_size AS VARCHAR)
         || ',type:' || p_type AS entries,
       p_brand AS brand_lookup,
       'BRAND:' || upper(p_brand) AS upper_brand_entry
FROM part WHERE p_partkey < 300
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (MapConstructor, MapConcatFunction,
    MapTransformValueFunction, MapKeys/MapValues, MapElementAt...).
    The engine side really builds/concats/transforms maps; the oracle
    states the expected entry strings directly (DuckDB's map surface
    is too thin to mirror the operations)."""
    ensure_session_defaults(spark)
    base = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    merged = F.map_concat(
        base, F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    )
    upper_map = F.transform_values(
        F.map_filter(merged, lambda k, v: k == "brand"),
        lambda k, v: F.upper(v),
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.size(merged).alias("n_entries"),
            F.array_join(
                F.sort_array(
                    F.transform(
                        F.map_entries(merged),
                        lambda e: F.concat_ws(":", e["key"], e["value"]),
                    )
                ),
                ",",
            ).alias("entries"),
            F.element_at(merged, F.lit("brand")).alias("brand_lookup"),
            F.array_join(
                F.transform(
                    F.map_entries(upper_map),
                    lambda e: F.concat_ws(
                        ":", F.upper(e["key"]), e["value"]
                    ),
                ),
                ",",
            ).alias("upper_brand_entry"),
        )
    )


@register(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       json_extract_string(props, '$.missing') AS absent,
       json_array_length('[1,2,3]') AS arr_len,
       NOT (trim(props) LIKE '{%' OR trim(props) LIKE '[%')
         AS props_is_scalar
FROM events WHERE event_id < 100
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (JsonFunctions.java:502 — json_extract_scalar,
    json_array_length, is_json_scalar; Spark get_json_object /
    json_array_length)."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 100)
        .select(
            "event_id",
            ps.json_extract_scalar("props", "$.k").cast("int").alias("k_val"),
            ps.json_extract_scalar("props", "$.missing").alias("absent"),
            ps.json_array_length_(F.lit("[1,2,3]")).cast("int").alias(
                "arr_len"
            ),
            ps.is_json_scalar("props").alias("props_is_scalar"),
        )
    )


@register(
    "fn_url",
    oracle="""
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1) AS host,
       CAST(NULLIF(regexp_extract(url, '^[a-z]+://[^/?#:]+:(\\d+)', 1), '')
            AS BIGINT) AS port,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '#(.*)$', 1) AS fragment,
       CAST(doc_id AS VARCHAR) AS id_param,
       replace(lang || ' ' || source, ' ', '+') AS encoded
FROM (
  SELECT doc_id, lang, source,
         'https://example.com'
           || CASE WHEN doc_id % 2 = 0 THEN ':8443' ELSE '' END
           || '/' || lang || '/docs?id=' || CAST(doc_id AS VARCHAR)
           || '#sec' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id < 50
)
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (UrlFunctions.java:45-193 — url_extract_protocol/
    host/port/path/query/fragment/parameter, url_encode). Even
    doc_ids carry an explicit :8443 port (odd ones exercise the NULL
    port path); every URL has a fragment. DuckDB has no URL
    functions; the oracle emulates with regexes over the same
    constructed URLs."""
    ensure_session_defaults(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .withColumn(
            "url",
            F.concat(
                F.lit("https://example.com"),
                F.when(F.col("doc_id") % 2 == 0, F.lit(":8443")).otherwise(
                    F.lit("")
                ),
                F.lit("/"),
                F.col("lang"),
                F.lit("/docs?id="),
                F.col("doc_id").cast("string"),
                F.lit("#sec"),
                F.col("doc_id").cast("string"),
            ),
        )
    )
    return docs.select(
        "doc_id",
        ps.url_extract_protocol("url").alias("protocol"),
        ps.url_extract_host("url").alias("host"),
        ps.url_extract_port("url").alias("port"),
        ps.url_extract_path("url").alias("path"),
        ps.url_extract_query("url").alias("query"),
        ps.url_extract_fragment("url").alias("fragment"),
        ps.url_extract_parameter("url", "id").alias("id_param"),
        F.url_encode(F.concat_ws(" ", "lang", "source")).alias("encoded"),
    )


@register(
    "fn_crypto",
    oracle="""
SELECT doc_id,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       to_base64(CAST(lang AS BLOB)) AS lang_b64,
       lower(hex(CAST(source AS BLOB))) AS source_hex
FROM documents WHERE doc_id < 50
""",
)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/crypto family (VarbinaryFunctions.java:479 — md5, sha2,
    base64, hex; sha1/crc32/xxhash64 live in
    fn_crypto_engine_specific since DuckDB lacks them)."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.md5("text").alias("md5_hex"),
            F.sha2("text", 256).alias("sha256_hex"),
            F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
            F.lower(F.hex(F.col("source").cast("binary"))).alias(
                "source_hex"
            ),
        )
    )


@register("fn_crypto_engine_specific", oracle=None)
def fn_crypto_engine_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha1 / crc32 / xxhash64 / hmac_sha256 — standard digests DuckDB
    cannot cross-check; values are still deterministic (hmac via
    pandas UDF, functions/udfs.py)."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions.udfs import hmac_sha256

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.sha1("text").alias("sha1_hex"),
            F.crc32(F.col("text").cast("binary")).alias("crc"),
            F.xxhash64("text").alias("xx64"),
            hmac_sha256(F.col("text"), F.lit("secret-key")).alias("mac"),
        )
    )


@register(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_custkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_custkey % 3) END AS safe_div,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       greatest(o_totalprice, 250000.0) AS hi,
       least(o_totalprice, 250000.0) AS lo,
       COALESCE(TRY_CAST(o_orderpriority AS INT), -1) AS nvl_demo,
       CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'done' END AS iff
FROM orders WHERE o_orderkey < 2000
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY / try_cast / greatest / least / nvl / if
    (TryFunction.java, TryCastFunction.java, Greatest.java, Nvl.java).
    ANSI mode makes division-by-zero raise exactly like Presto;
    try_divide is the TRY() wrapper."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            ps.try_divide(
                F.col("o_totalprice"), F.col("o_custkey") % 3
            ).alias("safe_div"),
            ps.try_cast("o_orderpriority", "int").alias("bad_cast"),
            F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("hi"),
            F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("lo"),
            F.nvl(ps.try_cast("o_orderpriority", "int"), F.lit(-1)).alias(
                "nvl_demo"
            ),
            F.when(F.col("o_orderstatus") == "O", "open")
            .otherwise("done")
            .alias("iff"),
        )
    )


@register(
    "fn_datetime_formats",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
       strftime(o_orderdate, '%d/%m/%Y') AS eu_day,
       strftime(o_orderdate, '%b %Y') AS mon_year,
       strftime(o_orderdate, '%j') AS doy_padded,
       strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS reparsed
FROM orders WHERE o_orderkey < 1000
""",
)
def fn_datetime_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format/date_parse with MySQL %-patterns (reference
    DateTimeFunctions.java date_format/date_parse use MySQL
    specifiers). The engine translates %-patterns to JVM patterns
    (scalar.mysql_to_java_pattern — the SURVEY §7 Phase 3 'hard
    list' item); DuckDB's strftime/strptime speak the MySQL-style
    patterns natively, so the oracle uses the original strings."""
    ensure_session_defaults(spark)
    od = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            ps.date_format_mysql(od, "%Y-%m-%d").alias("iso_day"),
            ps.date_format_mysql(od, "%d/%m/%Y").alias("eu_day"),
            ps.date_format_mysql(od, "%b %Y").alias("mon_year"),
            ps.date_format_mysql(od, "%j").alias("doy_padded"),
            ps.date_parse(
                ps.date_format_mysql(od, "%Y-%m-%d"), "%Y-%m-%d"
            ).alias("reparsed"),
        )
    )


@register(
    "fn_misc",
    oracle="""
SELECT p_partkey,
       CASE WHEN p_retailprice < 900.005 THEN 0
            WHEN p_retailprice >= 1100.005 THEN 9
            ELSE CAST(floor((p_retailprice - 900.005)
                            / (1100.005 - 900.005) * 8) AS BIGINT) + 1
       END AS price_bucket,
       map_extract(map(['brand','type'], [p_brand, p_type]),
                   'brand')[1] AS kv_brand,
       greatest(p_size, 25) AS hi_size,
       least(p_size, 25) AS lo_size,
       CAST(p_size AS VARCHAR) || ':' || p_brand AS sized_brand
FROM part WHERE p_partkey < 400
""",
)
def fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket (MathFunctions.java), split_to_map-style kv maps
    (SplitToMapFunction.java), greatest/least (Greatest.java). The
    engine builds a real map from kv text; DuckDB mirrors with
    map()/map_extract."""
    ensure_session_defaults(spark)
    kv = F.str_to_map(
        F.concat_ws(
            ",",
            F.concat(F.lit("brand:"), F.col("p_brand")),
            F.concat(F.lit("type:"), F.col("p_type")),
        ),
        F.lit(","),
        F.lit(":"),
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.width_bucket("p_retailprice", F.lit(900.005), F.lit(1100.005), F.lit(8))
            .alias("price_bucket"),
            F.element_at(kv, F.lit("brand")).alias("kv_brand"),
            F.greatest(F.col("p_size"), F.lit(25)).alias("hi_size"),
            F.least(F.col("p_size"), F.lit(25)).alias("lo_size"),
            F.concat(F.col("p_size").cast("string"), F.lit(":"), "p_brand")
            .alias("sized_brand"),
        )
    )


@register("fn_python_udfs", oracle=None)
def fn_python_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word_stem + inverse_normal_cdf — the two §2.9 functions with no
    Spark expression form, as Arrow-batched pandas UDFs
    (functions/udfs.py). Deterministic, rows-only check."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions.udfs import (
        inverse_normal_cdf,
        normalize_nfc,
        word_stem,
    )

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            word_stem(ps.split_part("text", " ", 1)).alias("stem1"),
            inverse_normal_cdf(
                F.lit(0.0), F.lit(1.0), (F.col("doc_id") + 1) / 25.0
            ).alias("z_score"),
            normalize_nfc(F.col("lang")).alias("lang_nfc"),
        )
    )


@register(
    "fn_cdf_closed_form",
    oracle="""
SELECT p_partkey,
       round(0.5 + atan((p_size - 10.0) / 4.0) / pi(), 10) AS cauchy_c,
       round(10.0 + 4.0 * tan(pi() * ((p_size / 51.0) - 0.5)), 10)
         AS cauchy_q,
       round(1 - exp(-((p_size / 20.0) ^ 1.5)), 10) AS weibull_c,
       round(20.0 * ((-ln(1 - p_size / 51.0)) ^ (1.0 / 1.5)), 10)
         AS weibull_q,
       round(((p_size / 50.0) + 1.9208 / 50.0
              - 1.96 * sqrt((p_size / 50.0) * (1 - p_size / 50.0) / 50.0
                            + 0.9604 / 2500.0))
             / (1 + 3.8416 / 50.0), 10) AS wilson_lo,
       round(((p_size / 50.0) + 1.9208 / 50.0
              + 1.96 * sqrt((p_size / 50.0) * (1 - p_size / 50.0) / 50.0
                            + 0.9604 / 2500.0))
             / (1 + 3.8416 / 50.0), 10) AS wilson_hi
FROM part WHERE p_partkey < 200
""",
)
def fn_cdf_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form distribution functions as pure Column expressions
    — JVM-side, whole-stage codegen, no Python. wilson_interval_
    lower/upper are reference-parity (WilsonInterval.java); cauchy/
    weibull CDFs + inverses are FORWARD-PORT extensions (later-Presto
    functions, not in the 0.235 reference — tracked in COVERAGE.md).
    The oracle restates the closed forms; round(10) absorbs the
    last-ulp libm differences.
    z = 1.96: z^2 = 3.8416, z^2/2 = 1.9208, z^4/4 = 0.9604."""
    ensure_session_defaults(spark)
    size = F.col("p_size").cast("double")
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.round(ps.cauchy_cdf(F.lit(10.0), F.lit(4.0), size), 10)
            .alias("cauchy_c"),
            F.round(
                ps.inverse_cauchy_cdf(F.lit(10.0), F.lit(4.0), size / 51.0), 10
            ).alias("cauchy_q"),
            F.round(ps.weibull_cdf(F.lit(1.5), F.lit(20.0), size), 10)
            .alias("weibull_c"),
            F.round(
                ps.inverse_weibull_cdf(F.lit(1.5), F.lit(20.0), size / 51.0),
                10,
            ).alias("weibull_q"),
            F.round(
                ps.wilson_interval_lower(size, F.lit(50.0), F.lit(1.96)), 10
            ).alias("wilson_lo"),
            F.round(
                ps.wilson_interval_upper(size, F.lit(50.0), F.lit(1.96)), 10
            ).alias("wilson_hi"),
        )
    )


@register("fn_cdf_gamma_family", oracle=None)
def fn_cdf_gamma_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma/beta-backed distribution CDFs + inverses as Arrow pandas
    UDFs over public-domain incomplete-gamma/beta algorithms.
    beta_cdf/inverse_beta_cdf are reference-parity
    (MathFunctions.java:651,636); binomial/chi²/poisson + inverses
    are FORWARD-PORT extensions (later-Presto functions, not in the
    0.235 reference — tracked in COVERAGE.md). No DuckDB equivalent
    exists, so the driver gate is rows-only; the real checks are
    tests/test_semantics.py's monotonicity + inverse roundtrip
    properties."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions.udfs import (
        beta_cdf,
        binomial_cdf,
        chi_squared_cdf,
        inverse_beta_cdf,
        inverse_chi_squared_cdf,
        inverse_poisson_cdf,
        poisson_cdf,
    )

    size = F.col("p_size").cast("double")
    p = size / 51.0
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.round(beta_cdf(F.lit(2.0), F.lit(5.0), p), 8).alias("beta_c"),
            F.round(inverse_beta_cdf(F.lit(2.0), F.lit(5.0), p), 8)
            .alias("beta_q"),
            F.round(
                binomial_cdf(F.lit(40), F.lit(0.3), F.col("p_size")), 8
            ).alias("binom_c"),
            F.round(chi_squared_cdf(F.lit(7.0), size), 8).alias("chi2_c"),
            F.round(inverse_chi_squared_cdf(F.lit(7.0), p), 8)
            .alias("chi2_q"),
            F.round(poisson_cdf(F.lit(12.0), F.col("p_size")), 8)
            .alias("pois_c"),
            inverse_poisson_cdf(F.lit(12.0), p).alias("pois_q"),
        )
    )


@register(
    "fn_scalar_helpers",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(trunc(l_extendedprice / 7) AS BIGINT) AS truncated,
       chr(65 + (l_linenumber % 26)) AS letter,
       ascii(chr(65 + (l_linenumber % 26))) AS code_roundtrip,
       round(list_cosine_similarity(
         [l_quantity, l_discount * 100, l_tax * 100],
         [1.0, 2.0, 3.0]), 6) AS cos_sim,
       CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
       l_shipdate AS ship_roundtrip
FROM lineitem WHERE l_orderkey < 200
""",
)
def fn_scalar_helpers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining compat-layer scalars: truncate (toward zero),
    chr/codepoint roundtrip, cosine_similarity on numeric vectors
    (MathFunctions.java cosineSimilarity), to_unixtime/from_unixtime
    roundtrip — every helper in functions/scalar.py is exercised by
    some oracle-checked query."""
    ensure_session_defaults(spark)
    vec_a = F.array(
        F.col("l_quantity"),
        F.col("l_discount") * 100,
        F.col("l_tax") * 100,
    )
    vec_b = F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0))
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            ps.truncate(F.col("l_extendedprice") / 7)
            .cast("bigint")
            .alias("truncated"),
            ps.chr_(65 + (F.col("l_linenumber") % 26)).alias("letter"),
            ps.codepoint(ps.chr_(65 + (F.col("l_linenumber") % 26)))
            .cast("int")
            .alias("code_roundtrip"),
            F.round(ps.cosine_similarity_arrays(vec_a, vec_b), 6).alias(
                "cos_sim"
            ),
            ps.to_unixtime("l_shipdate").cast("bigint").alias("ship_epoch"),
            ps.from_unixtime_(ps.to_unixtime("l_shipdate").cast("bigint"))
            .alias("ship_roundtrip"),
        )
    )


@register(
    "fn_decimal_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            + CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS dec_add,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS dec_mul,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            - CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS dec_sub,
       CAST(round(CAST(l_tax AS DECIMAL(18,4)), 2) AS DECIMAL(18,4)) AS dec_round
FROM lineitem WHERE l_orderkey < 300
""",
)
def fn_decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic (§1.2: decimal(p,s) backed by
    long/int128 in the reference, ShortDecimalType /
    UnscaledDecimal128Arithmetic). Engines widen intermediate
    precision by slightly different rules (SURVEY §7 Phase 3 gotcha),
    so every operation carries an explicit result cast — the
    documented portable-decimal convention. Division is deliberately
    absent: price/qty quotients land exactly on the half grid at the
    result scale, where the JVM (HALF_UP via shortest-repr string)
    and C engines (round from binary) legitimately disagree — the
    engine's rule is divide in double or use exact unscaled-integer
    division (compat.py discussion)."""
    ensure_session_defaults(spark)
    d = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    out = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            out(d("l_extendedprice") + d("l_quantity")).alias("dec_add"),
            out(d("l_extendedprice") * d("l_discount")).alias("dec_mul"),
            out(d("l_extendedprice") - d("l_quantity")).alias("dec_sub"),
            out(F.round(d("l_tax"), 2)).alias("dec_round"),
        )
    )


@register(
    "fn_interval_arith",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(o_orderdate - INTERVAL 1 YEAR AS DATE) AS minus_1y,
       CAST(o_orderdate AS DATE) + 90 AS plus_90d,
       date_diff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         AS months_since_95,
       CAST((o_orderkey % 24) * 3600000 + (o_orderkey % 60) * 60000
            AS BIGINT) AS ivl_millis
FROM orders WHERE o_orderkey < 1000
""",
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic (year-month + day-time intervals, §1.2
    temporal types; reference DateTimeFunctions date_add family):
    add_months / interval subtraction / day offsets / whole-month
    difference. Month-end clamping (add_months) agrees between
    engines. (Oracle note: DuckDB interval equality treats 90 days ==
    3 months, so `+ INTERVAL 90 DAY` next to `+ INTERVAL 3 MONTH`
    gets CSE-folded into one expression — the oracle adds integer
    days to a DATE instead.)"""
    ensure_session_defaults(spark)
    od = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.add_months(od, 3).alias("plus_3m"),
            F.add_months(od, -12).alias("minus_1y"),
            F.date_add(od.cast("date"), 90).alias("plus_90d"),
            (
                (F.year(od) - F.lit(1995)) * 12 + F.month(od) - F.lit(1)
            ).cast("bigint").alias("months_since_95"),
            # to_milliseconds(interval day-second)
            # (DateTimeFunctions.java toMilliseconds): a genuine
            # DayTimeIntervalType; casting a DAY-TO-SECOND interval
            # to long yields whole seconds (Spark's end-field rule),
            # so ms = seconds * 1000.
            (
                F.expr(
                    "make_dt_interval(0, CAST(o_orderkey % 24 AS INT),"
                    " CAST(o_orderkey % 60 AS INT), 0)"
                ).cast("long")
                * 1000
            ).cast("bigint").alias("ivl_millis"),
        )
    )


@register(
    "fn_datetime_joda",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
       strftime(o_orderdate, '%Y-%m-%d') AS era_day,
       strftime(o_orderdate, '%a %d %b %Y') AS pretty,
       CAST(o_orderdate AS TIMESTAMP) AS roundtrip
FROM orders WHERE o_orderkey < 1000
""",
)
def fn_datetime_joda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_datetime / parse_datetime — Presto's JODA-pattern pair
    (DateTimeFunctions.java, Joda DateTimeFormat), translated to
    java.time patterns (functions/scalar.joda_to_java_pattern). The
    era_day column uses Joda 'Y' (year-of-era): untranslated,
    java.time would read it as WEEK-year and diverge for end-of-
    December dates — the oracle proves the translation, not just the
    happy path. roundtrip = parse(format(ts)) must be the identity."""
    ensure_session_defaults(spark)
    od = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            ps.format_datetime(od, "yyyy-MM-dd").alias("iso_day"),
            ps.format_datetime(od, "Y-MM-dd").alias("era_day"),
            ps.format_datetime(od, "EEE dd MMM yyyy").alias("pretty"),
            ps.parse_datetime(
                ps.format_datetime(od, "yyyy-MM-dd HH:mm:ss"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("roundtrip"),
        )
    )


@register(
    "fn_timezone",
    oracle="""
SELECT o_orderkey,
       timezone('America/Los_Angeles', timezone('UTC', o_orderdate))
         AS la_wall,
       timezone('UTC', timezone('America/Los_Angeles', o_orderdate))
         AS utc_from_la,
       timezone('Europe/Paris', timezone('Asia/Tokyo', o_orderdate))
         AS paris_from_tokyo,
       timezone('America/New_York',
                to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)))
         AS ny_from_epoch,
       timezone('America/Los_Angeles',
                timezone('UTC', TIMESTAMP '2024-03-10 10:30:00'))
         AS dst_spring,
       timezone('America/Los_Angeles',
                timezone('UTC', TIMESTAMP '2024-11-03 09:30:00'))
         AS dst_fall
FROM orders WHERE o_orderkey < 1000
""",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AT TIME ZONE family (DateTimeFunctions.java at_timezone /
    tz-aware from_unixtime; TimestampWithTimeZoneType.java,
    DateTimeEncoding.java pack (instant, zone) into one value — the
    Spark-first representation is a naive-UTC instant plus explicit
    conversion at the edges): at_timezone, with_timezone (inverse),
    two-zone conversion, epoch->zone, and both DST boundaries
    (2024-03-10 spring-forward: 10:30 UTC -> 03:30 PDT;
    2024-11-03 fall-back: 09:30 UTC -> 01:30 PST). DuckDB replays via
    ICU timezone(); both engines read the same IANA tzdb."""
    ensure_session_defaults(spark)
    od = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            ps.at_timezone(od, "America/Los_Angeles").alias("la_wall"),
            ps.with_timezone(od, "America/Los_Angeles").alias("utc_from_la"),
            ps.convert_timezone_("Asia/Tokyo", "Europe/Paris", od).alias(
                "paris_from_tokyo"
            ),
            ps.from_unixtime_tz(
                F.unix_timestamp(od), "America/New_York"
            ).alias("ny_from_epoch"),
            ps.at_timezone(
                F.lit("2024-03-10 10:30:00").cast("timestamp"),
                "America/Los_Angeles",
            ).alias("dst_spring"),
            ps.at_timezone(
                F.lit("2024-11-03 09:30:00").cast("timestamp"),
                "America/Los_Angeles",
            ).alias("dst_fall"),
        )
    )


@register(
    "fn_decimal38",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))
         AS wide_mul,
       CAST(CAST(l_extendedprice AS DECIMAL(24,4))
            * CAST(1000000000000 AS DECIMAL(13,0)) AS DECIMAL(38,4))
         AS huge_mul,
       CAST(CAST(l_extendedprice AS DECIMAL(30,4))
            / CAST(1000 AS DECIMAL(4,0)) AS DECIMAL(38,7))
         AS exact_div
FROM lineitem WHERE l_orderkey < 300
""",
)
def fn_decimal38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-decimal (128-bit) arithmetic at precision >18
    (SPI/type/LongDecimalType.java, UnscaledDecimal128Arithmetic.java:
    the reference switches from long to int128 backing above
    precision 18). Shapes chosen to be EXACT on both engines so the
    value-hash is meaningful:
      - wide_mul: (18,4)x(19,4) -> precision 38 scale 8, no loss on
        either engine (Spark p1+p2+1 = 38 exactly; DuckDB int128);
      - huge_mul: x * 10^12 pushes unscaled values past 2^63, forcing
        the int128 path while staying exact;
      - exact_div: /1000 terminates at scale 7 -> no rounding-rule
        divergence (general decimal division rounds HALF_UP in the
        JVM vs from-binary in C engines — documented in
        fn_decimal_arithmetic; exact quotients sidestep it)."""
    ensure_session_defaults(spark)
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("l_extendedprice").cast("decimal(18,4)")
                * F.col("l_quantity").cast("decimal(19,4)")
            ).cast("decimal(38,8)").alias("wide_mul"),
            (
                F.col("l_extendedprice").cast("decimal(24,4)")
                * F.lit(1000000000000).cast("decimal(13,0)")
            ).cast("decimal(38,4)").alias("huge_mul"),
            (
                F.col("l_extendedprice").cast("decimal(30,4)")
                / F.lit(1000).cast("decimal(4,0)")
            ).cast("decimal(38,7)").alias("exact_div"),
        )
    )


@register(
    "fn_row_type",
    oracle="""
SELECT o_orderkey,
       struct_pack(k := o_orderkey, v := o_totalprice).v AS pair_v,
       (list_sort([struct_pack(k := o_orderkey, v := o_totalprice),
                   struct_pack(k := o_orderkey % 7,
                               v := o_totalprice / 2)]))[1].k AS min_k,
       struct_pack(outer_f := struct_pack(k := o_orderkey + 1)).outer_f.k
         AS nested_k
FROM orders WHERE o_orderkey < 500
""",
)
def fn_row_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW type surface (SPI/type/RowType.java; §1.2 structural
    types): row construction, field dereference, rows nested in rows,
    and ordering of row values inside arrays (RowComparisonOperators
    — lexicographic by field), mapped onto Spark structs. DuckDB
    structs replay all of it for the oracle."""
    ensure_session_defaults(spark)
    k, v = F.col("o_orderkey"), F.col("o_totalprice")
    pair = F.struct(k.alias("k"), v.alias("v"))
    alt = F.struct((k % 7).alias("k"), (v / 2).alias("v"))
    nested = F.struct(
        F.struct((k + 1).alias("k")).alias("outer_f")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            pair.getField("v").alias("pair_v"),
            F.element_at(F.sort_array(F.array(pair, alt)), 1)
            .getField("k")
            .alias("min_k"),
            nested.getField("outer_f").getField("k").alias("nested_k"),
        )
    )


def _color_exprs(d):
    """Shared spec for fn_color_bar: (name, SQL text) pairs emitted
    per dialect from functions/color.py generators."""
    from presto_0_235_spark.functions import color as cf

    name = (
        f"element_at(array({', '.join(repr(n) for n in cf.SYSTEM_COLORS)}), "
        f"CAST(o_orderkey % 8 AS INT) + 1)"
    )
    if d is cf.DUCK:
        name = (
            f"list_extract([{', '.join(repr(n) for n in cf.SYSTEM_COLORS)}], "
            f"CAST(o_orderkey % 8 AS INT) + 1)"
        )
    hex3 = "concat('#', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 3))"
    if d is cf.SPARK:
        hex3 = "concat('#', substr(md5(CAST(o_orderkey AS STRING)), 1, 3))"
    pct = "((o_orderkey % 11) / 10.0)"
    return [
        ("packed_rgb", cf.sql_rgb(
            "o_orderkey % 256", "(o_orderkey * 7) % 256",
            "(o_orderkey * 13) % 256")),
        ("named_color", cf.sql_color_named(name)),
        ("hex_color", cf.sql_color_hex(hex3, d)),
        ("rendered", cf.sql_render(
            "o_orderkey", cf.rgb_int(0, 0, 255), d)),
        ("bar_gradient", cf.sql_bar(pct, 10, d)),
        ("bar_flat", cf.sql_bar(
            pct, 8, d, cf.rgb_int(0, 0, 255), cf.rgb_int(0, 0, 255))),
    ]


def _color_oracle() -> str:
    from presto_0_235_spark.functions import color as cf

    cols = ",\n       ".join(
        f"{sql} AS {name}" for name, sql in _color_exprs(cf.DUCK)
    )
    return (
        f"SELECT o_orderkey,\n       {cols}\n"
        f"FROM orders WHERE o_orderkey < 300"
    )


@register("fn_color_bar", oracle=_color_oracle())
def fn_color_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Color function family (reference MAIN/operator/scalar/
    ColorFunctions.java — Presto's CLI visualization surface):
    rgb() 24-bit packing, color('#rgb') CSS-short-hex parsing,
    color('<name>') system-color codes, render(value, color) ANSI
    256-color wrapping, and bar(percent, width [, low, high]) —
    U+2588 cells colored by HSV interpolation (java.awt.Color
    HSB round-trip re-expressed in IEEE doubles), reset, space-padded
    to exact width. One spec generates both engines' SQL
    (functions/color.py); the oracle checks the exact escape-coded
    strings including every per-cell ANSI index of the red->green
    gradient.

    Scale: pure per-row string/arithmetic expressions — zero
    shuffles; the width-bounded transform stays inside codegen."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import color as cf

    df = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return df.select(
        "o_orderkey",
        *[F.expr(sql).alias(name) for name, sql in _color_exprs(cf.SPARK)],
    )


@register(
    "fn_binary_codecs",
    oracle="""
SELECT o_orderkey,
       upper(lpad(to_hex((o_orderkey - 200) & 4294967295), 8, '0'))
         AS be32_hex,
       CAST(o_orderkey - 200 AS INTEGER) AS be32_roundtrip,
       o_orderkey * -1103515245 AS be64_roundtrip,
       o_totalprice AS ieee64_roundtrip,
       CAST(o_totalprice AS REAL) AS ieee32_roundtrip
FROM orders WHERE o_orderkey < 400
""",
)
def fn_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec tail (VarbinaryFunctions.java:199-243):
    to/from_big_endian_32 (sign-correct two's complement, pure Column
    bit math), to/from_big_endian_64 over negatives, and
    to/from_ieee754_32/64 (Arrow pandas UDFs over struct.pack — no
    Spark expression exposes raw float bits). The oracle pins the
    two's-complement hex of be32 and the bit-exact roundtrips;
    tests/test_semantics.py pins the IEEE754 bit patterns against
    known constants."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions.udfs import (
        from_ieee754_32,
        from_ieee754_64,
        to_ieee754_32,
        to_ieee754_64,
    )

    k = F.col("o_orderkey")
    signed = (k - 200).cast("int")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 400)
        .select(
            "o_orderkey",
            F.hex(ps.to_big_endian_32(signed)).alias("be32_hex"),
            ps.from_big_endian_32(ps.to_big_endian_32(signed))
            .alias("be32_roundtrip"),
            ps.from_big_endian_64(ps.to_big_endian_64(k * -1103515245))
            .alias("be64_roundtrip"),
            from_ieee754_64(to_ieee754_64(F.col("o_totalprice")))
            .alias("ieee64_roundtrip"),
            from_ieee754_32(
                to_ieee754_32(F.col("o_totalprice").cast("float"))
            ).alias("ieee32_roundtrip"),
        )
    )


@register(
    "fn_scalar_gaps",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') AS iso_ts,
       CAST('2020-05-01T03:02:0' || (o_orderkey % 10) AS TIMESTAMP)
         AS iso_parsed,
       CAST(regexp_extract('' || (o_orderkey % 90) || '.5m',
                           '([0-9.]+)([a-z]+)', 1) AS DOUBLE)
         * (CASE regexp_extract('' || (o_orderkey % 90) || '.5m',
                                '([0-9.]+)([a-z]+)', 2)
              WHEN 'ns' THEN 0.000000001 WHEN 'us' THEN 0.000001
              WHEN 'ms' THEN 0.001 WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0
              WHEN 'h' THEN 3600.0 ELSE 86400.0 END) AS dur_sec,
       replace(replace(to_base64(('k' || o_orderkey || '?>')::BLOB),
                       '+', '-'), '/', '_') AS b64url,
       ('0x' || lpad(to_hex(o_orderkey * 1103515245),
                     16, '0'))::BIGINT AS big_endian_roundtrip,
       json_extract_string('[10, 20, 30]',
                           '$[' || (o_orderkey % 3) || ']') AS json_arr,
       len(generate_series(DATE '2020-01-01',
                           DATE '2020-01-01'
                           + to_months((o_orderkey % 6 + 1)::INT),
                           INTERVAL 1 MONTH)) AS date_seq_len,
       map_keys(map_from_entries(list_transform(
         map_entries(MAP([o_orderkey % 7, o_orderkey % 7 + 50],
                         ['lo', 'hi'])),
         e -> {k: e.key * 10, v: upper(e.value)}))) AS tk_keys,
       map_values(map_from_entries(list_transform(
         map_entries(MAP([o_orderkey % 7, o_orderkey % 7 + 50],
                         ['lo', 'hi'])),
         e -> {k: e.key * 10, v: upper(e.value)}))) AS tv_vals,
       round(((o_orderkey % 50) / 60.0 + 1.96 * 1.96 / 120.0
              - 1.96 * sqrt((o_orderkey % 50) / 60.0
                            * (1.0 - (o_orderkey % 50) / 60.0) / 60.0
                            + 1.96 * 1.96 / (4.0 * 60.0 * 60.0)))
             / (1.0 + 1.96 * 1.96 / 60.0), 9) AS wilson_lower
FROM orders WHERE o_orderkey < 400
""",
)
def fn_scalar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-surface gap sweep — reference functions with no earlier
    query: to_iso8601 (DateTimeFunctions.java:243), from_iso8601_*
    (:292), parse_duration (:1338, number+unit -> interval, emitted
    here as seconds), to_base64url (VarbinaryFunctions.java),
    to/from_big_endian_64 roundtrip (VarbinaryFunctions.java),
    json_array_get (JsonFunctions.java), sequence() over dates with
    month step (SequenceFunction.java), transform_keys /
    transform_values (MapTransformKeyFunction.java — keys/values
    projected as arrays so the differential gate compares plain
    lists), and wilson_interval_lower (MathFunctions.java:1230 —
    closed-form arithmetic, identical double expression both
    engines). Every column is a pure per-row expression."""
    ensure_session_defaults(spark)
    k = F.col("o_orderkey")
    dur_s = F.concat((k % 90).cast("string"), F.lit(".5m"))
    dur_num = F.regexp_extract(dur_s, r"([0-9.]+)([a-z]+)", 1).cast("double")
    dur_unit = F.regexp_extract(dur_s, r"([0-9.]+)([a-z]+)", 2)
    mult = (
        F.when(dur_unit == "ns", 1e-9).when(dur_unit == "us", 1e-6)
        .when(dur_unit == "ms", 1e-3).when(dur_unit == "s", 1.0)
        .when(dur_unit == "m", 60.0).when(dur_unit == "h", 3600.0)
        .otherwise(86400.0)
    )
    tmap = F.transform_values(
        F.transform_keys(
            F.map_from_arrays(
                F.array(k % 7, k % 7 + 50), F.array(F.lit("lo"), F.lit("hi"))
            ),
            lambda mk, _: mk * 10,
        ),
        lambda _, mv: F.upper(mv),
    )
    p_hat = (k % 50) / F.lit(60.0)
    z = 1.96
    wilson_lower = (
        (p_hat + z * z / (2.0 * 60.0)
         - z * F.sqrt(p_hat * (1.0 - p_hat) / 60.0
                      + z * z / (4.0 * 60.0 * 60.0)))
        / (1.0 + z * z / 60.0)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 400)
        .select(
            "o_orderkey",
            F.date_format(
                F.col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS"
            ).alias("iso_ts"),
            F.concat(
                F.lit("2020-05-01T03:02:0"), (k % 10).cast("string")
            ).cast("timestamp").alias("iso_parsed"),
            (dur_num * mult).alias("dur_sec"),
            F.translate(
                F.base64(
                    F.concat(F.lit("k"), k.cast("string"), F.lit("?>"))
                    .cast("binary")
                ),
                "+/", "-_",
            ).alias("b64url"),
            F.conv(
                F.hex(F.unhex(F.lpad(F.hex(k * 1103515245), 16, "0"))), 16, 10
            ).cast("bigint").alias("big_endian_roundtrip"),
            # json_array_get with a dynamic index: parse once, index
            # with element_at (get_json_object needs a foldable path).
            F.element_at(
                F.from_json(F.lit("[10, 20, 30]"), "array<int>"),
                (k % 3).cast("int") + 1,
            ).cast("string").alias("json_arr"),
            F.size(
                F.sequence(
                    F.lit("2020-01-01").cast("date"),
                    F.add_months(
                        F.lit("2020-01-01").cast("date"),
                        (k % 6 + 1).cast("int"),
                    ),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).cast("bigint").alias("date_seq_len"),
            F.map_keys(tmap).alias("tk_keys"),
            F.map_values(tmap).alias("tv_vals"),
            F.round(wilson_lower, 9).alias("wilson_lower"),
        )
    )


@register(
    "fn_array_map_gaps",
    oracle="""
WITH base AS (
  SELECT p_partkey,
         string_split(p_name, ' ') AS words,
         p_name || '=a;' || p_brand || '=b;' || p_name || '=c' AS kvs
  FROM part WHERE p_partkey < 400
)
SELECT p_partkey,
       list_filter(words, x -> x <> 'small') AS removed,
       list_slice(words, 1, 1) AS sliced,
       list_transform(generate_series(1, 3), x -> words[1]) AS repeated,
       list_sort(words, 'DESC') AS sorted_desc,
       list_sort(list_distinct(list_transform(
         string_split(kvs, ';'), e -> string_split(e, '=')[1]))) AS mm_keys,
       list_transform(
         list_sort(list_distinct(list_transform(
           string_split(kvs, ';'), e -> string_split(e, '=')[1]))),
         k -> list_transform(
           list_filter(string_split(kvs, ';'),
                       e -> string_split(e, '=')[1] = k),
           e -> string_split(e, '=')[2])) AS mm_vals
FROM base
""",
)
def fn_array_map_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map gap sweep — remaining 0.235 functions:
    array_remove (ArrayRemoveFunction.java), slice
    (ArraySliceFunction.java, 1-based like Presto subscripts), repeat
    (RepeatFunction.java — element to array<n>), array_sort with a
    comparator lambda (ArraySortComparatorFunction.java — Spark takes
    the same (a,b)->int comparator; the oracle pins a descending
    comparator against list_sort DESC), and split_to_multimap /
    multimap_from_entries (MapFunctions — duplicate keys collect into
    arrays; emitted as sorted key array + per-key value arrays so the
    gate compares plain lists). All pure per-row expressions."""
    ensure_session_defaults(spark)
    words = F.split(F.col("p_name"), " ")
    kvs = F.concat(
        F.col("p_name"), F.lit("=a;"), F.col("p_brand"), F.lit("=b;"),
        F.col("p_name"), F.lit("=c"),
    )
    entries = F.split(kvs, ";")
    key_of = lambda e: F.element_at(F.split(e, "="), 1)
    val_of = lambda e: F.element_at(F.split(e, "="), 2)
    mm_keys = F.array_sort(F.array_distinct(F.transform(entries, key_of)))
    desc_cmp = lambda a, b: (
        F.when(a < b, F.lit(1)).when(a > b, F.lit(-1)).otherwise(F.lit(0))
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.array_remove(words, "small").alias("removed"),
            F.slice(words, 1, 1).alias("sliced"),
            F.array_repeat(F.element_at(words, 1), 3).alias("repeated"),
            F.array_sort(words, desc_cmp).alias("sorted_desc"),
            mm_keys.alias("mm_keys"),
            F.transform(
                mm_keys,
                lambda k: F.transform(
                    F.filter(entries, lambda e: key_of(e) == k), val_of
                ),
            ).alias("mm_vals"),
        )
    )


@register(
    "fn_misc_gaps",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k,
         '' || (o_orderkey % 9) || '.' || (o_orderkey % 4) || 'MB' AS dsize,
         string_split('10.' || (o_orderkey % 256) || '.'
                      || ((o_orderkey * 3) % 256) || '.'
                      || ((o_orderkey * 7) % 256), '.') AS oct,
         (o_orderkey % 17 + 8)::BIGINT AS pfx,
         [o_orderkey % 5, o_orderkey % 7, o_orderkey % 3] AS nums
  FROM orders WHERE o_orderkey < 300
),
ipm AS (
  SELECT *,
         oct[1]::BIGINT * 16777216 + oct[2]::BIGINT * 65536
         + oct[3]::BIGINT * 256 + oct[4]::BIGINT AS ipint,
         (1::BIGINT << (32 - pfx)) AS blk
  FROM base
),
ipn AS (SELECT *, ipint - (ipint % blk) AS netint FROM ipm)
SELECT k,
       CAST(floor(CAST(regexp_extract(dsize, '([0-9.]+)([A-Z]+)', 1)
                       AS DOUBLE)
                  * (CASE regexp_extract(dsize, '([0-9.]+)([A-Z]+)', 2)
                       WHEN 'B' THEN 1 WHEN 'kB' THEN 1024
                       WHEN 'MB' THEN 1048576 ELSE 1073741824 END))
            AS BIGINT) AS data_size_bytes,
       len(list_filter(nums, x -> x >= 0)) = len(nums) AS all_nonneg,
       len(list_filter(nums, x -> x > 4)) > 0 AS any_over4,
       len(list_filter(nums, x -> x > 6)) = 0 AS none_over6,
       flatten(list_transform(generate_series(1, len(nums) - 1),
         i -> list_transform(generate_series(i + 1, len(nums)),
           j -> [nums[i], nums[j]]))) AS combos2,
       (netint // 16777216) || '.' || ((netint // 65536) % 256) || '.'
       || ((netint // 256) % 256) || '.' || (netint % 256)
       || '/' || pfx AS ip_prefix,
       netint AS ip_subnet_min_int,
       netint + blk - 1 AS ip_subnet_max_int
FROM ipn
""",
)
def fn_misc_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining scalar families: parse_presto_data_size
    (DataSizeFunctions.java:37 — '2.3MB' -> bytes; 1024-based units,
    floor to integral bytes on both engines), all_match / any_match /
    none_match (ArrayAllMatchFunction.java family — Spark forall/
    exists; the oracle counts filtered elements), array_combinations
    of size 2 (ArrayCombinationsFunction.java — index-pair nested
    transform), and the IpPrefixFunctions.java IPv4 family:
    ip_prefix(addr, p) canonical network string plus
    ip_subnet_min/max (emitted as integers — octet math is exact
    integer arithmetic on both engines)."""
    ensure_session_defaults(spark)
    k = F.col("o_orderkey")
    dsize = F.concat(
        (k % 9).cast("string"), F.lit("."), (k % 4).cast("string"), F.lit("MB")
    )
    num = F.regexp_extract(dsize, r"([0-9.]+)([A-Z]+)", 1).cast("double")
    unit = F.regexp_extract(dsize, r"([0-9.]+)([A-Z]+)", 2)
    factor = (
        F.when(unit == "B", 1).when(unit == "kB", 1024)
        .when(unit == "MB", 1048576).otherwise(1073741824)
    )
    nums = F.array(k % 5, k % 7, k % 3)
    n = F.size(nums)
    combos2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.array(
                    F.element_at(nums, i.cast("int")),
                    F.element_at(nums, j.cast("int")),
                ),
            ),
        )
    )
    ip = F.concat(
        F.lit("10."), (k % 256).cast("string"), F.lit("."),
        ((k * 3) % 256).cast("string"), F.lit("."),
        ((k * 7) % 256).cast("string"),
    )
    octs = F.split(ip, r"\.")
    ipint = (
        F.element_at(octs, 1).cast("bigint") * 16777216
        + F.element_at(octs, 2).cast("bigint") * 65536
        + F.element_at(octs, 3).cast("bigint") * 256
        + F.element_at(octs, 4).cast("bigint")
    )
    pfx = (k % 17 + 8).cast("bigint")
    # shiftleft's bit count must be a Python int in the classic API;
    # dynamic shift goes through expr.
    blk = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - (o_orderkey % 17 + 8) AS INT))")
    netint = ipint - (ipint % blk)
    ip_prefix = F.concat(
        F.floor(netint / 16777216).cast("bigint").cast("string"), F.lit("."),
        (F.floor(netint / 65536).cast("bigint") % 256).cast("string"),
        F.lit("."),
        (F.floor(netint / 256).cast("bigint") % 256).cast("string"),
        F.lit("."),
        (netint % 256).cast("string"), F.lit("/"), pfx.cast("string"),
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            F.floor(num * factor).cast("bigint").alias("data_size_bytes"),
            F.forall(nums, lambda x: x >= 0).alias("all_nonneg"),
            F.exists(nums, lambda x: x > 4).alias("any_over4"),
            (~F.exists(nums, lambda x: x > 6)).alias("none_over6"),
            combos2.alias("combos2"),
            ip_prefix.alias("ip_prefix"),
            netint.alias("ip_subnet_min_int"),
            (netint + blk - 1).alias("ip_subnet_max_int"),
        )
    )


@register(
    "fn_ipv6_prefix",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k,
         [8193, 3512, o_orderkey % 65536, (o_orderkey * 31) % 65536,
          (o_orderkey * 131) % 65536, (o_orderkey * 7) % 65536,
          (o_orderkey * 13) % 65536, (o_orderkey * 257) % 65536] AS gs,
         CAST(o_orderkey % 101 + 20 AS BIGINT) AS p
  FROM orders WHERE o_orderkey < 300
),
masked AS (
  SELECT k, p,
         list_transform(generate_series(1, 8), i ->
           gs[i] - (gs[i] % CAST(2 ** (16 - greatest(0,
             least(16, p - (i - 1) * 16))) AS BIGINT))) AS mn,
         list_transform(generate_series(1, 8), i ->
           gs[i] - (gs[i] % CAST(2 ** (16 - greatest(0,
             least(16, p - (i - 1) * 16))) AS BIGINT))
           + CAST(2 ** (16 - greatest(0, least(16, p - (i - 1) * 16)))
                  AS BIGINT) - 1) AS mx
  FROM base
)
SELECT k,
       array_to_string(list_transform(mn, g -> lower(lpad(to_hex(g), 4, '0'))),
                       ':') AS subnet_min,
       array_to_string(list_transform(mx, g -> lower(lpad(to_hex(g), 4, '0'))),
                       ':') AS subnet_max,
       array_to_string(list_transform(mn, g -> lower(lpad(to_hex(g), 4, '0'))),
                       ':') || '/' || p AS prefix
FROM masked
""",
)
def fn_ipv6_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 ip_prefix / ip_subnet_min / ip_subnet_max
    (IpPrefixFunctions.java — the v6 half of the family; v4 is
    oracle-checked in fn_misc_gaps). Addresses are synthesized as
    eight 16-bit groups under 2001:0db8::/32; prefixes sweep 20..120
    so masks land in every group position, including the keep=0 and
    keep=16 boundary groups. Pure per-row group arithmetic — exact
    integers on both engines, no UDFs."""
    ensure_session_defaults(spark)
    k = F.col("o_orderkey")
    group_exprs = [
        F.lit(8193),
        F.lit(3512),
        (k % 65536),
        ((k * 31) % 65536),
        ((k * 131) % 65536),
        ((k * 7) % 65536),
        ((k * 13) % 65536),
        ((k * 257) % 65536),
    ]
    addr = F.concat_ws(
        ":",
        F.transform(
            F.array(*[g.cast("int") for g in group_exprs]),
            lambda g: F.format_string("%04x", g),
        ),
    )
    p = (k % 101 + 20).cast("bigint")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            ps.ip_subnet_min_v6(addr, p).alias("subnet_min"),
            ps.ip_subnet_max_v6(addr, p).alias("subnet_max"),
            ps.ip_prefix_v6(addr, p).alias("prefix"),
        )
    )


@register(
    "fn_geospatial_core",
    oracle="""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS px, ((o_orderkey * 3) % 100) / 10.0 AS py,
         ((o_orderkey * 7) % 100) / 10.0 AS qx,
         ((o_orderkey * 13) % 100) / 10.0 AS qy,
         (o_orderkey % 160) / 2.0 - 40.0 AS lat1,
         ((o_orderkey * 3) % 720) / 2.0 - 180.0 AS lon1,
         ((o_orderkey * 7) % 160) / 2.0 - 40.0 AS lat2,
         ((o_orderkey * 11) % 720) / 2.0 - 180.0 AS lon2
  FROM orders WHERE o_orderkey < 300
)
SELECT k, px AS x, py AS y,
       round(sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)), 9)
         AS dist,
       round(sqrt(px * px + py * py)
             + sqrt((qx - px) * (qx - px) + (qy - py) * (qy - py)), 9)
         AS line_len,
       round(px * py, 9) AS ring_area,
       round((0 + px + qx + px + qx) / 5.0, 9) AS cx,
       round((0 + py + qy + py + qy) / 5.0, 9) AS cy,
       px >= 0 AND px <= 5 AND py >= 0 AND py <= 5 AS in_env,
       round(6371.01 * atan2(
         sqrt(pow(cos(radians(lat2)) * sin(radians(lon1 - lon2)), 2)
              + pow(cos(radians(lat1)) * sin(radians(lat2))
                    - sin(radians(lat1)) * cos(radians(lat2))
                      * cos(radians(lon1 - lon2)), 2)),
         sin(radians(lat1)) * sin(radians(lat2))
         + cos(radians(lat1)) * cos(radians(lat2))
           * cos(radians(lon1 - lon2))), 6) AS gcd_km
FROM pts
""",
)
def fn_geospatial_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial scalar core (presto-geospatial GeoFunctions.java —
    ST_Point/ST_X/ST_Y/ST_Distance/ST_Length/ST_Area/ST_Centroid/
    envelope ST_Contains; great_circle_distance is
    SphericalGeographyUtils.java:82). Geometry = typed structs/
    arrays, every measure a pure Column expression
    (functions/geo.py); the oracle restates the planar formulas
    (segment sums, shoelace rectangle, spherical-Vincenty atan2 on
    the 6371.01 km reference radius). ST_Buffer/multi-geometry
    predicates remain a documented gap (they need a geometry
    library); polygon containment is fn_geospatial_polygon, the
    spatial-join paths are join_spatial_radius and
    join_spatial_contains."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    px, py = (k % 100) / 10.0, ((k * 3) % 100) / 10.0
    qx, qy = ((k * 7) % 100) / 10.0, ((k * 13) % 100) / 10.0
    p = geo.st_point(px, py)
    q = geo.st_point(qx, qy)
    origin = geo.st_point(F.lit(0.0), F.lit(0.0))
    line = F.array(origin, p, q)
    # closed rectangle ring (0,0)-(px,0)-(px,py)-(0,py)-(0,0)
    ring = F.array(
        origin,
        geo.st_point(px, F.lit(0.0)),
        geo.st_point(px, py),
        geo.st_point(F.lit(0.0), py),
        origin,
    )
    multi = F.array(origin, p, q, p, q)
    lat1 = (k % 160) / 2.0 - 40.0
    lon1 = ((k * 3) % 720) / 2.0 - 180.0
    lat2 = ((k * 7) % 160) / 2.0 - 40.0
    lon2 = ((k * 11) % 720) / 2.0 - 180.0
    centroid = geo.st_centroid_points(multi)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_x(p).alias("x"),
            geo.st_y(p).alias("y"),
            F.round(geo.st_distance(p, q), 9).alias("dist"),
            F.round(geo.st_length(line), 9).alias("line_len"),
            F.round(geo.st_area(ring), 9).alias("ring_area"),
            F.round(geo.st_x(centroid), 9).alias("cx"),
            F.round(geo.st_y(centroid), 9).alias("cy"),
            geo.st_envelope_contains(
                F.lit(0.0), F.lit(0.0), F.lit(5.0), F.lit(5.0), p
            ).alias("in_env"),
            F.round(
                geo.great_circle_distance(lat1, lon1, lat2, lon2), 6
            ).alias("gcd_km"),
        )
    )


@register(
    "fn_json_casts",
    oracle="""
SELECT event_id,
       [event_id % 7, (event_id % 7) * 2, (event_id % 7) * 3]
         AS arr_cast,
       'k=' || CAST(json_extract(props, '$.k') AS VARCHAR) AS map_cast,
       CAST(json_extract(props, '$.k') AS INT) AS row_x,
       'id-' || CAST(event_id AS VARCHAR) AS row_y,
       '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}'
         AS fmt_roundtrip,
       3 AS arr_size,
       1 AS obj_size
FROM events WHERE event_id < 100
""",
)
def fn_json_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON cast family (JsonToArrayCast/JsonToMapCast/JsonToRowCast,
    json_parse + json_format roundtrip, json_size —
    JsonOperators.java / JsonFunctions.java). Spark's from_json/
    to_json ARE Presto's casts: JSON text -> array/map/row and back.
    Row fields are projected out (engines render raw structs
    differently; the VALUES are the contract). json_size = element
    count of the array/object at the path, emitted per row."""
    ensure_session_defaults(spark)
    k = F.col("event_id")
    arr_json = F.concat(
        F.lit("["),
        (k % 7).cast("string"), F.lit(","),
        ((k % 7) * 2).cast("string"), F.lit(","),
        ((k % 7) * 3).cast("string"),
        F.lit("]"),
    )
    row_json = F.concat(
        F.lit('{"x":'),
        F.get_json_object("props", "$.k"),
        F.lit(',"y":"id-'),
        k.cast("string"),
        F.lit('"}'),
    )
    row_struct = F.from_json(row_json, "struct<x:int,y:string>")
    return (
        load_table(spark, sf_dir, "events")
        .filter(k < 100)
        .select(
            "event_id",
            F.from_json(arr_json, "array<int>").alias("arr_cast"),
            # maps compare as sorted entry strings (engine map
            # renderings differ; see agg_map_agg)
            F.array_join(
                F.sort_array(
                    F.transform(
                        F.map_entries(
                            F.from_json(F.col("props"), "map<string,int>")
                        ),
                        lambda e: F.concat_ws(
                            "=", e["key"], e["value"].cast("string")
                        ),
                    )
                ),
                ",",
            ).alias("map_cast"),
            row_struct.getField("x").alias("row_x"),
            row_struct.getField("y").alias("row_y"),
            # json_format(json_parse(x)): canonical compact rendering
            F.to_json(F.from_json(F.col("props"), "map<string,int>"))
            .alias("fmt_roundtrip"),
            F.size(F.from_json(arr_json, "array<int>")).alias("arr_size"),
            F.size(
                F.map_keys(F.from_json(F.col("props"), "map<string,int>"))
            ).alias("obj_size"),
        )
    )


@register(
    "fn_geospatial_wkt",
    oracle="""
WITH pts AS (
  SELECT o_orderkey AS k,
         CAST((o_orderkey % 100) / 10.0 AS VARCHAR) AS sx,
         CAST(((o_orderkey * 3) % 100) / 10.0 AS VARCHAR) AS sy,
         CAST(((o_orderkey * 7) % 100) / 10.0 AS VARCHAR) AS sx2,
         CAST(((o_orderkey * 13) % 100) / 10.0 AS VARCHAR) AS sy2
  FROM orders WHERE o_orderkey < 300
),
wkt AS (
  SELECT k,
         'POINT (' || sx || ' ' || sy || ')' AS wp,
         'LINESTRING (0.0 0.0, ' || sx || ' ' || sy || ', '
           || sx2 || ' ' || sy2 || ')' AS wl,
         'POLYGON ((0.0 0.0, ' || sx || ' 0.0, ' || sx || ' ' || sy
           || ', 0.0 ' || sy || ', 0.0 0.0))' AS wpoly
  FROM pts
),
parsed AS (
  SELECT k, wp, wl,
         CAST(regexp_extract(wp, '^POINT \\(([-0-9.eE]+) ', 1) AS DOUBLE)
           AS px,
         CAST(regexp_extract(wp, ' ([-0-9.eE]+)\\)$', 1) AS DOUBLE) AS py,
         list_transform(string_split(regexp_extract(wl,
             '^LINESTRING \\((.+)\\)$', 1), ', '),
           p -> {x: CAST(string_split(p, ' ')[1] AS DOUBLE),
                 y: CAST(string_split(p, ' ')[2] AS DOUBLE)}) AS line,
         list_transform(string_split(regexp_extract(wpoly,
             '^POLYGON \\(\\((.+)\\)\\)$', 1), ', '),
           p -> {x: CAST(string_split(p, ' ')[1] AS DOUBLE),
                 y: CAST(string_split(p, ' ')[2] AS DOUBLE)}) AS ring
  FROM wkt
)
SELECT k, px, py,
       round(sqrt(line[2].x * line[2].x + line[2].y * line[2].y)
             + sqrt((line[3].x - line[2].x) * (line[3].x - line[2].x)
                    + (line[3].y - line[2].y) * (line[3].y - line[2].y)),
             9) AS line_len,
       round(ring[2].x * ring[3].y, 9) AS ring_area,
       'POINT (' || CAST(px AS VARCHAR) || ' ' || CAST(py AS VARCHAR)
         || ')' AS point_text,
       wl AS line_text,
       list_min(list_transform(line, q -> q.x)) AS xmin,
       list_max(list_transform(line, q -> q.x)) AS xmax,
       list_min(list_transform(line, q -> q.y)) AS ymin,
       list_max(list_transform(line, q -> q.y)) AS ymax,
       CAST(len(ring) AS BIGINT) AS n_ring_pts,
       ring[1].x = ring[len(ring)].x AND ring[1].y = ring[len(ring)].y
         AS ring_closed,
       line[1].x = line[len(line)].x AND line[1].y = line[len(line)].y
         AS line_closed
FROM parsed
""",
)
def fn_geospatial_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT text I/O for the basic OGC types (GeoFunctions.java
    stGeometryFromText/stAsText) — POINT/LINESTRING/POLYGON parse and
    render as pure string expressions over the typed-struct geometry
    model, then the measures (st_length, st_area) run on the PARSED
    geometry, proving parse -> compute -> render end to end, plus the envelope
    accessors (ST_XMin/XMax/YMin/YMax), ST_NumPoints and ST_IsClosed
    on the parsed geometries. The oracle performs the same string
    surgery in DuckDB. Multi-
    geometries / polygon holes stay a documented gap (real parser
    territory)."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    sx = ((k % 100) / 10.0).cast("string")
    sy = (((k * 3) % 100) / 10.0).cast("string")
    sx2 = (((k * 7) % 100) / 10.0).cast("string")
    sy2 = (((k * 13) % 100) / 10.0).cast("string")
    wp = F.concat(F.lit("POINT ("), sx, F.lit(" "), sy, F.lit(")"))
    wl = F.concat(
        F.lit("LINESTRING (0.0 0.0, "), sx, F.lit(" "), sy,
        F.lit(", "), sx2, F.lit(" "), sy2, F.lit(")"),
    )
    wpoly = F.concat(
        F.lit("POLYGON ((0.0 0.0, "), sx, F.lit(" 0.0, "), sx,
        F.lit(" "), sy, F.lit(", 0.0 "), sy, F.lit(", 0.0 0.0))"),
    )
    point = geo.st_point_from_text(wp)
    line = geo.st_line_from_text(wl)
    ring = geo.st_polygon_from_text(wpoly)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_x(point).alias("px"),
            geo.st_y(point).alias("py"),
            F.round(geo.st_length(line), 9).alias("line_len"),
            F.round(geo.st_area(ring), 9).alias("ring_area"),
            geo.st_as_text_point(point).alias("point_text"),
            geo.st_as_text_line(line).alias("line_text"),
            geo.st_x_min(line).alias("xmin"),
            geo.st_x_max(line).alias("xmax"),
            geo.st_y_min(line).alias("ymin"),
            geo.st_y_max(line).alias("ymax"),
            geo.st_num_points(ring).alias("n_ring_pts"),
            geo.st_is_closed(ring).alias("ring_closed"),
            geo.st_is_closed(line).alias("line_closed"),
        )
    )


# Fixed test rings for fn_geospatial_polygon — closed (first == last).
# The hexagon is NON-convex (dents at (6.35,4.95) and (3.95,4.45)) so
# the test exercises crossing counts > 1; the triangle is the convex
# base case. Coordinates sit off the 0.1 grid the probe points live
# on, so no point lies exactly on an edge.
_HEX_RING = [
    (1.15, 1.05), (8.25, 2.15), (6.35, 4.95), (8.45, 7.65),
    (2.05, 8.85), (3.95, 4.45), (1.15, 1.05),
]
_TRI_RING = [(2.05, 2.15), (7.95, 3.05), (5.05, 7.85), (2.05, 2.15)]

from presto_0_235_spark.functions.geo import ray_cast_sql as _ray_cast_sql


@register(
    "fn_geospatial_polygon",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS px,
         ((o_orderkey * 3) % 100) / 10.0 AS py
  FROM orders WHERE o_orderkey < 400
)
SELECT k, px, py,
       {_ray_cast_sql("px", "py", _HEX_RING)} AS in_hex,
       {_ray_cast_sql("px", "py", _TRI_RING)} AS in_tri,
       {_ray_cast_sql("px", "py", _TRI_RING)} AS within_tri
FROM pts
""",
)
def fn_geospatial_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-polygon point containment (GeoFunctions.java:1021
    stContains / stWithin — the reference hands arbitrary polygons
    to the Esri geometry library; here ray-casting crossing parity
    is a pure Column fold over the ring array, functions/geo.py
    st_contains_ring). Probed against a NON-convex hexagon (crossing
    counts 0/1/2/3 all occur) and a convex triangle; the oracle
    unrolls the identical crossing arithmetic edge-by-edge, so both
    engines compute the same doubles. Per-row whole-stage-codegen
    math — no shuffle, no UDF; the distributed join shape over this
    predicate is join_spatial_contains."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    def ring_lit(vs):
        return F.array(
            *[geo.st_point(F.lit(x), F.lit(y)) for x, y in vs]
        )

    k = F.col("o_orderkey")
    p = geo.st_point((k % 100) / 10.0, ((k * 3) % 100) / 10.0)
    hexagon, triangle = ring_lit(_HEX_RING), ring_lit(_TRI_RING)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 400)
        .select(
            k.alias("k"),
            geo.st_x(p).alias("px"),
            geo.st_y(p).alias("py"),
            geo.st_contains_ring(hexagon, p).alias("in_hex"),
            geo.st_contains_ring(triangle, p).alias("in_tri"),
            geo.st_within_ring(p, triangle).alias("within_tri"),
        )
    )


@register(
    "fn_char_time_tz",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k,
         'VL' || substr(o_orderstatus, 1, 1)
              || repeat(' ', o_orderkey % 3) AS raw,
         o_orderkey % 24 AS hh, (o_orderkey * 7) % 60 AS mi,
         (o_orderkey * 13) % 60 AS ss, (o_orderkey * 3) % 1000 AS ms,
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END AS sgn,
         o_orderkey % 12 AS oh, (o_orderkey * 5) % 60 AS om
  FROM orders WHERE o_orderkey < 300
),
t AS (
  SELECT *,
         (hh * 3600000 + mi * 60000 + ss * 1000 + ms)
           - sgn * (oh * 60 + om) * 60000 AS millis_utc,
         sgn * (oh * 60 + om) AS off_min
  FROM src
)
SELECT k,
       rtrim(substr(raw, 1, 4)) AS c4,
       rpad(rtrim(substr(raw, 1, 4)), 4, ' ') AS c4_disp,
       rtrim(substr(raw, 1, 4)) = rtrim(substr(raw || '  ', 1, 4))
         AS char_trailing_space_eq,
       millis_utc AS t_millis,
       hh AS t_hour, mi AS t_minute,
       lpad(hh::VARCHAR, 2, '0') || ':' || lpad(mi::VARCHAR, 2, '0')
         || ':' || lpad(ss::VARCHAR, 2, '0') || '.'
         || lpad(ms::VARCHAR, 3, '0') || ' '
         || (CASE WHEN off_min < 0 THEN '-' ELSE '+' END)
         || lpad((abs(off_min) // 60)::VARCHAR, 2, '0') || ':'
         || lpad((abs(off_min) % 60)::VARCHAR, 2, '0') AS t_fmt,
       ((millis_utc + 330 * 60000) % 86400000 + 86400000) % 86400000
         AS t_at_local_millis,
       TRUE AS t_rezone_eq
FROM t
""",
)
def fn_char_time_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """char(n) + TIME WITH TIME ZONE semantics (SPI/type/CharType.java
    + Chars.java:48,91; TimeWithTimeZoneType.java:45-59):

    - char(n): CAST truncates to n code points and TRIMS trailing
      spaces for storage, comparisons act on the trimmed bytes (so
      trailing-space differences are insignificant — pinned by
      char_trailing_space_eq being TRUE for every row), display pads
      back to n.
    - time-tz: packed (millis_utc, offset_minutes) struct; ordering
      key is millis_utc alone; hour/minute read the LOCAL clock;
      AT TIME ZONE re-zones without moving the instant (pinned:
      t_rezone_eq compares the comparison keys before/after a +05:30
      re-zone); the client rendering is 'HH:MM:SS.fff ±HH:MM'.

    Both sides build the same literal strings from row keys; Spark
    actually PARSES them with the regex parser (functions/scalar.py
    parse_time_tz), the oracle recomputes the packed values from the
    components — a differential check of parser + arithmetic."""
    ensure_session_defaults(spark)
    k = F.col("o_orderkey")
    raw = F.concat(
        F.lit("VL"), F.substring("o_orderstatus", 1, 1),
        F.repeat(F.lit(" "), (k % 3).cast("int")),
    )
    hh, mi = k % 24, (k * 7) % 60
    ss, ms = (k * 13) % 60, (k * 3) % 1000
    sgn = F.when(k % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    oh, om = k % 12, (k * 5) % 60

    def two(x):
        return F.lpad(x.cast("string"), 2, "0")

    tz_lit = F.concat(
        two(hh), F.lit(":"), two(mi), F.lit(":"), two(ss),
        F.lit("."), F.lpad(ms.cast("string"), 3, "0"), F.lit(" "),
        F.when(sgn < 0, F.lit("-")).otherwise(F.lit("+")),
        two(oh), F.lit(":"), two(om),
    )
    t = ps.parse_time_tz(tz_lit)
    rezoned = ps.time_tz_at_zone(t, F.lit(330))
    c4 = ps.char_cast(raw, 4)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            c4.alias("c4"),
            ps.char_pad_display(c4, 4).alias("c4_disp"),
            (ps.char_cast(raw, 4) == ps.char_cast(
                F.concat(raw, F.lit("  ")), 4
            )).alias("char_trailing_space_eq"),
            ps.time_tz_millis_utc(t).alias("t_millis"),
            ps.time_tz_hour(t).alias("t_hour"),
            ps.time_tz_minute(t).alias("t_minute"),
            ps.format_time_tz(t).alias("t_fmt"),
            F.pmod(
                ps.time_tz_millis_utc(rezoned)
                + F.lit(330) * 60000,
                F.lit(86400000),
            ).alias("t_at_local_millis"),
            (
                ps.time_tz_millis_utc(rezoned)
                == ps.time_tz_millis_utc(t)
            ).alias("t_rezone_eq"),
        )
    )


# Polygon-with-holes fixture for fn_geospatial_holes: outer square,
# one square hole, one triangular hole (disjoint, both inside the
# outer ring). Vertices off the probe points' 0.1 grid.
_HOLES_RINGS = [
    [(1.05, 1.15), (8.95, 1.15), (8.95, 8.85), (1.05, 8.85),
     (1.05, 1.15)],
    [(2.55, 2.45), (4.45, 2.45), (4.45, 4.35), (2.55, 4.35),
     (2.55, 2.45)],
    [(5.85, 5.25), (7.95, 5.45), (6.55, 7.65), (5.85, 5.25)],
]

_HOLES_WKT = "POLYGON (" + ", ".join(
    "(" + ", ".join(f"{x} {y}" for x, y in ring) + ")"
    for ring in _HOLES_RINGS
) + ")"

from presto_0_235_spark.functions.geo import (  # noqa: E402
    ray_cast_holes_sql as _ray_cast_holes_sql,
)

_HOLES_PRED_SQL = _ray_cast_holes_sql("px", "py", _HOLES_RINGS)


@register(
    "fn_geospatial_holes",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS px,
         ((o_orderkey * 3) % 100) / 10.0 AS py
  FROM orders WHERE o_orderkey < 400
)
SELECT k, px, py,
       {_HOLES_PRED_SQL} AS in_poly,
       {_HOLES_PRED_SQL} AS in_poly_wkt
FROM pts
""",
)
def fn_geospatial_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon WITH HOLES containment (GeoFunctions.java:1021
    stContains on polygons with interior rings — the reference's
    Esri-backed path; here the even-odd crossing rule over ALL rings,
    functions/geo.py st_contains_polygon). Exercised through BOTH
    geometry doors: the typed ring-array literal and the WKT text
    form 'POLYGON ((outer), (hole), (hole))' parsed by
    st_polygon_rings_from_text — the two results must agree with
    each other and with the oracle's edge-unrolled arithmetic.
    Points inside a hole report NOT contained; holes make crossing
    totals of 0..4 all occur."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    rings_lit = F.array(
        *[
            F.array(*[geo.st_point(F.lit(x), F.lit(y)) for x, y in ring])
            for ring in _HOLES_RINGS
        ]
    )
    k = F.col("o_orderkey")
    p = geo.st_point((k % 100) / 10.0, ((k * 3) % 100) / 10.0)
    parsed = geo.st_polygon_rings_from_text(F.lit(_HOLES_WKT))
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 400)
        .select(
            k.alias("k"),
            geo.st_x(p).alias("px"),
            geo.st_y(p).alias("py"),
            geo.st_contains_polygon(rings_lit, p).alias("in_poly"),
            geo.st_contains_polygon(parsed, p).alias("in_poly_wkt"),
        )
    )


@register(
    "fn_geospatial_multi",
    oracle="""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS ax, ((o_orderkey * 3) % 100) / 10.0 AS ay,
         ((o_orderkey * 7) % 100) / 10.0 AS bx,
         ((o_orderkey * 13) % 100) / 10.0 AS by,
         1.0 + (o_orderkey % 30) / 10.0 AS r
  FROM orders WHERE o_orderkey < 300
)
SELECT k,
       'MULTIPOINT (' || ax::VARCHAR || ' ' || ay::VARCHAR || ', '
         || bx::VARCHAR || ' ' || by::VARCHAR || ')' AS mp_text,
       2 AS mp_n,
       round(sqrt(ax * ax + ay * ay)
             + sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 9)
         AS ml_len,
       round(0.5 * 32 * r * r * sin(2 * pi() / 32), 6) AS buf_area,
       TRUE AS buf_contains_center,
       FALSE AS buf_contains_far
FROM pts
""",
)
def fn_geospatial_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-geometry subset + point ST_Buffer (GeoFunctions.java:171
    stMultiPoint, :277 stBuffer): MULTIPOINT WKT parse -> render
    roundtrip (the rendered text is compared, so parse and render
    both check), MULTILINESTRING parse + summed ST_Length, and the
    N-gon circle buffer — its shoelace area must match the closed
    form n/2*r^2*sin(2pi/n) at 6 dp, it must contain its center and
    must not contain a point 3r away. Buffer ring feeds the SAME
    st_area/st_contains_ring code paths as hand-built rings."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    ax, ay = (k % 100) / 10.0, ((k * 3) % 100) / 10.0
    bx, by = ((k * 7) % 100) / 10.0, ((k * 13) % 100) / 10.0
    r = 1.0 + (k % 30) / 10.0

    def two(x, y):
        return F.concat(
            x.cast("double").cast("string"), F.lit(" "),
            y.cast("double").cast("string"),
        )

    mp_wkt = F.concat(
        F.lit("MULTIPOINT ("), two(ax, ay), F.lit(", "), two(bx, by),
        F.lit(")"),
    )
    ml_wkt = F.concat(
        F.lit("MULTILINESTRING ((0 0, "), two(ax, ay), F.lit("), ("),
        two(ax, ay), F.lit(", "), two(bx, by), F.lit("))"),
    )
    mp = geo.st_multipoint_from_text(mp_wkt)
    ml = geo.st_multiline_from_text(ml_wkt)
    center = geo.st_point(ax, ay)
    buf = geo.st_buffer_point(center, r)
    far = geo.st_point(ax + 3 * r, ay)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_as_text_multipoint(mp).alias("mp_text"),
            geo.st_num_points(mp).cast("int").alias("mp_n"),
            F.round(geo.st_length_multi(ml), 9).alias("ml_len"),
            F.round(geo.st_area(buf), 6).alias("buf_area"),
            geo.st_contains_ring(buf, center).alias("buf_contains_center"),
            geo.st_contains_ring(buf, far).alias("buf_contains_far"),
        )
    )


# MULTIPOLYGON fixture for fn_geospatial_multipolygon: member 1 is a
# square with a square hole, member 2 a disjoint triangle; the union
# partner is a distant square. All vertices off the probe grid.
_MP_POLYS = [
    [
        [(0.55, 0.65), (4.45, 0.65), (4.45, 4.35), (0.55, 4.35),
         (0.55, 0.65)],
        [(1.55, 1.45), (2.95, 1.45), (2.95, 2.85), (1.55, 2.85),
         (1.55, 1.45)],
    ],
    [
        [(5.85, 5.25), (9.05, 5.45), (7.15, 8.95), (5.85, 5.25)],
    ],
]
_MP_UNION_POLYS = [
    [[(11.05, 11.15), (13.95, 11.15), (13.95, 13.85), (11.05, 13.85),
      (11.05, 11.15)]],
]

_MP_WKT = "MULTIPOLYGON (" + ", ".join(
    "(" + ", ".join(
        "(" + ", ".join(f"{x} {y}" for x, y in ring) + ")"
        for ring in rings
    ) + ")"
    for rings in _MP_POLYS
) + ")"


def _shoelace_sql(ring):
    """SQL twin of geo._shoelace_2a's left fold for a FIXED ring."""
    terms = " + ".join(
        f"({x1!r} * {y2!r} - {x2!r} * {y1!r})"
        for (x1, y1), (x2, y2) in zip(ring, ring[1:])
    )
    return f"(0.0 + {terms})"


def _poly_area_sql(rings):
    outer = f"abs({_shoelace_sql(rings[0])}) / 2.0"
    if len(rings) == 1:
        return f"({outer} - 0.0)"
    holes = " + ".join(
        f"abs({_shoelace_sql(r)}) / 2.0" for r in rings[1:]
    )
    return f"({outer} - (0.0 + {holes}))"


def _mp_area_sql(polys):
    return "(0.0 + " + " + ".join(_poly_area_sql(p) for p in polys) + ")"


@register(
    "fn_geospatial_multipolygon",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS px,
         ((o_orderkey * 3) % 100) / 10.0 AS py,
         ((o_orderkey * 7) % 100) / 10.0 AS bx,
         ((o_orderkey * 13) % 100) / 10.0 AS by
  FROM orders WHERE o_orderkey < 300
)
SELECT k, px, py,
       {_ray_cast_holes_sql("px", "py",
                            [r for p in _MP_POLYS for r in p])} AS in_mp,
       {_ray_cast_holes_sql("px", "py",
                            [r for p in _MP_POLYS for r in p])} AS in_mp_wkt,
       '{_MP_WKT}' AS mp_text,
       round({_mp_area_sql(_MP_POLYS)}, 9) AS area_mp,
       'ST_MultiPolygon' AS gtype,
       3 AS gc_n,
       'ST_LineString' AS gc_type2,
       round(px, 9) AS gc_px,
       round({_mp_area_sql(_MP_POLYS + _MP_UNION_POLYS)}, 9) AS u_area,
       (CASE WHEN px = bx AND py = by THEN 2 ELSE 3 END) AS u_pts
FROM pts
""",
)
def fn_geospatial_multipolygon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTIPOLYGON + GEOMETRYCOLLECTION + ST_Union subset
    (GeoFunctions.java stContains/stArea on multi-geometries,
    stGeometryType/stNumGeometries/stGeometryN,
    GeometryType.java:23-29 standard names). Containment runs through
    BOTH doors — the typed array<array<array<point>>> literal and the
    WKT text parsed by st_multipolygon_from_text — and must agree
    with the oracle's edge-unrolled crossing parity over every ring
    of every member (even-odd across disjoint members + holes).
    ST_AsText round-trips the parse. Area = sum of outer-minus-holes
    shoelace areas, replayed as identical left-fold arithmetic in
    SQL. A per-row GEOMETRYCOLLECTION built from fixture coordinates
    parses into members (lookahead comma split), counts them, types
    member 2, and extracts member 1's x through the POINT parser.
    ST_Union covers the exactly-representable cases: disjoint-polygon
    union (member concat -> area adds) and point-set union (dedup
    count). All pure Column string/array expressions — scan-speed at
    100 TB, no UDFs, no shuffle."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    def ring_lit(vs):
        return F.array(*[geo.st_point(F.lit(x), F.lit(y)) for x, y in vs])

    def polys_lit(polys):
        return F.array(
            *[F.array(*[ring_lit(r) for r in rings]) for rings in polys]
        )

    k = F.col("o_orderkey")
    ax, ay = (k % 100) / 10.0, ((k * 3) % 100) / 10.0
    bx, by = ((k * 7) % 100) / 10.0, ((k * 13) % 100) / 10.0
    p = geo.st_point(ax, ay)
    mp_typed = polys_lit(_MP_POLYS)
    mp_parsed = geo.st_multipolygon_from_text(F.lit(_MP_WKT))

    def two(x, y):
        return F.concat(
            x.cast("double").cast("string"), F.lit(" "),
            y.cast("double").cast("string"),
        )

    gc = F.concat(
        F.lit("GEOMETRYCOLLECTION (POINT ("), two(ax, ay),
        F.lit("), LINESTRING (0 0, "), two(bx, by),
        F.lit("), POLYGON ((5.85 5.25, 9.05 5.45, 7.15 8.95, "
              "5.85 5.25)))"),
    )
    union_mp = geo.st_union_disjoint_polygons(
        mp_typed, polys_lit(_MP_UNION_POLYS)
    )
    pts_a = F.array(geo.st_point(ax, ay), geo.st_point(bx, by))
    pts_b = F.array(geo.st_point(bx, by), geo.st_point(F.lit(55.5), F.lit(55.5)))
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_x(p).alias("px"),
            geo.st_y(p).alias("py"),
            geo.st_contains_multipolygon(mp_typed, p).alias("in_mp"),
            geo.st_contains_multipolygon(mp_parsed, p).alias("in_mp_wkt"),
            geo.st_as_text_multipolygon(mp_parsed).alias("mp_text"),
            F.round(geo.st_area_multipolygon(mp_typed), 9).alias("area_mp"),
            geo.st_geometry_type(F.lit(_MP_WKT)).alias("gtype"),
            geo.st_num_geometries(gc).cast("int").alias("gc_n"),
            geo.st_geometry_type(geo.st_geometry_n(gc, 2)).alias("gc_type2"),
            F.round(
                geo.st_x(
                    geo.st_point_from_text(geo.st_geometry_n(gc, 1))
                ),
                9,
            ).alias("gc_px"),
            F.round(geo.st_area_multipolygon(union_mp), 9).alias("u_area"),
            F.size(geo.st_union_multipoint(pts_a, pts_b)).alias("u_pts"),
        )
    )


from presto_0_235_spark.functions.geo import (  # noqa: E402
    line_dist_sql as _line_dist_sql,
    polygon_dist_sql as _polygon_dist_sql,
)

_DIST_LINE_SQL = _line_dist_sql(
    "px", "py", [("0.0", "0.0"), ("ax", "ay"), ("bx", "by")]
)
_DIST_POLY_SQL = _polygon_dist_sql("px", "py", _MP_POLYS[0])


@register(
    "fn_geospatial_distance",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 100) / 10.0 AS px,
         ((o_orderkey * 3) % 100) / 10.0 AS py,
         ((o_orderkey * 7) % 100) / 10.0 AS ax,
         ((o_orderkey * 13) % 100) / 10.0 AS ay,
         ((o_orderkey * 11) % 100) / 10.0 AS bx,
         ((o_orderkey * 17) % 100) / 10.0 AS by
  FROM orders WHERE o_orderkey < 300
)
SELECT k, px, py,
       round({_DIST_LINE_SQL}, 9) AS d_line,
       ({_DIST_LINE_SQL} <= 1.5) AS in_line_buf,
       round({_DIST_POLY_SQL}, 9) AS d_poly
FROM pts
""",
)
def fn_geospatial_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General ST_Distance (GeoFunctions.java stDistance — the
    reference hands mixed geometry pairs to the Esri kernel; the
    point-vs-line and point-vs-polygon cases are closed forms over
    segments, functions/geo.py _seg_dist2: clamped projection onto
    each segment, min over segments). Also ST_Buffer CONTAINMENT for
    linestrings without constructing the capsule boundary — buffer
    membership IS distance <= r (st_line_buffer_contains), closing
    the line-buffer case st_buffer_point left open. Point-in-polygon
    distance is 0; a point inside a HOLE measures to the hole
    boundary. The oracle unrolls the identical clamp/projection
    arithmetic segment-by-segment. Pure Column math, O(vertices) per
    row, whole-stage codegen — scan-speed at 100 TB."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    px, py = (k % 100) / 10.0, ((k * 3) % 100) / 10.0
    ax, ay = ((k * 7) % 100) / 10.0, ((k * 13) % 100) / 10.0
    bx, by = ((k * 11) % 100) / 10.0, ((k * 17) % 100) / 10.0
    p = geo.st_point(px, py)
    line = F.array(
        geo.st_point(F.lit(0.0), F.lit(0.0)),
        geo.st_point(ax, ay),
        geo.st_point(bx, by),
    )
    poly = F.array(
        *[
            F.array(*[geo.st_point(F.lit(x), F.lit(y)) for x, y in ring])
            for ring in _MP_POLYS[0]
        ]
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_x(p).alias("px"),
            geo.st_y(p).alias("py"),
            F.round(geo.st_distance_point_line(p, line), 9).alias(
                "d_line"
            ),
            geo.st_line_buffer_contains(line, 1.5, p).alias(
                "in_line_buf"
            ),
            F.round(geo.st_distance_point_polygon(poly, p), 9).alias(
                "d_poly"
            ),
        )
    )


from presto_0_235_spark.functions.geo import (  # noqa: E402
    lines_intersect_sql as _lines_intersect_sql,
    ray_cast_sql as _rc_sql,
)

_LINE_A = [("0.0", "0.0"), ("ax", "ay"), ("bx", "by")]
_LINE_B = [("10.0", "0.0"), ("cx", "cy"), ("0.0", "10.0")]
_TRI_SHIFT = [
    ("(0.05 + tx)", "(0.15 + ty)"),
    ("(1.45 + tx)", "(0.35 + ty)"),
    ("(0.65 + tx)", "(1.55 + ty)"),
    ("(0.05 + tx)", "(0.15 + ty)"),
]
_PP_SQL = (
    "("
    + _lines_intersect_sql(_HEX_RING, _TRI_SHIFT)
    + " OR "
    + _rc_sql("(0.05 + tx)", "(0.15 + ty)", _HEX_RING)
    + " OR "
    + _rc_sql("1.15", "1.05", _TRI_SHIFT)
    + ")"
)


@register(
    "fn_geospatial_intersects",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS k,
         ((o_orderkey * 7) % 100) / 10.0 AS ax,
         ((o_orderkey * 13) % 100) / 10.0 AS ay,
         ((o_orderkey * 11) % 100) / 10.0 AS bx,
         ((o_orderkey * 17) % 100) / 10.0 AS by,
         ((o_orderkey * 19) % 100) / 10.0 AS cx,
         ((o_orderkey * 23) % 100) / 10.0 AS cy,
         ((o_orderkey * 7) % 110) / 10.0 AS tx,
         ((o_orderkey * 3) % 110) / 10.0 AS ty
  FROM orders WHERE o_orderkey < 300
)
SELECT k,
       {_lines_intersect_sql(_LINE_A, _LINE_B)} AS ll_int,
       {_PP_SQL} AS pp_int
FROM pts
""",
)
def fn_geospatial_intersects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Intersects for the segment-arithmetic cases
    (GeoFunctions.java stIntersects — Esri-backed in the reference;
    here exact orientation-sign products with collinear cases
    resolved by bbox overlap, functions/geo.py _segs_intersect).
    Line/line: any segment pair of two per-row 2-segment linestrings.
    Polygon/polygon: boundary edges cross OR either polygon contains
    the other's first vertex — probed by sweeping a triangle across
    a fixed non-convex hexagon (overlapping, nested, and disjoint
    placements all occur over the key range). The oracle unrolls the
    identical orientation arithmetic per segment pair. Touching
    endpoints land on the collinear/zero-orientation branch — exact
    in doubles, identical on both engines."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    ax, ay = ((k * 7) % 100) / 10.0, ((k * 13) % 100) / 10.0
    bx, by = ((k * 11) % 100) / 10.0, ((k * 17) % 100) / 10.0
    cx, cy = ((k * 19) % 100) / 10.0, ((k * 23) % 100) / 10.0
    tx, ty = ((k * 7) % 110) / 10.0, ((k * 3) % 110) / 10.0
    line_a = F.array(
        geo.st_point(F.lit(0.0), F.lit(0.0)),
        geo.st_point(ax, ay),
        geo.st_point(bx, by),
    )
    line_b = F.array(
        geo.st_point(F.lit(10.0), F.lit(0.0)),
        geo.st_point(cx, cy),
        geo.st_point(F.lit(0.0), F.lit(10.0)),
    )
    hexagon = F.array(
        *[geo.st_point(F.lit(x), F.lit(y)) for x, y in _HEX_RING]
    )
    tri = F.array(
        geo.st_point(F.lit(0.05) + tx, F.lit(0.15) + ty),
        geo.st_point(F.lit(1.45) + tx, F.lit(0.35) + ty),
        geo.st_point(F.lit(0.65) + tx, F.lit(1.55) + ty),
        geo.st_point(F.lit(0.05) + tx, F.lit(0.15) + ty),
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.st_intersects_lines(line_a, line_b).alias("ll_int"),
            geo.st_intersects_polygons(hexagon, tri).alias("pp_int"),
        )
    )


@register(
    "fn_bing_tiles",
    oracle="""
WITH pts AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 160) / 2.0 - 40.0 AS lat,
         ((o_orderkey * 7) % 680) / 2.0 - 170.0 AS lon
  FROM orders WHERE o_orderkey < 300
),
tiles AS (
  SELECT k, lat, lon,
         CAST(floor(floor(least(greatest(((lon + 180.0) / 360.0)
                 * (256.0 * 2.0^12), 0.0), 256.0 * 2.0^12 - 1)) / 256)
              AS BIGINT) AS tx,
         CAST(floor(floor(least(greatest((0.5
                 - ln((1.0 + sin(lat * pi() / 180.0))
                      / (1.0 - sin(lat * pi() / 180.0))) / (4.0 * pi()))
                 * (256.0 * 2.0^12), 0.0), 256.0 * 2.0^12 - 1)) / 256)
              AS BIGINT) AS ty
  FROM pts
)
SELECT k, tx, ty,
       list_aggregate(
         [(CAST(floor(tx / 2.0^(12 - i)) AS BIGINT) % 2
           + 2 * (CAST(floor(ty / 2.0^(12 - i)) AS BIGINT) % 2))::VARCHAR
          for i in range(1, 13)], 'string_agg', '') AS quadkey,
       ty + tx * 4294967296 + 12 * 67108864 AS encoded,
       TRUE AS decode_roundtrip,
       TRUE AS quadkey_roundtrip,
       (CASE WHEN tx = 0 OR tx = 4095 THEN 2 ELSE 3 END)
         * (CASE WHEN ty = 0 OR ty = 4095 THEN 2 ELSE 3 END) AS n_around,
       round(360.0 * (least(tx * 256.0, 256.0 * 2.0^12)
                      / (256.0 * 2.0^12) - 0.5), 9) AS env_west,
       round(90.0 - 360.0 * atan(exp(-(0.5 - least(ty * 256.0,
                 256.0 * 2.0^12) / (256.0 * 2.0^12)) * 2.0 * pi()))
               / pi(), 9) AS env_north
FROM tiles
""",
)
def fn_bing_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bing tile family (presto-geospatial BingTileFunctions.java:
    bing_tile/bing_tile_at:185/bing_tile_quadkey:129/
    bing_tiles_around:200/bing_tile_polygon:366 + the
    BingTile.java:165 bigint encoding) — the reference's quadkey
    spatial-indexing scheme as pure Column arithmetic at zoom 12.
    Roundtrips are pinned IN the engine (encode->decode and
    quadkey->parse both recover (x, y), emitted as booleans); the
    oracle recomputes tile coordinates, quadkey, packed encoding,
    neighbor count, and the envelope corner from the same Mercator
    formulas."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    lat = (k % 160) / 2.0 - 40.0
    lon = ((k * 7) % 680) / 2.0 - 170.0
    zoom = F.lit(12)
    tile = geo.bing_tile_at(lat, lon, zoom)
    encoded = geo.bing_tile_encode(tile)
    decoded = geo.bing_tile_decode(encoded)
    qk = geo.bing_tile_quadkey(tile)
    reparsed = geo.bing_tile_from_quadkey(qk)
    ring = geo.bing_tile_polygon(tile)
    nw = F.element_at(ring, 1)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            geo.bing_tile_x(tile).cast("bigint").alias("tx"),
            geo.bing_tile_y(tile).cast("bigint").alias("ty"),
            qk.alias("quadkey"),
            encoded.alias("encoded"),
            (
                (geo.bing_tile_x(decoded) == geo.bing_tile_x(tile))
                & (geo.bing_tile_y(decoded) == geo.bing_tile_y(tile))
                & (geo.bing_tile_zoom_level(decoded) == 12)
            ).alias("decode_roundtrip"),
            (
                (geo.bing_tile_x(reparsed) == geo.bing_tile_x(tile))
                & (geo.bing_tile_y(reparsed) == geo.bing_tile_y(tile))
            ).alias("quadkey_roundtrip"),
            F.size(geo.bing_tiles_around(lat, lon, zoom)).alias("n_around"),
            F.round(geo.st_x(nw), 9).alias("env_west"),
            F.round(geo.st_y(nw), 9).alias("env_north"),
        )
    )


@register(
    "fn_scalar_gaps2",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k, o_orderpriority AS s, o_orderdate,
         [ascii(substr(o_orderpriority, i, 1))
          for i in range(1, length(o_orderpriority) + 1)] AS bytes,
         '10.' || (o_orderkey % 200)::VARCHAR || '.'
               || ((o_orderkey * 3) % 256)::VARCHAR || '.'
               || ((o_orderkey * 7) % 256)::VARCHAR AS addr
  FROM orders WHERE o_orderkey < 300
),
f AS (
  SELECT *,
    list_reduce(list_prepend(2166136261, bytes),
      (acc, x) -> xor((acc * 16777619) % 4294967296, x)) AS u32,
    list_reduce(list_prepend(2166136261, bytes),
      (acc, x) -> (xor(acc, x) * 16777619) % 4294967296) AS u32a,
    list_reduce(list_prepend(14695981039346656037::HUGEINT,
                             [b::HUGEINT for b in bytes]),
      (acc, x) -> xor((acc * 1099511628211::HUGEINT)
                      % 18446744073709551616::HUGEINT, x)) AS u64,
    list_reduce(list_prepend(14695981039346656037::HUGEINT,
                             [b::HUGEINT for b in bytes]),
      (acc, x) -> (xor(acc, x) * 1099511628211::HUGEINT)
                  % 18446744073709551616::HUGEINT) AS u64a,
    (k % 200) * 65536 + ((k * 3) % 256) * 256 + ((k * 7) % 256) AS low24
  FROM src
)
SELECT k,
  CASE WHEN u32 >= 2147483648 THEN u32 - 4294967296 ELSE u32 END AS fnv32,
  CASE WHEN u32a >= 2147483648 THEN u32a - 4294967296 ELSE u32a END
    AS fnv1a32,
  CAST(CASE WHEN u64 >= 9223372036854775808::HUGEINT
            THEN u64 - 18446744073709551616::HUGEINT ELSE u64 END
       AS BIGINT) AS fnv64,
  CAST(CASE WHEN u64a >= 9223372036854775808::HUGEINT
            THEN u64a - 18446744073709551616::HUGEINT ELSE u64a END
       AS BIGINT) AS fnv1a64,
  CAST((31::HUGEINT * k + (k * 37 % 1000)
        + 9223372036854775808::HUGEINT)
       % 18446744073709551616::HUGEINT
       - 9223372036854775808::HUGEINT AS BIGINT) AS ch,
  CASE WHEN strpos(reverse(s), 'E') = 0 THEN 0
       ELSE length(s) - strpos(reverse(s), 'E') + 1 END AS rp,
  hex(from_base64(translate(
    replace(replace(to_base64(s::BLOB), '+', '-'), '/', '_'),
    '-_', '+/'))) AS b64u_hex,
  'p q/' || s AS url_decoded,
  CAST(DATE '1997-03-01' + INTERVAL ((k % 9)) DAY AS DATE) AS iso_d,
  CAST(k % 1000 AS BIGINT) AS ms,
  CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS yow,
  CAST(5 AS BIGINT) AS tzh, CAST(30 AS BIGINT) AS tzm,
  CAST(-(epoch(timezone('America/New_York', o_orderdate))
         - epoch(o_orderdate)) / 3600 AS BIGINT) AS tzh_ny,
  '10.' || (k % 200)::VARCHAR || '.0.0 - 10.' || (k % 200)::VARCHAR
        || '.63.255' AS subnet_range,
  ((k * 3) % 256) < 64 AS in_own_18,
  (k % 200) < 128 AS in_second_octet_band,
  ((k % 5) = 3) AS json_has_3, TRUE AS json_has_b,
  NULL::BOOLEAN AS json_malformed,
  'double' AS type_price, 'bigint' AS type_key
FROM f
""",
)
def fn_scalar_gaps2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-function completeness sweep #2 — the last scalars
    from the reference's BuiltInFunctionNamespaceManager list with
    no prior carrier: fnv1_32/fnv1a_32 (pure Column byte folds,
    VarbinaryFunctions.java:342,358), fnv1_64/fnv1a_64 (Arrow UDFs
    — 64-bit wraparound multiply, VarbinaryFunctions.java:350,366;
    all four verified against the standard FNV test vectors in
    tests), combine_hash with Java 64-bit wraparound
    (CombineHashFunction.java:28, DECIMAL(38) mod arithmetic),
    strrpos, from_base64url (RFC 4648 URL alphabet), url_decode,
    from_iso8601_date, millisecond, year_of_week,
    timezone_hour/minute (fixed-offset AND DST-varying zones),
    ip_subnet_range / is_subnet_of for v4 prefixes
    (IpPrefixFunctions.java:115,126), typed json_array_contains
    incl. NULL-on-malformed (JsonFunctions.java), and typeof
    (TypeOfFunction.java)."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions.udfs import fnv1_64, fnv1a_64

    k = F.col("o_orderkey")
    s = F.col("o_orderpriority")
    b = s.cast("binary")
    df = load_table(spark, sf_dir, "orders").filter(k < 300)
    addr = F.concat(
        F.lit("10."), (k % 200).cast("string"), F.lit("."),
        ((k * 3) % 256).cast("string"), F.lit("."),
        ((k * 7) % 256).cast("string"),
    )
    own_18 = F.concat(
        F.lit("10."), (k % 200).cast("string"), F.lit(".0.0/18")
    )
    ts_ms = F.timestamp_millis(
        F.unix_millis(F.col("o_orderdate").cast("timestamp"))
        + F.pmod(k, F.lit(1000))
    )
    return df.select(
        k.alias("k"),
        ps.fnv1_32(b).alias("fnv32"),
        ps.fnv1a_32(b).alias("fnv1a32"),
        fnv1_64(b).alias("fnv64"),
        fnv1a_64(b).alias("fnv1a64"),
        ps.combine_hash(k, F.pmod(k * 37, F.lit(1000))).alias("ch"),
        ps.strrpos(s, "E").alias("rp"),
        F.hex(ps.from_base64url(
            F.translate(F.base64(b), "+/", "-_")
        )).alias("b64u_hex"),
        ps.url_decode_(F.concat(F.lit("p%20q%2F"), s)).alias(
            "url_decoded"
        ),
        ps.from_iso8601_date(
            F.concat(F.lit("1997-03-0"), (k % 9 + 1).cast("string"))
        ).alias("iso_d"),
        ps.millisecond_(ts_ms).alias("ms"),
        ps.year_of_week("o_orderdate").alias("yow"),
        ps.timezone_hour(F.col("o_orderdate").cast("timestamp"), "Asia/Kolkata").alias("tzh"),
        ps.timezone_minute(F.col("o_orderdate").cast("timestamp"), "Asia/Kolkata").alias("tzm"),
        ps.timezone_hour(F.col("o_orderdate").cast("timestamp"), "America/New_York").alias(
            "tzh_ny"
        ),
        F.array_join(ps.ip_subnet_range_v4(own_18), " - ").alias(
            "subnet_range"
        ),
        ps.is_subnet_of_v4(own_18, addr).alias("in_own_18"),
        ps.is_prefix_subnet_of_v4(
            F.lit("10.0.0.0/9"), own_18
        ).alias("in_second_octet_band"),
        ps.json_array_contains(
            F.concat(F.lit("[1, 2, "), (k % 5).cast("string"), F.lit("]")),
            3,
        ).alias("json_has_3"),
        ps.json_array_contains(F.lit('["a", "b"]'), "b").alias(
            "json_has_b"
        ),
        ps.json_array_contains(F.lit("not json"), "b").alias(
            "json_malformed"
        ),
        ps.typeof_(df, "o_totalprice").alias("type_price"),
        ps.typeof_(df, "o_orderkey").alias("type_key"),
    )


@register(
    "fn_time_type",
    oracle="""
WITH t AS (
  SELECT o_orderkey AS k,
         (o_orderkey * 37137) % 86400000 AS m,
         (o_orderkey * 9901) % 86400000 AS m2
  FROM orders WHERE o_orderkey < 400
)
SELECT k, m,
       lpad(CAST(CAST(floor(m / 3600000) AS BIGINT) AS VARCHAR), 2, '0')
         || ':'
         || lpad(CAST(CAST(floor((m % 3600000) / 60000) AS BIGINT)
                      AS VARCHAR), 2, '0') || ':'
         || lpad(CAST(CAST(floor((m % 60000) / 1000) AS BIGINT)
                      AS VARCHAR), 2, '0') || '.'
         || lpad(CAST(m % 1000 AS VARCHAR), 3, '0') AS rendered,
       CAST(floor(m / 3600000) AS BIGINT) AS hour_of,
       CAST(floor((m % 3600000) / 60000) AS BIGINT) AS minute_of,
       CAST(floor((m % 60000) / 1000) AS BIGINT) AS second_of,
       CAST(m % 1000 AS BIGINT) AS milli_of,
       TRUE AS parse_roundtrip,
       (m < m2) AS lt_other
FROM t
""",
)
def fn_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain TIME type semantics (SPI/type/TimeType.java — the last
    §1.2 temporal type without a pinned carrier; TIME WITH TIME ZONE
    is fn_char_time_tz). Presto's TIME is millis since midnight in a
    long; Spark has no TIME type, so the engine carries the SAME
    representation: a bigint millis value with render
    ('HH:MM:SS.mmm'), field extraction (hour/minute/second/
    millisecond as integer divisions), a parse->render roundtrip
    pinned in-engine, and ordering on the underlying millis —
    exactly the reference's comparison (TimeType operators compare
    the long). Everything is integer Column arithmetic replayed
    identically by the oracle."""
    ensure_session_defaults(spark)
    k = F.col("o_orderkey")
    m = (k * 37137) % 86400000
    m2 = (k * 9901) % 86400000

    def two(x):
        return F.lpad(x.cast("string"), 2, "0")

    hour = F.floor(m / F.lit(3600000)).cast("bigint")
    minute = F.floor((m % 3600000) / F.lit(60000)).cast("bigint")
    second = F.floor((m % 60000) / F.lit(1000)).cast("bigint")
    rendered = F.concat(
        two(hour), F.lit(":"),
        two(minute), F.lit(":"),
        two(second), F.lit("."),
        F.lpad((m % 1000).cast("string"), 3, "0"),
    )
    # parse back: split on :/. and recombine — the TIME literal parser
    parts = F.split(rendered, r"[:.]")
    reparsed = (
        parts[0].cast("bigint") * 3600000
        + parts[1].cast("bigint") * 60000
        + parts[2].cast("bigint") * 1000
        + parts[3].cast("bigint")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 400)
        .select(
            k.alias("k"),
            m.alias("m"),
            rendered.alias("rendered"),
            hour.alias("hour_of"),
            minute.alias("minute_of"),
            second.alias("second_of"),
            (m % 1000).cast("bigint").alias("milli_of"),
            (reparsed == m).alias("parse_roundtrip"),
            (m < m2).alias("lt_other"),
        )
    )


_BT_MAP = "1048576.0"  # 256 * 2^12 — zoom 12 map size in pixels


def _bt_tx(lon: str) -> str:
    return (
        f"CAST(floor(floor(least(greatest((({lon}) + 180.0) / 360.0"
        f" * {_BT_MAP}, 0.0), {_BT_MAP} - 1)) / 256) AS BIGINT)"
    )


def _bt_ty(lat: str) -> str:
    return (
        f"CAST(floor(floor(least(greatest((0.5 - ln((1.0 + sin(({lat})"
        f" * pi() / 180.0)) / (1.0 - sin(({lat}) * pi() / 180.0)))"
        f" / (4.0 * pi())) * {_BT_MAP}, 0.0), {_BT_MAP} - 1)) / 256)"
        f" AS BIGINT)"
    )


def _bt_corner_lon(x: str) -> str:
    return f"(360.0 * (least(({x}) * 256.0, {_BT_MAP}) / {_BT_MAP} - 0.5))"


def _bt_corner_lat(y: str) -> str:
    return (
        f"(90.0 - 360.0 * atan(exp(-(0.5 - least(({y}) * 256.0,"
        f" {_BT_MAP}) / {_BT_MAP}) * 2.0 * pi())) / pi())"
    )


@register(
    "fn_bing_tiles_cover",
    oracle=f"""
WITH env AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 140) / 2.0 - 35.0 AS lat0,
         (o_orderkey % 140) / 2.0 - 35.0 + 0.3 AS lat1,
         -170.0 + ((o_orderkey * 7) % 960) * 0.3515625 AS lon0,
         -170.0 + ((o_orderkey * 7) % 960) * 0.3515625
           + (CASE WHEN o_orderkey % 3 = 0 THEN 0.703125
                   ELSE 0.7 END) AS lon1
  FROM orders WHERE o_orderkey < 300
),
corners AS (
  SELECT k, lat0, lon1,
         {_bt_tx('lon0')} AS x1, {_bt_ty('lat1')} AS y1,
         {_bt_tx('lon1')} AS rx, {_bt_ty('lat0')} AS ry
  FROM env
),
shifted AS (
  SELECT k, x1, y1,
         CASE WHEN rx > x1 AND {_bt_corner_lon('rx')} = lon1
              THEN rx - 1 ELSE rx END AS x2,
         CASE WHEN ry > y1 AND {_bt_corner_lat('ry')} = lat0
              THEN ry - 1 ELSE ry END AS y2
  FROM corners
)
SELECT k, x1, y1, x2, y2,
       (x2 - x1 + 1) * (y2 - y1 + 1) AS n_tiles,
       (x1 + x2) * (x2 - x1 + 1) // 2 * (y2 - y1 + 1) AS sum_x,
       (y1 + y2) * (y2 - y1 + 1) // 2 * (x2 - x1 + 1) AS sum_y
FROM shifted
""",
)
def fn_bing_tiles_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometry_to_bing_tiles — the envelope covering grid
    (BingTileFunctions.java:378; points/rectangles take the pure
    tile-range branch, :401-414 border-touch shrink): tiles from the
    (lat_max, lon_min) tile to the (lat_min, lon_max) tile, with the
    lower-right tile retreating when its upper-left corner falls
    exactly on the envelope border. Envelope longitudes sit ON the
    zoom-12 tile grid (0.3515625° steps) and every third row's east
    edge lands exactly on a border, so the shrink branch is
    genuinely exercised and the exact-double corner comparison is
    replayable. The oracle pins the corner tiles plus tile count and
    the row-major coordinate sums in closed form — the enumeration
    itself, not just its envelope."""
    ensure_session_defaults(spark)
    from presto_0_235_spark.functions import geo

    k = F.col("o_orderkey")
    lat0 = (k % 140) / 2.0 - 35.0
    lat1 = lat0 + 0.3
    lon0 = F.lit(-170.0) + ((k * 7) % 960) * 0.3515625
    lon1 = lon0 + F.when(k % 3 == 0, F.lit(0.703125)).otherwise(
        F.lit(0.7)
    )
    tiles = geo.geometry_to_bing_tiles_envelope(
        lat0, lat1, lon0, lon1, F.lit(12)
    )
    first = F.element_at(tiles, 1)
    last = F.element_at(tiles, F.size(tiles))
    zero = F.lit(0).cast("bigint")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 300)
        .select(
            k.alias("k"),
            first.getField("x").cast("bigint").alias("x1"),
            first.getField("y").cast("bigint").alias("y1"),
            last.getField("x").cast("bigint").alias("x2"),
            last.getField("y").cast("bigint").alias("y2"),
            F.size(tiles).cast("bigint").alias("n_tiles"),
            F.aggregate(
                tiles, zero, lambda acc, t: acc + t.getField("x")
            ).alias("sum_x"),
            F.aggregate(
                tiles, zero, lambda acc, t: acc + t.getField("y")
            ).alias("sum_y"),
        )
    )


# ---------------------------------------------------------------------------
# Polygon clipping (round 8): overlapping ST_Union / ST_Intersection and
# polygon-boundary ST_Buffer — the last §2.9 geometry gap
# (GeoFunctions.java stUnion / stIntersection / stBuffer; kernel in
# functions/geo_clip.py, Greiner–Hormann).
# ---------------------------------------------------------------------------


@register(
    "fn_geospatial_union",
    oracle="""
WITH rects AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 7 AS DOUBLE) AS ax1,
         CAST(o_orderkey % 5 AS DOUBLE) AS ay1,
         CAST(o_orderkey % 7 + 2 + o_orderkey % 3 AS DOUBLE) AS ax2,
         CAST(o_orderkey % 5 + 2 + o_orderkey % 4 AS DOUBLE) AS ay2,
         (o_orderkey * 3) % 8 + 0.5 AS bx1,
         (o_orderkey * 2) % 6 + 0.5 AS by1,
         (o_orderkey * 3) % 8 + 1.5 + o_orderkey % 4 AS bx2,
         (o_orderkey * 2) % 6 + 1.5 + (o_orderkey * 2) % 5 AS by2
  FROM orders WHERE o_orderkey < 400
),
m AS (
  SELECT *,
         GREATEST(0, LEAST(ax2, bx2) - GREATEST(ax1, bx1)) AS ov_w,
         GREATEST(0, LEAST(ay2, by2) - GREATEST(ay1, by1)) AS ov_h
  FROM rects
)
SELECT k,
       round(ov_w * ov_h, 9) AS inter_area,
       round((ax2 - ax1) * (ay2 - ay1)
             + (bx2 - bx1) * (by2 - by1) - ov_w * ov_h, 9) AS union_area,
       CAST(CASE WHEN ov_w > 0 AND ov_h > 0 THEN 1 ELSE 2 END
            AS INT) AS n_rings
FROM m
""",
)
def fn_geospatial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Union / ST_Intersection of OVERLAPPING polygons
    (GeoFunctions.java stUnion/stIntersection — r7 could only union
    disjoint geometries). Each row builds two axis-aligned rectangles
    in general position (integer vs half-integer coordinates, so no
    degenerate shared edges), runs the Greiner–Hormann kernel BOTH
    ways, and emits the intersection area, union area, and union
    ring count. The oracle computes the same quantities in closed
    form (rectangle overlap algebra + inclusion-exclusion) — a true
    differential check of the kernel's output geometry, since the
    shoelace area of a wrong ring would not match.

    Scale: the kernel runs per-row inside Arrow mapInPandas batches
    on executors; no shuffle beyond the scan."""
    ensure_session_defaults(spark)
    import pandas as pd

    from presto_0_235_spark.functions import geo_clip as gc

    rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 400)
        .select(F.col("o_orderkey").alias("k"))
    )

    def compute(batches):
        for pdf in batches:
            out = []
            for k in pdf["k"]:
                k = int(k)
                ax1, ay1 = float(k % 7), float(k % 5)
                ax2 = ax1 + 2 + k % 3
                ay2 = ay1 + 2 + k % 4
                bx1 = (k * 3) % 8 + 0.5
                by1 = (k * 2) % 6 + 0.5
                bx2 = bx1 + 1 + k % 4
                by2 = by1 + 1 + (k * 2) % 5
                A = [(ax1, ay1), (ax2, ay1), (ax2, ay2), (ax1, ay2)]
                B = [(bx1, by1), (bx2, by1), (bx2, by2), (bx1, by2)]
                inter = gc.intersection_area(A, B)
                rings = gc.union_rings(A, B)
                union = sum(abs(gc.polygon_area(r)) for r in rings)
                out.append(
                    (k, round(inter, 9), round(union, 9), len(rings))
                )
            yield pd.DataFrame(
                out,
                columns=["k", "inter_area", "union_area", "n_rings"],
            )

    return rows.mapInPandas(
        compute,
        "k bigint, inter_area double, union_area double, n_rings int",
    )


@register(
    "fn_geospatial_union_holed",
    oracle="""
WITH g AS (
  SELECT o_orderkey AS k,
         CAST(6 + o_orderkey % 3 AS DOUBLE) AS saw,
         CAST(6 + o_orderkey % 4 AS DOUBLE) AS sah,
         CAST(2 + o_orderkey % 2 AS DOUBLE) AS har,
         CAST(2 + o_orderkey % 3 AS DOUBLE) AS hat,
         (o_orderkey * 3) % 5 + 0.5 AS c,
         (o_orderkey * 2) % 5 + 0.5 AS d
  FROM orders WHERE o_orderkey < 300
),
terms AS (
  SELECT k,
         saw * sah - (har - 1) * (hat - 1) AS area_a,
         16.0 - 1.0 AS area_b,
         GREATEST(0, LEAST(saw, c + 4) - GREATEST(0, c))
           * GREATEST(0, LEAST(sah, d + 4) - GREATEST(0, d)) AS sasb,
         GREATEST(0, LEAST(saw, c + 2.25) - GREATEST(0, c + 1.25))
           * GREATEST(0, LEAST(sah, d + 2.25) - GREATEST(0, d + 1.25))
           AS sahb,
         GREATEST(0, LEAST(har, c + 4) - GREATEST(1, c))
           * GREATEST(0, LEAST(hat, d + 4) - GREATEST(1, d)) AS hasb,
         GREATEST(0, LEAST(har, c + 2.25) - GREATEST(1, c + 1.25))
           * GREATEST(0, LEAST(hat, d + 2.25) - GREATEST(1, d + 1.25))
           AS hahb
  FROM g
)
SELECT k,
       round(sasb - sahb - hasb + hahb, 9) AS inter_area,
       round(area_a + area_b - (sasb - sahb - hasb + hahb), 9)
         AS union_area
FROM terms
""",
)
def fn_geospatial_union_holed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Union / ST_Intersection areas for polygons WITH HOLES (r10,
    VERDICT missing #4 — GeoFunctions.java stUnion/stIntersection
    handle holed Esri polygons; the r8 kernel scoped them out). Each
    row builds polygon A = integer-grid shell minus an integer-grid
    hole, polygon B = half-integer shell minus a quarter-integer hole
    (three distinct coordinate lattices, so every ring pair is in
    general position), runs the exact inclusion-exclusion
    decomposition in functions/geo_clip.py, and compares against the
    same algebra in closed-form SQL — every term is an axis-aligned
    rectangle overlap, so the oracle is exact.

    Scale: per-row kernel inside Arrow mapInPandas on executors; no
    shuffle beyond the scan."""
    ensure_session_defaults(spark)
    import pandas as pd

    from presto_0_235_spark.functions import geo_clip as gc

    rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 300)
        .select(F.col("o_orderkey").alias("k"))
    )

    def rect(x1, y1, x2, y2):
        return [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]

    def compute(batches):
        for pdf in batches:
            out = []
            for k in pdf["k"]:
                k = int(k)
                saw, sah = 6.0 + k % 3, 6.0 + k % 4
                har, hat = 2.0 + k % 2, 2.0 + k % 3
                c = (k * 3) % 5 + 0.5
                d = (k * 2) % 5 + 0.5
                A = [rect(0, 0, saw, sah), rect(1, 1, har, hat)]
                B = [
                    rect(c, d, c + 4, d + 4),
                    rect(c + 1.25, d + 1.25, c + 2.25, d + 2.25),
                ]
                inter = gc.intersection_area_holed(A, B)
                union = gc.union_area_holed(A, B)
                out.append((k, round(inter, 9), round(union, 9)))
            yield pd.DataFrame(
                out, columns=["k", "inter_area", "union_area"]
            )

    return rows.mapInPandas(
        compute, "k bigint, inter_area double, union_area double"
    )


@register(
    "fn_geospatial_buffer",
    oracle="""
SELECT o_orderkey AS k,
       CAST(0.30 + 0.15 * (o_orderkey % 9) AS DOUBLE) AS alpha_edge,
       CAST(0.30 + 0.15 * ((o_orderkey * 5) % 9) AS DOUBLE)
         AS alpha_corner,
       0.30 + 0.15 * (o_orderkey % 9) <= 1.0 AS edge_in_buffer,
       0.30 + 0.15 * ((o_orderkey * 5) % 9) <= 1.0 AS corner_in_buffer
FROM orders WHERE o_orderkey < 400
""",
)
def fn_geospatial_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-boundary ST_Buffer (GeoFunctions.java stBuffer — r7
    covered only point and line buffers). Each row buffers a convex
    pentagon by r = 1 via exact edge offsetting + 48-gon round
    joins (functions/geo_clip.buffer_convex), then classifies two
    probe points by ray-cast membership in the CONSTRUCTED buffer
    polygon: one placed an exact alpha*r beyond an edge midpoint
    along its outward normal (nearest feature: that edge — offset
    exactly, so membership is alpha <= 1 with no discretization
    error), one placed alpha*r beyond a vertex along its angle
    bisector (nearest feature: the vertex; the inscribed arc chord
    sits at r*cos(pi/48) = 0.9979r, and the alpha grid
    {0.30 .. 1.50 step 0.15} stays clear of that band). The oracle
    is the closed-form membership law alpha <= 1 — geometry theory
    as the differential check.

    Scale: per-row kernel inside Arrow mapInPandas; no shuffle."""
    ensure_session_defaults(spark)
    import math

    import pandas as pd

    from presto_0_235_spark.functions import geo_clip as gc

    rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 400)
        .select(F.col("o_orderkey").alias("k"))
    )

    def compute(batches):
        R, r = 5.0, 1.0
        for pdf in batches:
            out = []
            for k in pdf["k"]:
                k = int(k)
                cx, cy = float(k % 11), float(k % 13)
                penta = [
                    (
                        cx + R * math.cos(math.pi / 2 + 2 * math.pi * i / 5),
                        cy + R * math.sin(math.pi / 2 + 2 * math.pi * i / 5),
                    )
                    for i in range(5)
                ]
                buf = gc.buffer_convex(penta, r)
                a_e = 0.30 + 0.15 * (k % 9)
                a_c = 0.30 + 0.15 * ((k * 5) % 9)
                # edge probe: midpoint of edge 0 + alpha*r along the
                # outward normal
                (x1, y1), (x2, y2) = penta[0], penta[1]
                mx, my = (x1 + x2) / 2, (y1 + y2) / 2
                dx, dy = x2 - x1, y2 - y1
                ln = math.hypot(dx, dy)
                nx, ny = dy / ln, -dx / ln
                pe = (mx + a_e * r * nx, my + a_e * r * ny)
                # corner probe: vertex 2 + alpha*r along the outward
                # bisector (for a regular polygon: away from center)
                vx, vy = penta[2]
                bx, by = vx - cx, vy - cy
                bl = math.hypot(bx, by)
                pc = (vx + a_c * r * bx / bl, vy + a_c * r * by / bl)
                out.append(
                    (
                        k,
                        round(a_e, 9),
                        round(a_c, 9),
                        gc.point_in_polygon(pe, buf),
                        gc.point_in_polygon(pc, buf),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "k", "alpha_edge", "alpha_corner",
                    "edge_in_buffer", "corner_in_buffer",
                ],
            )

    return rows.mapInPandas(
        compute,
        "k bigint, alpha_edge double, alpha_corner double, "
        "edge_in_buffer boolean, corner_in_buffer boolean",
    )
