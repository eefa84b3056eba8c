"""The driver-facing query registry: every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators) as a
(Spark DataFrame function, DuckDB oracle SQL) pair.

Cross-engine determinism rules used throughout (verified empirically,
see tests/test_entry.py which runs the same comparison as the driver):

* **time**: testdata timestamps may arrive as long-ns (TIMESTAMP(NANOS)
  under ``nanosAsLong``) or as TIMESTAMP/TIMESTAMP_NTZ (µs precision) —
  the driver has shipped both.  Every query goes through the
  dtype-adaptive helpers ``_us``/``_sec``/``_ns``/``_ts_pred_*`` which
  branch on the actual column dtype, so output is bit-identical for
  either encoding (pinned by tests/test_ts_dtypes.py).  All outputs use
  epoch *microseconds* as bigint == DuckDB ``epoch_us(ts)``.
* **money/aggregates**: cast to DECIMAL before SUM (exact, order-
  independent), cast the final result to DOUBLE — bit-identical.
* **array math**: dot products / norms are sequential left-to-right
  folds in double on both engines (Spark ``aggregate``/``zip_with``,
  DuckDB ``list_reduce``/``list_transform``) — bit-identical.
* **integer outputs**: computed ints are cast to bigint (DuckDB's
  natural integer width).
* **top-k**: always ranked by (measure, unique id) so selection is
  total-ordered; ranks cast to bigint.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.timeseries import epoch_ns, epoch_sec, epoch_us, nan_sum
from .operators import dedup, downsample, similarity, text
from .plans import tokenized_shards
from .sources import influx as influx_src

# epoch-microsecond literals (UTC)
US = 1_000_000
T_2024_01_05 = 1_704_412_800 * US
T_2024_01_10 = 1_704_844_800 * US
T_1998_09_02 = 904_694_400 * US
T_1995_03_15 = 795_225_600 * US
T_1996_01_01 = 820_454_400 * US
T_1997_01_01 = 852_076_800 * US
# chunk length for chunk-parallel per-series windows (operators/chunkwin.py)
WEEK_US = 7 * 86400 * US

EN_LIST_SQL = "'" + "','".join(text.EN_STOPWORDS) + "'"
ES_LIST_SQL = "'" + "','".join(text.ES_STOPWORDS) + "'"


#: per-session memo of table SCAN PLANS (lazy DataFrames), weakly
#: keyed by session — see :func:`load`.  This is the moral equivalent
#: of registering the tables in a catalog once per session: it holds
#: schema/file-listing METADATA only (a DataFrame is an unexecuted
#:  plan — zero rows live here), every action still reads the parquet
#: data from disk, and no result or intermediate is ever stored.
#: Eagerly initialized (ADVICE r14): a lazy ``is None`` check could
#: race under multi-threaded first construction and drop entries.
import weakref as _weakref

_LOAD_PLAN_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table.  Timestamp columns may be either
    TIMESTAMP(NANOS) (read as long ns under ``nanosAsLong``) or plain
    µs-precision TIMESTAMP/TIMESTAMP_NTZ — both encodings have shipped
    in the driver's testdata, so nothing downstream may assume one.
    The raw column is kept as-is (normalizing here would break Parquet
    predicate pushdown); use ``_us``/``_sec``/``_ns``/``_ts_pred_*``.
    Session tz pinned to UTC so NTZ->epoch matches DuckDB epoch_us.

    The resolved scan (a LAZY DataFrame) is memoized per (session,
    path): a bare ``read.parquet`` re-reads file footers and re-lists
    the directory on every call — ~75 ms of driver latency per table
    per query construction (optimization r14, guide §1.2), which a
    production deployment would pay ONCE by registering the table in a
    catalog.  DataFrames are immutable, so sharing the base plan is
    safe; the testdata directories are immutable for the life of a
    session (the generators write a dir before its first load).  Data
    is re-scanned from parquet on every action — nothing here caches
    rows or results."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # size(NULL) must be NULL, not the legacy -1: with ANSI disabled
    # Spark flips sizeOfNull back to -1, silently corrupting every
    # token/shingle count over a NULL text row (-1 vs the oracle's
    # NULL — 12 text entries diverged under the hostile-session x
    # edge-corpus sweep, code-review r9).  Pin it like nanosAsLong so
    # the entry surface is session-default-independent.
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    per_session = _LOAD_PLAN_CACHE.setdefault(spark, {})
    path = f"{sf_dir}/{table}.parquet"
    # staleness guard (ADVICE r14): the memo key carries the path's
    # mtime, so a testdata dir REGENERATED at the same path within one
    # session gets a fresh scan instead of a stale file-listing
    # snapshot (or a FileNotFoundException).  One os.stat per call —
    # microseconds; non-local paths skip the fingerprint.
    try:
        import os as _os

        key = (path, _os.stat(path).st_mtime_ns)
    except OSError:
        key = (path, None)
    df = per_session.get(key)
    if df is None:
        df = spark.read.parquet(path)
        # tag the scan with its source path so ensure_parallelism can
        # memoize its partition-count probe (a ~0.1 s plan->RDD
        # conversion otherwise paid per construction)
        df._ong_src_path = path
        per_session[key] = df
    return df


# the schema-adaptive epoch converters live in functions/timeseries
# (the shared layer); short aliases keep the ~40 query bodies terse
_us = epoch_us
_sec = epoch_sec
_ns = epoch_ns

#: valid-tick contract for the ts_* analytics entries (edge-corpus
#: replay, code-review r9): a tick with a NULL timestamp cannot be
#: ordered (Spark windows sort NULLS FIRST, DuckDB NULLS LAST — every
#: windowed entry silently diverged), and a NaN/NULL value is the
#: reference's "unwritten cell" (its nan-masked F9 semantics; DuckDB
#: also THROWS casting NaN into the DECIMAL frame sums while Spark's
#: cast yields NULL).  Such rows are not data points — both engines
#: drop them up front.  Entries that only COUNT rows (range read,
#: usage stats) keep the raw table on purpose.
_VALID_TICKS_SQL = "ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)"


def _valid_ticks(ev: DataFrame) -> DataFrame:
    """Spark twin of ``_VALID_TICKS_SQL`` (see that constant)."""
    return ev.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
    )


def _ts_pred_ge(df: DataFrame, col: str, us: int) -> F.Column:
    """Pushdown-friendly `epoch_us(col) >= us`: compares the RAW
    column (long ns or timestamp) so the predicate reaches the Parquet
    row-group stats.  Equivalent because floor(ts/1000) >= us  <=>
    ts >= us*1000 (floor is monotone; positive domain)."""
    if df.schema[col].dataType.simpleString() == "bigint":
        return F.col(col) >= us * 1000
    return F.col(col) >= F.timestamp_micros(F.lit(us)).cast(df.schema[col].dataType)


def _ts_pred_lt(df: DataFrame, col: str, us: int) -> F.Column:
    """Pushdown-friendly `epoch_us(col) < us` (raw-column compare)."""
    if df.schema[col].dataType.simpleString() == "bigint":
        return F.col(col) < us * 1000
    return F.col(col) < F.timestamp_micros(F.lit(us)).cast(df.schema[col].dataType)


def _ts_pred_le(df: DataFrame, col: str, us: int) -> F.Column:
    """Pushdown-friendly `epoch_us(col) <= us`: ts div 1000 <= us <=>
    ts < (us+1)*1000."""
    if df.schema[col].dataType.simpleString() == "bigint":
        return F.col(col) < (us + 1) * 1000
    return F.col(col) < F.timestamp_micros(F.lit(us + 1)).cast(df.schema[col].dataType)


def _topk_ranked(df: DataFrame, order: list[F.Column], k: int) -> DataFrame:
    """Distributed top-k with a rank column.  ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject (per-task k-row heaps merged on
    the driver — no global sort shuffle, no single-task window over
    the full input); ``row_number`` then runs over only the k rows.
    ``order`` must be a total order (tiebreak by a unique key) so the
    result is deterministic."""
    w = Window.orderBy(*order)
    return df.orderBy(*order).limit(k).withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, sql=sql)
        return fn

    return deco


# ======================================================================
# Time-series engine semantics (SURVEY §2.1/2.2/2.4/2.5) on `events`
# ======================================================================

@register(
    "ts_range_read",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    WHERE epoch_us(ts) BETWEEN {T_2024_01_05} AND {T_2024_01_10}
    """,
)
def ts_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P4 + S4: time-range scan with projection.  Catalyst pushes
    both the range predicate and the column pruning into the Parquet
    scan (reference reads all columns then slices, database.py:624)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        _ts_pred_ge(ev, "ts", T_2024_01_05) & _ts_pred_le(ev, "ts", T_2024_01_10)
    ).select("event_id", _us(ev, "ts").alias("ts_us"), "user_id", "event_type", "value")


@register(
    "ts_snap_grid",
    f"""
    SELECT s - (s % 900) AS bucket_s,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (SELECT epoch_us(ts)//1000000 AS s, value FROM events
          WHERE {_VALID_TICKS_SQL})
    GROUP BY 1
    """,
)
def ts_snap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3: snap-to-grid (15 m tick) + per-cell aggregation.  The
    grid math is the reference's getpos truncation (chunker.py:88-95)
    as pure bigint exprs."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    s = _sec(ev, "ts")
    return (
        ev.select((s - (s % F.lit(900))).alias("bucket_s"), "value")
        .groupBy("bucket_s")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "ts_last_timestamp",
    "SELECT event_type, max(epoch_us(ts)) AS last_ts_us FROM events GROUP BY event_type",
)
def ts_last_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: last-timestamp per series (database.py:522-546); Parquet
    footer stats + partition pruning make this metadata-cheap."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.max(_us(ev, "ts")).alias("last_ts_us"))


@register(
    "ts_downsample_first",
    """
    SELECT event_type, bucket_s, value AS first_value, event_id AS first_event_id
    FROM (
      SELECT event_type, s - (s % 3600) AS bucket_s, value, event_id,
             row_number() OVER (
               PARTITION BY event_type, s - (s % 3600)
               ORDER BY us, event_id
             ) AS rn
      FROM (SELECT *, epoch_us(ts) AS us, epoch_us(ts)//1000000 AS s FROM events)
    ) WHERE rn = 1
    """,
)
def ts_downsample_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: grafana maxDataPoints thinning — first point per tumbling
    bucket per series (server.py:430-459) as window row_number."""
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("us", _us(ev, "ts")).withColumn("s", _sec(ev, "ts"))
    bucket = (F.col("s") - (F.col("s") % F.lit(3600))).alias("bucket_s")
    out = downsample.thin_first_per_bucket(
        ev,
        ts_col="us",
        bucket=bucket,
        series_cols=["event_type"],
        value_cols=["value", "event_id"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_type",
        "bucket_s",
        F.col("value").alias("first_value"),
        F.col("event_id").alias("first_event_id"),
    )


@register(
    "ts_upsert_last_wins",
    """
    SELECT user_id, bucket_s, value AS last_value
    FROM (
      SELECT user_id, s - (s % 86400) AS bucket_s, value,
             row_number() OVER (
               PARTITION BY user_id, s - (s % 86400)
               ORDER BY us DESC, event_id DESC
             ) AS rn
      FROM (SELECT *, epoch_us(ts) AS us, epoch_us(ts)//1000000 AS s FROM events)
    ) WHERE rn = 1
    """,
)
def ts_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 semantics as a query: last-write-wins per (series, grid
    cell) — the reference's cell overwrite (database.py:479-486)."""
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("us", _us(ev, "ts")).withColumn("s", _sec(ev, "ts"))
    ev = ev.withColumn("bucket_s", F.col("s") - (F.col("s") % F.lit(86400)))
    w = Window.partitionBy("user_id", "bucket_s").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket_s", F.col("value").alias("last_value"))
    )


@register(
    "ts_usage_stats",
    """
    SELECT event_type, count(*) AS n_rows, min(epoch_us(ts)) AS min_ts_us,
           max(epoch_us(ts)) AS max_ts_us, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def ts_usage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-sensor usage stats (fileutils.py:429-524)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.min(_us(ev, "ts")).alias("min_ts_us"),
        F.max(_us(ev, "ts")).alias("max_ts_us"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "ts_checksum_nansum",
    """
    SELECT l_orderkey, l_linenumber,
           0.0 + coalesce(l_quantity, 0.0) + coalesce(l_extendedprice, 0.0)
               + coalesce(l_discount, 0.0) + coalesce(l_tax, 0.0) AS checksum
    FROM lineitem
    """,
)
def ts_checksum_nansum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the reference's horizontal row checksum (nansum of metric
    cells, database.py:484-485) as a deterministic array fold."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        nan_sum(["l_quantity", "l_extendedprice", "l_discount", "l_tax"]).alias("checksum"),
    )


@register(
    "ts_ingest_grouping",
    """
    SELECT event_type AS sensor, s - (s % 16384) AS chunk_start, count(*) AS n_points
    FROM (SELECT event_type, epoch_us(ts)//1000000 AS s FROM events)
    GROUP BY 1, 2
    """,
)
def ts_ingest_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: ingest partial-aggregation by (sensor, chunk) before the
    per-chunk write (server.py:214-293); 16384 s = the 1 s-tick chunk
    span (2^14 rows, __init__.py:29)."""
    ev = load(spark, sf_dir, "events")
    s = _sec(ev, "ts")
    return (
        ev.select(F.col("event_type").alias("sensor"), (s - (s % F.lit(16384))).alias("chunk_start"))
        .groupBy("sensor", "chunk_start")
        .agg(F.count("*").alias("n_points"))
    )


@register(
    "influx_roundtrip",
    f"""
    SELECT 'metrics' AS db, event_type AS sensor, 'value' AS metric,
           value, epoch_us(ts) AS ts_us
    FROM events
    WHERE {_VALID_TICKS_SQL} AND event_type IS NOT NULL
    """,
)
def influx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/F6: render rows as influx line protocol, parse back with the
    column-expression parser (server_utils.py:8-25).  The oracle
    computes the expected tuples directly — so this checks the
    format->parse round trip end-to-end.  Only VALID ticks with a
    sensor name are rendered: line protocol cannot represent a NULL
    measurement/timestamp, and influx itself rejects NaN fields —
    the parser tolerates such garbage (NULL cells), but the writer
    never produces it."""
    ev = _valid_ticks(load(spark, sf_dir, "events")).filter(
        F.col("event_type").isNotNull()
    )
    lines = influx_src.format_lines(
        ev,
        db=F.lit("metrics"),
        sensor=F.col("event_type"),
        metric_value_pairs=[("value", F.col("value"))],
        ts_ns=_ns(ev, "ts"),
    )
    parsed = influx_src.parse_lines(lines)
    return parsed.select(
        "db", "sensor", "metric", "value", F.expr("ts_ns div 1000").alias("ts_us")
    )


# ======================================================================
# Relational coverage (Spark-native; SURVEY §2.3/2.4/2.6 notes these are
# absent from the reference and free in Spark — exposed + benchmarked)
# ======================================================================

@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(15,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE epoch_us(l_shipdate) <= {T_1998_09_02}
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — exact decimal aggregation cast to
    double at the edge (order-independent => cross-engine stable)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(15,2)")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = F.col("l_discount").cast("decimal(15,2)")
    tax = F.col("l_tax").cast("decimal(15,2)")
    disc_price = price * (F.lit(1) - disc)
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1) + tax)
    n = F.count("*")
    return (
        li.filter(_ts_pred_le(li, "l_shipdate", T_1998_09_02))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk",
    f"""
    SELECT l_orderkey, revenue, o_orderdate_us, rank
    FROM (
      SELECT l_orderkey, revenue, o_orderdate_us,
             CAST(row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS BIGINT) AS rank
      FROM (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS revenue,
               max(epoch_us(o_orderdate)) AS o_orderdate_us
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND epoch_us(o_orderdate) < {T_1995_03_15}
          AND epoch_us(l_shipdate) > {T_1995_03_15}
        GROUP BY l_orderkey
      )
    ) WHERE rank <= 10
    """,
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + top-k with total
    ordering.  customer is broadcast (small dim); lineitem⋈orders is
    the only shuffle."""
    cu = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = load(spark, sf_dir, "orders")
    od = od.filter(_ts_pred_lt(od, "o_orderdate", T_1995_03_15))
    li = load(spark, sf_dir, "lineitem")
    li = li.filter(_ts_pred_ge(li, "l_shipdate", T_1995_03_15 + 1))
    rev = F.col("l_extendedprice").cast("decimal(15,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(15,2)")
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("o_orderdate_us"),
        )
    )
    return _topk_ranked(
        j, [F.col("revenue").desc(), F.col("l_orderkey")], 10
    ).select("l_orderkey", "revenue", "o_orderdate_us", "rank")


@register(
    "tpch_q5ish",
    f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND epoch_us(o_orderdate) >= {T_1996_01_01}
      AND epoch_us(o_orderdate) < {T_1997_01_01}
    GROUP BY n_name
    """,
)
def tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier revenue: 6-way join; all dims broadcast,
    lineitem⋈orders is the single big shuffle."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    od = od.filter(
        _ts_pred_ge(od, "o_orderdate", T_1996_01_01)
        & _ts_pred_lt(od, "o_orderdate", T_1997_01_01)
    )
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast("decimal(15,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(15,2)")
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return j.groupBy("n_name").agg(F.sum(rev).cast("double").alias("revenue"))


# RETIRED r10 (registry cadence policy): top_orders — its
# TakeOrderedAndProject plan class and deterministic-tiebreak top-k are
# both pinned by tpch_q3_topk (richer: join + agg underneath) and the
# per-group variant by top_orders_per_priority.


@register(
    "part_brand_agg",
    """
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def part_brand_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + agg: part is small => broadcast, no
    shuffle of lineitem for the join (only for the groupBy)."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


# ======================================================================
# Training-data pipeline operators on documents / embeddings
# ======================================================================

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs)


_SHINGLE_CTE = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t)-1, 1)),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3
    )
"""

@register(
    "dedup_ngram_jaccard",
    _SHINGLE_CTE
    + """
    , freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
    -- adaptive hot-shingle cap, exact integer arithmetic: the same
    -- max(64, ceil(32 * mean_freq)) rule as dedup.auto_shingle_cap
    cap AS (SELECT greatest(64, (32 * sum(f) + count(*) - 1) // count(*)) AS c
            FROM freq),
    kept AS (SELECT sh.doc_id, sh.shingle
             FROM sh JOIN freq USING (shingle) CROSS JOIN cap
             WHERE freq.f <= cap.c),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, i::DOUBLE / (s1.n + s2.n - i)::DOUBLE AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
    WHERE i::DOUBLE / (s1.n + s2.n - i)::DOUBLE >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index Jaccard with the ADAPTIVE hot-shingle cap on (a
    uniform corpus sits below the cap, so results equal the uncapped
    run; a skewed corpus gets its stopword-like mega-shingles dropped
    before the pair join — ROADMAP #4)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_shingle_freq="auto")


_LSH_BANDS_CTE = """
    , mh AS (
      SELECT doc_id, seed, min(h) AS h FROM (
        SELECT doc_id, s.seed * 4 + j.j AS seed,
               substr(md5(s.seed::VARCHAR || '|' || shingle), j.j * 8 + 1, 8) AS h
        FROM sh CROSS JOIN range(0, 4) s(seed) CROSS JOIN range(0, 4) j(j)
      ) GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 2 AS band, string_agg(h, '' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, seed // 2
    )
"""

@register(
    "dedup_minhash_lsh",
    _SHINGLE_CTE
    + _LSH_BANDS_CTE
    + """
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, n=3, num_hashes=16, band_size=2)


@register("dedup_simhash", dedup.simhash64_pairs_oracle_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit xxhash64 SimHash banded candidates — now FULLY
    value-checked: the oracle computes the identical XXH64 (seed 42)
    in exact HUGEINT arithmetic (operators/xxh64_sql.py), so the
    'JVM-only hash' caveat from round 1 no longer applies."""
    docs = load(spark, sf_dir, "documents")
    return dedup.simhash_candidate_pairs(docs)


# RETIRED r10 (VERDICT r9 #2, registry cadence policy): dedup_simhash32
# — same banded-hamming plan class as dedup_simhash (64-bit, xxh64
# value-checked); the 32-bit portable variant stays available as
# dedup.simhash_portable(bits=32) with its unit tests.


@register(
    "text_tokens",
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        text.char_count(t).cast("bigint").alias("n_chars_m"),
        text.token_count(t).cast("bigint").alias("n_tokens"),
    )


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
             / len(string_split(text, ' '))::DOUBLE AS mean_token_len,
           len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL})))::DOUBLE
             / len(string_split(text, ' '))::DOUBLE AS stopword_ratio
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = text.quality_features(docs)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "mean_token_len",
        "stopword_ratio",
    )


@register(
    "text_langid",
    f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL}))) AS BIGINT) AS en_hits,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ({ES_LIST_SQL}))) AS BIGINT) AS es_hits,
           CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL})))
                   > len(list_filter(string_split(text, ' '), x -> x IN ({ES_LIST_SQL}))) THEN 'en'
                WHEN len(list_filter(string_split(text, ' '), x -> x IN ({ES_LIST_SQL})))
                   > len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL}))) THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = text.language_id(docs)
    return out.select(
        "doc_id",
        F.col("en_hits").cast("bigint").alias("en_hits"),
        F.col("es_hits").cast("bigint").alias("es_hits"),
        "lang_pred",
    )


@register(
    "text_fingerprint",
    r"""
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text.fingerprint(docs)


# -- embeddings --------------------------------------------------------

#: pairs are defined between SAME-dimension vectors only: on a length
#: mismatch the dot is NULL (dropped at every threshold/rank), instead
#: of the asymmetric prefix-dot len({a}) alone would give — mirrors the
#: per-length grouping in similarity.cosine_pairs_blocked_numpy
_DOT_SQL = """
  (CASE WHEN len({a}) = len({b}) AND len({a}) > 0 THEN
    list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE),
                (x, y) -> x + y)
   END)
"""


def _finite_vec_sql(e: str) -> str:
    """DuckDB twin of similarity.finite_vector_filter: the float pair
    family is defined over finite vectors only (a NaN cosine would be
    EMITTED by SQL's NaN-above-everything ordering while numpy's
    threshold drops it — code-review r9, second pass)."""
    return (
        f"({e} IS NOT NULL AND len(list_filter({e}, "
        f"x -> x IS NULL OR isnan(x::DOUBLE) OR isinf(x::DOUBLE))) = 0)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt(list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))"


def _lsh_bucket_sql(col: str, dim: int, num_planes: int) -> str:
    """DuckDB twin of similarity.lsh_bucket_expr: the hyperplanes are
    deterministic literals, and both engines evaluate the projection
    as the same sequential left fold, so the sign bits (and hence the
    bucket) agree bit-exactly."""
    terms = []
    for p in range(num_planes):
        plane = "[" + ", ".join(repr(v) for v in similarity._hyperplane(p, dim)) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> {col}[i]::DOUBLE * ({plane})[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# RETIRED r11 (registry cadence policy, VERDICT r10 #3): the
# emb_cosine_topk registry slot — the brute-force kernel itself STAYS
# (function below, called by every _recall_vs_brute gauge), and the
# identical brute CTE is embedded verbatim in _recall_vs_brute_sql, so
# the kernel remains value-checked every time emb_ann_recall /
# emb_ivf_recall / emb_pq_recall run.  Survivor: emb_ann_recall.
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs vec 0 — the ANN baseline; the
    deterministic fold makes it bit-identical to the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.cosine_topk(emb, qvec, k=10, exclude_ids=[0]).select(
        "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


@register(
    "emb_label_centroids",
    """
    WITH pos AS (SELECT unnest(range(1, 65)) AS pos)
    SELECT label, CAST(pos AS BIGINT) AS pos,
           list_reduce(list(embedding[pos]::DOUBLE ORDER BY vec_id), (a, b) -> a + b)
             / count(*) AS centroid
    FROM embeddings, pos
    GROUP BY label, pos
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, computed as an ordered sequential fold so
    the double sum is order-stable across engines."""
    emb = load(spark, sf_dir, "embeddings")
    pos = F.explode(F.sequence(F.lit(1), F.lit(64))).alias("pos")
    exploded = emb.select("label", "vec_id", pos, F.col("embedding"))
    exploded = exploded.withColumn(
        "val", F.element_at(F.col("embedding"), F.col("pos")).cast("double")
    )
    folded = (
        exploded.groupBy("label", "pos")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                    lambda s: s["val"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_val"),
            F.count("*").alias("n"),
        )
    )
    return folded.select(
        "label",
        F.col("pos").cast("bigint").alias("pos"),
        (F.col("sum_val") / F.col("n")).alias("centroid"),
    )


@register(
    "emb_neardup_blocked",
    f"""
    WITH sizes AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    kept AS (SELECT e.* FROM embeddings e JOIN sizes USING (label)
             WHERE n <= {similarity.DEFAULT_BLOCK_CAP}
               AND {_finite_vec_sql("e.embedding")})
    SELECT d1, d2, round(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS d1, b.vec_id AS d2,
             {_DOT_SQL.format(a="a.embedding", b="b.embedding")}
               / ({_norm_sql("a.embedding")} * {_norm_sql("b.embedding")}) AS cosine
      FROM kept a JOIN kept b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE round(cosine, 6) >= 0.4
    """,
)
def emb_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (IVF-style: the
    block key bounds the quadratic comparison) — pinned in its DEFAULT
    configuration: block cap ON (oversized blocks excluded by
    construction, mirrored in the oracle's sizes CTE) and the BLAS
    executor (numpy matmul per block, cosines rounded to 6 digits —
    same answers as the Catalyst fold, ~5x faster).
    ``emb_neardup_lsh`` is the label-free scale path (quantizer-derived
    blocks, parallelism = bucket count)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_blocked_numpy(
        emb, block_col="label", threshold=0.4, round_digits=6
    )


_NEARDUP_LSH_PLANES = 8
_NEARDUP_LSH_CAP = 256


def _neardup_lsh_sql() -> str:
    b = _lsh_bucket_sql("embedding", 64, _NEARDUP_LSH_PLANES)
    cos = (
        _DOT_SQL.format(a="a.embedding", b="c.embedding")
        + f" / ({_norm_sql('a.embedding')} * {_norm_sql('c.embedding')})"
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings),
    sizes AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
    kept AS (SELECT b.vec_id, b.embedding, b.bucket
             FROM b JOIN sizes USING (bucket) WHERE n <= {_NEARDUP_LSH_CAP}
               AND {_finite_vec_sql("b.embedding")})
    SELECT d1, d2, round(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS d1, c.vec_id AS d2, {cos} AS cosine
      FROM kept a JOIN kept c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ) WHERE round(cosine, 6) >= 0.3
    """


@register("emb_neardup_lsh", _neardup_lsh_sql())
def emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with QUANTIZER-DERIVED blocks: the block key is
    the LSH sign-bucket computed as a Catalyst expression (no label,
    no join to attach it), so parallelism equals bucket count (up to
    2^{planes}) and ``max_block_size`` bounds every task's quadratic
    term by construction — the 100 TB contract the label-blocked demo
    can't make.  Pair scoring runs on the BLAS executor (one matmul
    per bucket, cosines rounded to 6 digits like emb_neardup_blocked):
    at 10x sf0.1 the interpreted 64-dim pair fold cost ~15 s where the
    matmul does the same work in ~1 s, and the gap widens with bucket
    occupancy."""
    emb = load(spark, sf_dir, "embeddings")
    with_b = emb.withColumn(
        "bucket", similarity.lsh_bucket_expr("embedding", 64, _NEARDUP_LSH_PLANES)
    )
    return similarity.cosine_pairs_blocked_numpy(
        with_b,
        block_col="bucket",
        threshold=0.3,
        round_digits=6,
        max_block_size=_NEARDUP_LSH_CAP,
    )


def _quantized_topk_sql() -> str:
    cos = (
        _DOT_SQL.format(a="d", b="qe")
        + f" / ({_norm_sql('d')} * {_norm_sql('qe')})"
    )
    return f"""
    WITH deq AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> floor(x::DOUBLE * (127.0 / list_max(list_transform(embedding, y -> abs(y::DOUBLE)))))
                    / (127.0 / list_max(list_transform(embedding, y -> abs(y::DOUBLE))))) AS d
      FROM embeddings
      WHERE list_max(list_transform(embedding, y -> abs(y::DOUBLE))) > 0
    ),
    q AS (SELECT d AS qe FROM deq WHERE vec_id = 0)
    SELECT vec_id, cosine, rank FROM (
      SELECT vec_id, cosine,
             CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
      FROM (SELECT deq.vec_id, {cos} AS cosine FROM deq, q WHERE vec_id <> 0)
    ) WHERE rank <= 10
    """


@register("emb_quantized_topk", _quantized_topk_sql())
def emb_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search over int8-QUANTIZED embeddings: symmetric
    per-vector scalar quantization (4x storage reduction — the
    standard first step for 100 TB embedding corpora), exact top-k
    re-rank on the dequantized values.  floor-based quantization keeps
    the arithmetic a single IEEE chain, so both engines produce
    bit-identical dequantized cosines."""
    emb = load(spark, sf_dir, "embeddings")
    qt = similarity.quantize_embeddings(emb)
    deq = qt.select(
        "vec_id",
        similarity.dequantize_expr(F.col("qvec"), F.col("scale")).alias("deq"),
    )
    q0 = [float(x) for x in deq.filter(F.col("vec_id") == 0).first()["deq"]]
    return similarity.cosine_topk(
        deq, q0, k=10, vec_col="deq", exclude_ids=[0]
    ).select("vec_id", "cosine", F.col("rank").cast("bigint").alias("rank"))


@register(
    "ts_asof_join",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
           s.value AS value_right, epoch_us(s.ts) AS ts_us_right
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND epoch_us(p.ts) >= epoch_us(s.ts)
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: each purchase picks up the user's most
    recent signup at-or-before it.  Implemented as union + per-key
    windowed last_value — one shuffle, no range explosion (operators/
    asof.py); the oracle uses DuckDB's native ASOF JOIN."""
    from .operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id", "event_type", "value", _us(ev, "ts").alias("ts_us"))
    left = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    right = ev.filter(F.col("event_type") == "signup").drop("event_type", "event_id")
    return asof_join(left, right, ts_col="ts_us", by=["user_id"], value_cols=["value"])


# RETIRED r11 (registry cadence policy, VERDICT r10 #3): ts_delta —
# lag(1) over the identical chunked_window (operators/chunkwin.py).
# Survivor: ts_rate, whose expression is delta-value / delta-seconds
# through the SAME chunk-parallel lag plan; the lag kernel and the
# carry-row protocol stay value-checked by the survivor every round
# (plus the chunkwin unit suite).


@register(
    "tpch_rollup",
    """
    SELECT n_name, o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS revenue
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice, l_discount
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    GROUP BY ROLLUP (n_name, o_year)
    """,
)
def tpch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (nation, year) — grouping sets are free in
    Spark (SURVEY §2.4 notes the reference has none)."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(15,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(15,2)")
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .withColumn("o_year", F.year(F.col("o_orderdate").cast("timestamp")).cast("bigint"))
    )
    return j.rollup("n_name", "o_year").agg(F.sum(rev).cast("double").alias("revenue"))


@register(
    "events_json_extract",
    """
    SELECT k, count(*) AS n,
           -- isnan CASE, not TRY_CAST: DuckDB's TRY_CAST(NaN AS
           -- DECIMAL) still throws through its internal INT64 path
           CAST(SUM(CASE WHEN value IS NULL OR isnan(value) THEN NULL
                         ELSE CAST(value AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_value
    FROM (SELECT TRY_CAST(json_extract_string(
                   CASE WHEN json_valid(props) THEN props END, '$.k')
                 AS BIGINT) AS k,
                 value FROM events)
    GROUP BY k
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation (scalar-function surface
    beyond the reference, which has no JSON query functions).

    try_cast on BOTH extractions (code-review r9, edge-corpus): a
    shape-shifted property ({"k": "str"}) or malformed/NULL props must
    land in the k=NULL bucket, and a NaN value must sum as NULL — a
    plain ANSI cast job-kills on the first dirty row, and DuckDB's
    CAST throws the same way (TRY_CAST in the oracle)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").try_cast("bigint").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").try_cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


# RETIRED r11 (registry cadence policy, VERDICT r10 #3): ts_gap_fill
# — grid explode + forward-fill (operators/gapfill.py gap_fill_ffill).
# Survivor: ts_gap_fill_linear, which runs the SAME grid explode and
# windowed last-observation carry and then ALSO needs the next
# observation for the interpolation — the ffill path is a strict
# sub-plan of the survivor (gapfill.py keeps both entry points, with
# the edge-corpus NULL-series scenario now riding the linear twin).


# RETIRED r11 (registry cadence policy, VERDICT r10 #3):
# ts_rolling_mean — a 4-row ROWS frame mean over chunked_window.
# Survivor: ts_moving_range_avg, the time-based RANGE-frame trailing
# average — the strictly harder frame class (frame bounds by timestamp
# VALUE, ties share a frame) through the same chunk-parallel window
# machinery; decimal-exact sums in both.


@register(
    "tpch_q6",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                    * CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= {T_1996_01_01}
      AND epoch_us(l_shipdate) < {T_1997_01_01}
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue filter+agg — every predicate
    pushes to the Parquet scan (row-group stats skipping)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            _ts_pred_ge(li, "l_shipdate", T_1996_01_01)
            & _ts_pred_lt(li, "l_shipdate", T_1997_01_01)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,2)")
                * F.col("l_discount").cast("decimal(15,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "ts_pivot_daily",
    f"""
    SELECT day_s,
      CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
    FROM (SELECT s - (s % 86400) AS day_s, event_type, value
          FROM (SELECT epoch_us(ts)//1000000 AS s, event_type, value FROM events
                WHERE {_VALID_TICKS_SQL}))
    GROUP BY day_s
    """,
)
def ts_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: one column per series per day (the reference's
    wide-metric read shape built from long events)."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    s = _sec(ev, "ts")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.select((s - (s % F.lit(86400))).alias("day_s"), "event_type", "value")
        .groupBy("day_s")
        .pivot("event_type", kinds)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )


# RETIRED r10 (VERDICT r9 #2, registry cadence policy):
# emb_neardup_numpy — the uncapped twin of emb_neardup_blocked pinned a
# near-identical plan class (same BLAS pair kernel, max_block_size=None
# vs capped); the capped default is the 100 TB-safe contract and keeps
# the driver slot.  cosine_pairs_blocked_numpy(max_block_size=None)
# stays unit-tested in tests/test_operators.py.


@register(
    "ts_percentiles",
    f"""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events WHERE {_VALID_TICKS_SQL} GROUP BY event_type
    """,
)
def ts_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per series — Spark `percentile`
    and DuckDB `quantile_cont` agree bit-exactly (verified)."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


@register(
    "orders_with_late_lines",
    f"""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + {90 * 86400 * US}
    )
    GROUP BY o_orderpriority
    """,
)
def orders_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS — left-semi join (one shuffle, lineitem
    never materialized into the output)."""
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = li.join(od, li.l_orderkey == od.o_orderkey).filter(
        _us(li, "l_shipdate") > _us(od, "o_orderdate") + 90 * 86400 * US
    ).select("l_orderkey")
    semi = od.join(late, od.o_orderkey == late.l_orderkey, "left_semi")
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "customers_without_recent_orders",
    f"""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND epoch_us(o_orderdate) >= {T_1997_01_01}
    )
    GROUP BY c_mktsegment
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left-anti join."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    recent = od.filter(_ts_pred_ge(od, "o_orderdate", T_1997_01_01)).select("o_custkey")
    anti = cu.join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
    return anti.groupBy("c_mktsegment").agg(F.count("*").alias("n_customers"))


@register(
    "ts_sessionize",
    f"""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events WHERE {_VALID_TICKS_SQL}
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sessions AS (
      SELECT user_id, us, event_id,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM seq
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(us) AS start_us, max(us) AS end_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30 min inactivity gap) via lag + running sum —
    the batch analog of a session window, one shuffle per user key."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.withColumn("us", _us(ev, "ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("us"), F.col("event_id"))
    gap = F.col("us") - F.lag("us").over(w)
    seq = ev.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > 1800 * US), F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = seq.withColumn("session_id", F.sum("is_start").over(w_run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@register(
    "users_set_ops",
    """
    SELECT 'both' AS kind, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only' AS kind, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def users_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7 — absent in the reference, exposed
    Spark-native): INTERSECT / EXCEPT / UNION ALL over user sets."""
    ev = load(spark, sf_dir, "events")
    click = ev.filter(F.col("event_type") == "click").select("user_id")
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = click.intersect(buy).select(F.lit("both").alias("kind"), "user_id")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep a
    # user whose click count merely exceeds their purchase count
    only = click.subtract(buy).select(F.lit("click_only").alias("kind"), "user_id")
    return both.unionByName(only)


# RETIRED r10 (registry cadence policy): tpch_cube — CUBE and ROLLUP
# lower to the same Expand-based grouping-sets physical class;
# tpch_rollup keeps the slot (it additionally pins the join tree).


@register(
    "text_pii_scrub",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' contact: user' || doc_id || '@example.com ip 10.0.' || (doc_id % 256) || '.7',
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails/IPs/phones) — synthetic PII is appended
    per doc so the masks actually fire, then the chained
    regexp_replace pass runs JVM-side; oracle applies identical RE2/
    Java-compatible patterns."""
    docs = load(spark, sf_dir, "documents")
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return with_pii.select("doc_id", text.scrub_pii(F.col("text")).alias("scrubbed"))


@register(
    "text_repetition",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t)-1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN len(s) > 0
                THEN 1.0 - len(list_distinct(s))::DOUBLE / len(s)::DOUBLE
                ELSE 0.0 END AS rep_ratio
    FROM sh
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-3-gram ratio — boilerplate/quality signal (1 -
    distinct/total shingles); single double division, cross-engine
    exact."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    from .operators.dedup import _shingles_of

    sh = toks.select("doc_id", _shingles_of(F.col("__toks"), 3).alias("s"))
    total = F.size(F.col("s"))
    distinct = F.size(F.array_distinct(F.col("s")))
    return sh.select(
        "doc_id",
        F.when(
            total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
        ).otherwise(F.lit(0.0)).alias("rep_ratio"),
    )


@register(
    "ts_time_weighted_avg",
    f"""
    WITH seq AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                      ORDER BY epoch_us(ts), event_id) AS next_us
      FROM events WHERE {_VALID_TICKS_SQL}
    )
    SELECT event_type,
           CAST(SUM(cents * (next_us - us)) AS DOUBLE)
             / CAST(SUM(next_us - us) AS DOUBLE) / 100.0 AS twa
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series (the TSDB `time_weight`
    operator): each observation weighted by its holding interval.
    Pure-bigint numerator (value as exact cents x interval-µs —
    order-free sums) with one double division at the edge; DECIMAL->
    DOUBLE was avoided because DuckDB double-rounds that conversion
    (observed 1-ulp drift).  lead(1) is evaluated chunk-parallel
    (operators/chunkwin.py forward carries) before the group-by."""
    from .operators.chunkwin import chunked_window

    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.withColumn("us", _us(ev, "ts"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    seq = chunked_window(
        ev.withColumn("cents", cents).select("event_type", "us", "event_id", "cents"),
        key_cols=["event_type"],
        order_cols=["us", "event_id"],
        chunk_len=WEEK_US,
        build=lambda w: {"next_us": F.lead("us").over(w)},
        rows_after=1,
    ).filter(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("us")
    return seq.groupBy("event_type").agg(
        (
            F.sum(F.col("cents") * dt).cast("double")
            / F.sum(dt).cast("double")
            / F.lit(100.0)
        ).alias("twa")
    )


@register(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)
def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — rank window partitioned by the group, so the
    sort never crosses groups (vs a global top-k)."""
    od = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


@register(
    "ts_ohlc",
    """
    WITH seq AS (
      SELECT event_type, s - (s % 3600) AS bucket_s, value,
             row_number() OVER (PARTITION BY event_type, s - (s % 3600)
                                ORDER BY us, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, s - (s % 3600)
                                ORDER BY us DESC, event_id DESC) AS rn_close
      FROM (SELECT *, epoch_us(ts) AS us, epoch_us(ts)//1000000 AS s FROM events)
    )
    SELECT event_type, bucket_s,
           max(CASE WHEN rn_open = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_close = 1 THEN value END) AS close,
           count(*) AS n
    FROM seq GROUP BY event_type, bucket_s
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlesticks per series per hour — open/close via
    total-ordered row_number (ties by event_id), high/low plain
    min/max; one window pass + one aggregation."""
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("us", _us(ev, "ts")).withColumn("s", _sec(ev, "ts"))
    ev = ev.withColumn("bucket_s", F.col("s") - (F.col("s") % F.lit(3600)))
    asc = Window.partitionBy("event_type", "bucket_s").orderBy(
        F.col("us"), F.col("event_id")
    )
    desc = Window.partitionBy("event_type", "bucket_s").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    seq = ev.withColumn("rn_open", F.row_number().over(asc)).withColumn(
        "rn_close", F.row_number().over(desc)
    )
    return seq.groupBy("event_type", "bucket_s").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n"),
    )


@register(
    "ts_gap_fill_linear",
    f"""
    WITH obs AS (
      SELECT event_type, s - (s % 900) AS tick, value,
             row_number() OVER (PARTITION BY event_type, s - (s % 900)
                                ORDER BY us DESC, event_id DESC) AS rn
      FROM (SELECT *, epoch_us(ts) AS us, epoch_us(ts)//1000000 AS s FROM events
            WHERE {_VALID_TICKS_SQL})
    ), cells AS (SELECT event_type, tick, value FROM obs WHERE rn = 1),
    bounds AS (SELECT event_type, min(tick) AS lo, max(tick) AS hi FROM cells GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(lo, hi + 900, 900)) AS tick_s FROM bounds),
    j AS (
      SELECT g.event_type, g.tick_s, c.value AS v
      FROM grid g LEFT JOIN cells c ON c.event_type IS NOT DISTINCT FROM g.event_type AND c.tick = g.tick_s
    ), marked AS (
      SELECT event_type, tick_s, v,
        last_value(v IGNORE NULLS) OVER back AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN tick_s END IGNORE NULLS) OVER back AS pt,
        first_value(v IGNORE NULLS) OVER fwd AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN tick_s END IGNORE NULLS) OVER fwd AS nt
      FROM j
      WINDOW back AS (PARTITION BY event_type ORDER BY tick_s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd AS (PARTITION BY event_type ORDER BY tick_s
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, tick_s,
           CASE WHEN v IS NOT NULL THEN v
                WHEN nv IS NOT NULL AND pv IS NOT NULL
                  THEN pv + (nv - pv) * ((tick_s - pt)::DOUBLE / (nt - pt)::DOUBLE)
                ELSE pv END AS value
    FROM marked
    """,
)
def ts_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with linear interpolation on the 15 m grid — the
    resample/interpolate operator (operators/gapfill.gap_fill_linear);
    identical expression shape on both engines, bit-equal doubles."""
    from .operators.gapfill import gap_fill_linear

    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.withColumn("us", _us(ev, "ts")).withColumn("s", _sec(ev, "ts"))
    out = gap_fill_linear(
        ev,
        ts_sec_col="s",
        series_cols=["event_type"],
        value_col="value",
        tick_seconds=900,
        tiebreak_cols=["us", "event_id"],
    )
    return out.select("event_type", "tick_s", "value")


@register(
    "ts_rate",
    """
    SELECT event_type, us AS ts_us,
           (value - lag(value) OVER w)
             / ((us - lag(us) OVER w)::DOUBLE / 1000000.0) AS rate_per_s
    FROM (SELECT event_type, epoch_us(ts) AS us, event_id, value FROM events)
    WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)
    """,
)
def ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series rate of change (delta value / delta seconds) — the
    counter-rate operator; identical expression order both engines.
    lag(1) evaluated chunk-parallel (operators/chunkwin.py): one carry
    row per weekly chunk instead of one task per series."""
    from .operators.chunkwin import chunked_window

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("us", _us(ev, "ts"))

    def _build(w):
        dv = F.col("value") - F.lag("value").over(w)
        dt_s = (F.col("us") - F.lag("us").over(w)).cast("double") / F.lit(1000000.0)
        return {"rate_per_s": dv / dt_s}

    out = chunked_window(
        ev.select("event_type", "us", "event_id", "value"),
        key_cols=["event_type"],
        order_cols=["us", "event_id"],
        chunk_len=WEEK_US,
        build=_build,
        rows_before=1,
    )
    return out.select("event_type", F.col("us").alias("ts_us"), "rate_per_s")


@register(
    "ts_value_histogram",
    f"""
    SELECT event_type, CAST(floor(value / 50) * 50 AS BIGINT) AS bucket_lo,
           count(*) AS n
    FROM events WHERE {_VALID_TICKS_SQL} GROUP BY 1, 2
    """,
)
def ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per series (width 50) — the
    distribution-profile operator."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    return (
        ev.select(
            "event_type",
            (F.floor(F.col("value") / 50) * 50).cast("bigint").alias("bucket_lo"),
        )
        .groupBy("event_type", "bucket_lo")
        .agg(F.count("*").alias("n"))
    )


@register(
    "part_type_like",
    """
    SELECT p_brand, count(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
    FROM part
    WHERE p_type LIKE '%BRASS%' AND p_name NOT LIKE '%green%'
    GROUP BY p_brand
    """,
)
def part_type_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String predicates (LIKE / NOT LIKE) + agg — StartsWith/Contains
    push down to the scan as string filters."""
    pa = load(spark, sf_dir, "part")
    return (
        pa.filter(F.col("p_type").like("%BRASS%") & ~F.col("p_name").like("%green%"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(15,2)")).cast("double").alias("sum_price"),
        )
    )


@register(
    "customers_above_nation_avg",
    """
    SELECT c_custkey, c_acctbal, n_name FROM (
      SELECT c_custkey, c_acctbal, n_name,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE c_acctbal > nation_avg
    """,
)
def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (customers above their nation's
    average balance).  NOT a window: PARTITION BY c_nationkey has 25
    distinct values, so an unordered window still shuffles the whole
    table into 25 tasks.  Instead: partial-aggregated groupBy (map-side
    combine, 25-row result) broadcast-joined back — zero full-table
    shuffles, and the decimal sum is order-free so the per-nation
    average is bit-identical to the window's."""
    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    avgs = cu.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double")
            / F.count("*")
        ).alias("nation_avg")
    )
    j = cu.join(F.broadcast(avgs), on="c_nationkey").join(
        F.broadcast(na), F.col("c_nationkey") == na.n_nationkey
    )
    return (
        j.filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_acctbal", "n_name")
    )


# RETIRED r10 (registry cadence policy): ts_cumulative_sum — the naive
# one-task-per-series window predecessor of ts_cumulative_sum_chunked,
# which computes the identical decimal-exact running total through the
# scale-safe two-pass chunked prefix sum and keeps the driver slot
# (its oracle SQL remains the single-window formulation below, so the
# equivalence is still value-checked every round).


@register(
    "ts_cumulative_sum_chunked",
    f"""
    SELECT event_type, us AS ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY event_type ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM (SELECT event_type, epoch_us(ts) AS us, event_id, value FROM events
          WHERE {_VALID_TICKS_SQL})
    """,
)
def ts_cumulative_sum_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE running total: two-pass chunked prefix sum
    (operators/prefix.py) with weekly chunks — parallelism is
    event_types x weeks instead of one task per event_type, and the
    decimal arithmetic makes it bit-identical to the single-window
    plan (the oracle here is literally ts_cumulative_sum's SQL)."""
    from .operators.prefix import chunked_running_sum

    week_us = 7 * 86400 * 1_000_000
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.select("event_type", _us(ev, "ts").alias("us"), "event_id", "value")
    out = chunked_running_sum(
        ev,
        key_cols=["event_type"],
        order_cols=["us", "event_id"],
        value=F.col("value").cast("decimal(18,2)"),
        chunk=F.floor(F.col("us") / F.lit(week_us)),
        out_col="__rt",
    )
    return out.select(
        "event_type",
        F.col("us").alias("ts_us"),
        F.col("__rt").cast("double").alias("running_total"),
    )


@register(
    "doc_stats_by_lang",
    """
    SELECT lang, source, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition stats per (lang, source) — the first report
    every training-data pipeline produces."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


def _ivf_l2_sql(a: str, b: str, dim: int) -> str:
    """Integer squared-L2 fold between two bigint list expressions —
    exact, order-free (the Lloyd's-step distance in the oracle twin)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def _ivf_train_sql(
    k: int,
    iters: int,
    dim: int,
    suffix: str = "",
    vec_expr: str = "embedding",
    elig_expr: str | None = None,
) -> tuple[str, str]:
    """The unrolled integer-exact Lloyd's chain as a CTE fragment
    (shared by the IVF top-k, semantic-dedup and PQ oracles).  Returns
    ``(ctes, last)`` where ``ctes`` defines q0 (quantized vectors)
    through the final centroid CTE ``last``.  Every training step is
    bigint arithmetic (quantize by 2^20 is rounding-free for float32,
    sums are exact in any order, centroid = floored mean via the
    truncated-mod floor-division identity), so both engines converge
    to BIT-IDENTICAL centroids and cluster assignments.

    ``suffix`` namespaces every CTE (so several chains — one per PQ
    subspace — compose in one statement); ``vec_expr`` selects the
    trained vector (e.g. a list slice for a PQ subspace)."""
    scale = similarity.IVF_QUANT_SCALE
    sx = suffix
    # quantize twin of similarity.ivf_quantize_expr: dirty elements
    # (NULL / NaN / |x| > EXACT_MAX_ABS, which would overflow the
    # bigint chain) become NULL elements; qel holds the ELIGIBLE rows —
    # the exact subset similarity.train_ivf_centroids_exact trains on
    # and assigns (ineligible rows get a NULL cluster on both engines).
    # ``elig_expr`` widens the eligibility probe beyond the trained
    # slice: the PQ trainer excludes a vector dirty in ANY subspace
    # from EVERY subspace's training (similarity null policy), so its
    # per-slice chains pass elig_expr='embedding'.
    max_abs = similarity.EXACT_MAX_ABS
    if elig_expr is None:
        ok_sql = "TRUE"
    else:
        ok_sql = (
            f"({elig_expr} IS NOT NULL AND len(list_filter({elig_expr}, "
            f"x -> x IS NULL OR isnan(x::DOUBLE) OR abs(x::DOUBLE) > {max_abs}"
            f")) = 0)"
        )
    ctes = [
        f"""q0{sx} AS (
      SELECT vec_id,
             list_transform({vec_expr}, x -> CASE
               WHEN x IS NOT NULL AND NOT isnan(x::DOUBLE)
                    AND abs(x::DOUBLE) <= {max_abs}
               THEN CAST(floor(x::DOUBLE * {scale}.0) AS BIGINT) END) AS qv,
             {ok_sql} AS __ok
      FROM embeddings),
    qel{sx} AS (
      SELECT vec_id, qv FROM q0{sx}
      WHERE __ok AND qv IS NOT NULL
        AND len(list_filter(qv, x -> x IS NULL)) = 0),
    c0{sx} AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qv AS cv
      FROM (SELECT vec_id, qv FROM qel{sx} ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = f"c0{sx}"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it}{sx} AS (
      SELECT vec_id, qv, cid FROM (
        SELECT q.vec_id, q.qv, c.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_ivf_l2_sql("q.qv", "c.cv", dim)}, c.cid) AS rn
        FROM qel{sx} q CROSS JOIN {prev} c) WHERE rn = 1),
    s{it}{sx} AS (
      SELECT cid, pos, SUM(qv[pos]) AS s, COUNT(*) AS n
      FROM a{it}{sx}, (SELECT unnest(range(1, {dim + 1})) AS pos) p
      GROUP BY cid, pos),
    n{it}{sx} AS (
      SELECT cid, list((s - ((s % n) + n) % n) // n ORDER BY pos) AS cv
      FROM s{it}{sx} GROUP BY cid),
    c{it}{sx} AS (
      SELECT c.cid, COALESCE(u.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN n{it}{sx} u USING (cid))"""
        )
        prev = f"c{it}{sx}"
    return ",".join(ctes), prev


def _ivf_af_sql(prev: str, dim: int, suffix: str = "") -> str:
    """Final exact assignment CTE body: every ELIGIBLE vector to its
    nearest trained centroid (lowest-index tie-break, like np.argmin);
    ineligible rows are absent — the SQL image of a NULL cluster."""
    return f"""
      SELECT vec_id, cid FROM (
        SELECT q.vec_id, c.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_ivf_l2_sql("q.qv", "c.cv", dim)}, c.cid) AS rn
        FROM qel{suffix} q CROSS JOIN {prev} c) WHERE rn = 1"""


def _ivf_topk_sql(k: int = 8, iters: int = 2, nprobe: int = 2, dim: int = 64, topk: int = 10) -> str:
    """DuckDB twin of the integer-exact IVF pipeline
    (similarity.train_ivf_centroids_exact + ivf_topk_exact) — see
    :func:`_ivf_train_sql` for why the unrolled chain is bit-identical
    cross-engine.  The final re-rank reuses the sequential cosine
    fold already proven by the emb_cosine_topk oracle."""
    ctes, prev = _ivf_train_sql(k, iters, dim)

    def l2(a: str, b: str) -> str:
        return _ivf_l2_sql(a, b, dim)

    cos = (
        _DOT_SQL.format(a="c.embedding", b="qe")
        + f" / ({_norm_sql('c.embedding')} * {_norm_sql('qe')})"
    )
    return f"""
    WITH {ctes},
    af AS ({_ivf_af_sql(prev, dim)}),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY {l2("qq.qv", "c.cv")}, c.cid) AS rn
        FROM {prev} c CROSS JOIN (SELECT qv FROM q0 WHERE vec_id = 0) qq) WHERE rn <= {nprobe}),
    qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN af ON e.vec_id = af.vec_id
      WHERE af.cid IN (SELECT cid FROM probe) AND e.vec_id <> 0)
    SELECT vec_id, cosine, rank FROM (
      SELECT vec_id, cosine,
             CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
      FROM (SELECT c.vec_id, {cos} AS cosine FROM cand c, qe)
    ) WHERE rank <= {topk}
    """


# RETIRED r11 (registry cadence policy, VERDICT r10 #3): the
# emb_ivf_topk registry slot.  Survivor: emb_ivf_recall, whose oracle
# is literally _recall_vs_brute_sql(_ivf_topk_sql()) — the identical
# IVF plan nests inside the survivor's SQL, so the path stays
# rows+schema+hash-checked every time the survivor runs.  The function
# STAYS (emb_ivf_recall's Spark side calls it).
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN end-to-end: train the INTEGER-EXACT k-means coarse
    quantizer (2^20-quantized bigint arithmetic — order-independent,
    so centroids are bit-identical across engines/partitionings; see
    similarity.train_ivf_centroids_exact), probe the 2 nearest lists,
    exact cosine re-rank.  The scale path for similarity search over
    partitioned corpora — and, since round 5, fully value-checked
    against an unrolled DuckDB twin (rows+schema+hash), closing the
    harness's last no_oracle row."""
    emb = load(spark, sf_dir, "embeddings")
    cents = similarity.train_ivf_centroids_exact(emb, k=8, iters=2)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk_exact(
        emb, cents, qvec, k=10, nprobe=2, exclude_ids=[0]
    ).select("vec_id", "cosine", F.col("rank").cast("bigint").alias("rank"))


def _ann_lsh_sql() -> str:
    b = _lsh_bucket_sql("embedding", 64, 8)
    cos = (
        _DOT_SQL.format(a="p.embedding", b="qe")
        + f" / ({_norm_sql('p.embedding')} * {_norm_sql('qe')})"
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings),
    q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0),
    cand AS (SELECT b.vec_id, b.embedding FROM b, q WHERE b.bucket = q.qb),
    n AS (SELECT count(*) AS c FROM cand),
    pool AS (
      SELECT vec_id, embedding FROM cand WHERE (SELECT c FROM n) >= 11
      UNION ALL
      SELECT vec_id, embedding FROM embeddings WHERE (SELECT c FROM n) < 11
    )
    SELECT vec_id, cosine, rank FROM (
      SELECT vec_id, cosine,
             CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
      FROM (SELECT p.vec_id, {cos} AS cosine FROM pool p, q WHERE p.vec_id <> 0)
    ) WHERE rank <= 10
    """


# RETIRED r11 (registry cadence policy, VERDICT r10 #3): the
# emb_ann_lsh registry slot.  Survivor: emb_ann_recall, whose oracle
# is _recall_vs_brute_sql(_ann_lsh_sql()) — the identical LSH plan
# nests inside the survivor's SQL.  The function STAYS (emb_ann_recall
# calls it).
def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path end-to-end: random-hyperplane LSH buckets ->
    candidate set = query's bucket -> exact cosine re-rank of the
    candidates only.  At 100 TB the bucket filter replaces the full
    scan; here the candidate set is typically a few % of the corpus.
    Falls back to brute force when the bucket has < k members.  The
    planes are deterministic literals, so (unlike k-means IVF) the
    whole pipeline HAS a DuckDB oracle twin — bit-exact buckets."""
    emb = load(spark, sf_dir, "embeddings")
    dim = 64
    with_buckets = emb.withColumn(
        "bucket", similarity.lsh_bucket_expr("embedding", dim, 8)
    )
    qrow = with_buckets.filter(F.col("vec_id") == 0).select("embedding", "bucket").first()
    qvec, qbucket = qrow[0], qrow[1]
    candidates = with_buckets.filter(
        F.coalesce(F.col("bucket") == qbucket, F.lit(False))
    ).drop("bucket")
    # single candidate scan: re-rank first, fall back only if the
    # bucket couldn't fill k (bucket < k+1 members <=> < k result
    # rows — the same boundary as the oracle's count >= 11 rule).
    # The old plan ran a separate count() job over the candidates
    # before the re-rank — two full bucket scans instead of one.
    bucket_topk = similarity.cosine_topk(candidates, qvec, k=10, exclude_ids=[0]).select(
        "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )
    rows = bucket_topk.collect()
    if len(rows) >= 10:
        return spark.createDataFrame(rows, bucket_topk.schema)
    return similarity.cosine_topk(emb, qvec, k=10, exclude_ids=[0]).select(
        "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id AS item_id, 'image' AS media_type,
           -- a NULL payload is processed as the EMPTY payload (the
           -- extractor's `or b""`): byte features must exist for
           -- every item row
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           sha256(coalesce(text, '')) AS sha256
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column ->
    Arrow-batched mapInPandas feature extraction.  The decode step is
    stubbed (no media libs in this container) but byte-level features
    (size, sha256) are real and oracle-checked; stub outputs
    (width/height/duration) are excluded from the compared columns."""
    from .operators import multimodal

    docs = load(spark, sf_dir, "documents")
    media = multimodal.fake_media_table(docs, media_type="image")
    # decoders="stub" pins determinism for the oracle: the payloads
    # here are text bytes, not real media, so a real decoder must not
    # be attempted even when the libraries happen to be installed
    feats = multimodal.extract_features(media, decoders="stub")
    return feats.select("item_id", "media_type", "n_bytes", "sha256")


@register(
    "corpus_clean_pipeline",
    f"""
    WITH kept AS (
      SELECT doc_id, text, n_chars FROM (
        SELECT doc_id, text, n_chars,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL})))
                     > len(list_filter(string_split(text, ' '), x -> x IN ({ES_LIST_SQL}))) THEN 'en'
                  WHEN len(list_filter(string_split(text, ' '), x -> x IN ({ES_LIST_SQL})))
                     > len(list_filter(string_split(text, ' '), x -> x IN ({EN_LIST_SQL}))) THEN 'es'
                  ELSE 'und' END AS lang_pred
      FROM kept
    )
    SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
    FROM scored WHERE n_tokens >= 5
    GROUP BY lang_pred
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data cleaning pass as ONE composed
    pipeline: exact dedup (keep min doc_id per content digest, one
    shuffle via a fingerprint-partitioned row_number), quality gate
    (min token count), language ID, then the post-clean corpus
    composition report.  Every stage is the same operator the
    standalone queries use — this pins that they compose."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col("doc_id"))
    kept = (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # lang + token exprs ride ONE projection over kept — no self-join;
    # the whole pipeline is a single shuffle (dedup window) + the agg
    t = F.col("text")
    en = text.stopword_hits(t, text.EN_STOPWORDS)
    es = text.stopword_hits(t, text.ES_STOPWORDS)
    lang = (
        F.when(en > es, F.lit("en")).when(es > en, F.lit("es")).otherwise(F.lit("und"))
    )
    scored = kept.select(
        "doc_id",
        "n_chars",
        text.token_count(t).alias("n_tokens"),
        lang.alias("lang_pred"),
    ).filter(F.col("n_tokens") >= 5)
    return scored.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
    )


@register(
    "ts_moving_range_avg",
    f"""
    SELECT event_type, event_id, us AS ts_us,
           n_in_window,
           CAST(win_sum AS DOUBLE) / n_in_window AS moving_avg
    FROM (
      SELECT event_type, event_id, us,
             COUNT(*) OVER w AS n_in_window,
             SUM(CAST(value AS DECIMAL(18,2))) OVER w AS win_sum
      FROM (SELECT event_type, event_id, epoch_us(ts) AS us, value FROM events
            WHERE {_VALID_TICKS_SQL})
      WINDOW w AS (PARTITION BY event_type ORDER BY us
                   RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
    )
    """,
)
def ts_moving_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding window (RANGE frame): 5-minute trailing
    average per event type.  The frame is defined by the timestamp
    VALUE, not row counts — ties share one frame in both engines.
    Decimal window sums keep the frame total exact, so the final
    double division rounds once, identically to the oracle.  The RANGE
    frame looks back 5 min <= one weekly chunk, so chunked_window ships
    each chunk only the prior rows within 5 min of its edge — keys x
    weeks tasks instead of one task per series."""
    from .operators.chunkwin import chunked_window

    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.select("event_type", "event_id", _us(ev, "ts").alias("us"), "value")

    def _build(w):
        wf = w.rangeBetween(-300_000_000, 0)
        return {
            "n_in_window": F.count("*").over(wf),
            "moving_avg": (
                F.sum(F.col("value").cast("decimal(18,2)")).over(wf).cast("double")
                / F.count("*").over(wf)
            ),
        }

    out = chunked_window(
        ev,
        key_cols=["event_type"],
        order_cols=["us"],
        chunk_len=WEEK_US,
        build=_build,
        range_before=300_000_000,
    )
    return out.select(
        "event_type", "event_id", F.col("us").alias("ts_us"), "n_in_window", "moving_avg"
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS item_id,
           CAST(f AS INT) AS frame_idx,
           CAST(f * 2.0 AS FLOAT) AS ts_s
    FROM documents,
         -- coalesce: a NULL payload samples as the EMPTY payload
         -- (1 frame), matching the extractor's `or b""`
         unnest(range(0, 1 + octet_length(encode(coalesce(text, ''))) % 5)) AS t(f)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing (1 row -> N frame rows through
    Arrow mapInPandas).  The stub fan-out rule (1 + n_bytes mod 5
    frames per item) is deterministic, so the row explosion itself is
    oracle-checked; the opaque frame bytes are excluded from the
    compared columns (same convention as multimodal_features)."""
    from .operators import multimodal

    docs = load(spark, sf_dir, "documents")
    media = multimodal.fake_media_table(docs, media_type="video")
    frames = multimodal.sample_frames(
        media, every_s=2.0, max_frames=5, decoders="stub"
    )
    return frames.select("item_id", "frame_idx", "ts_s")


@register(
    "text_rolling_fingerprint",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    wv AS (SELECT doc_id,
                  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647) AS w
           FROM toks),
    h AS (SELECT doc_id,
                 CASE WHEN len(w) >= 4
                      THEN list_transform(range(1, len(w)-2),
                             i -> list_reduce(list_prepend(0::BIGINT, w[i:i+3]),
                                              (acc, x) -> (acc * 1000003 + x) % 2147483647))
                      ELSE [] END AS hashes
          FROM wv)
    SELECT doc_id, CAST(len(hashes) AS BIGINT) AS n_windows,
           -- coalesce: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' — the empty signature is ''
           -- (deterministic, join-safe), covering <4-token and NULL
           -- text documents (edge-corpus replay, code-review r9)
           coalesce(array_to_string(list_sort(hashes)[1:5], ','), '') AS sig
    FROM h
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via ROLLING (Rabin-Karp window) hashes:
    the doc signature is the bottom-5 window hashes (a min-k sketch —
    shared windows between near-dup docs surface as shared minima).
    Exact mod-2^31-1 integer arithmetic keeps both engines
    bit-identical; identical docs get identical sigs by construction."""
    docs = load(spark, sf_dir, "documents")
    ht = text.rolling_hash_table(docs, k=4)
    bottom5 = F.slice(F.array_sort(F.col("hashes")), 1, 5)
    return ht.select(
        "doc_id",
        F.size("hashes").cast("bigint").alias("n_windows"),
        F.array_join(
            F.transform(bottom5, lambda x: x.cast("string")), ","
        ).alias("sig"),
    )


def _bpe_re_sql() -> str:
    return text.BPE_TOKEN_RE.replace("'", "''")


@register(
    "text_bpe_tokens",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_bpe_re_sql()}')) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token budgeting: whitespace tokens vs the GPT-2-style
    pretokenizer count (the regex lives in the Java/RE2 common subset,
    so Catalyst and the oracle count identical matches)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("ws_tokens"),
        text.bpe_token_count(F.col("text")).cast("bigint").alias("bpe_tokens"),
    )


@register(
    "dedup_winnow",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t)-1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [] END AS sh
      FROM toks
    ),
    hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS h FROM grams),
    fps AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(
        CASE WHEN len(h) >= 4
             THEN list_transform(range(1, len(h)-2), i -> list_aggregate(h[i:i+3], 'min'))
             WHEN len(h) >= 1 THEN [list_aggregate(h[1:4], 'min')]
             ELSE [] END)) AS fingerprint
      FROM hashed
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
    FROM fps a JOIN fps b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) near-dup candidates: window-min selection over
    n-gram hashes keeps ~2/(w+1) of the hashes while guaranteeing any
    shared run of w+n-1 tokens still collides — a cheaper inverted
    index than full shingles at the same detection guarantee."""
    docs = load(spark, sf_dir, "documents")
    return dedup.winnow_candidate_pairs(docs, n=3, window=4, min_shared=2)


# RETIRED r11 (registry cadence policy, VERDICT r10 #3):
# ts_zscore_anomaly — per-group exact decimal moments + broadcast join
# back + flag filter.  Survivor: ts_mad_anomaly, the robust twin with
# the IDENTICAL plan class (group stats agg -> broadcast join ->
# filter) plus the strictly harder median/percentile aggregate; the
# streaming z-score lives on in streaming/stateful.py (EWMA operator).


def _dedup_clusters_sql() -> str:
    """Oracle for dedup_clusters: the minhash-LSH pair SQL feeding a
    recursive min-reachable-node CC (component id = min doc_id, the
    same deterministic labelling the Spark operator produces)."""
    return (
        _SHINGLE_CTE.replace("WITH toks", "WITH RECURSIVE toks", 1)
        + _LSH_BANDS_CTE
        + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sym AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach AS (
      SELECT a AS node, b AS r FROM sym
      UNION
      SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
    ),
    comp AS (SELECT node, least(node, min(r)) AS cluster_id FROM reach GROUP BY node)
    SELECT node AS doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM comp
    """
    )


@register("dedup_clusters", _dedup_clusters_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUPS, not just pairs: LSH candidate pairs ->
    connected components (operators/graph.py min-label propagation +
    pointer jumping) -> (doc_id, cluster_id, cluster_size).  The
    cluster id = min doc_id in the component is deterministic, so the
    whole pipeline has an exact recursive-CTE oracle twin.  This is
    the keep-one-per-cluster view a dedup pipeline actually consumes."""
    from .operators.graph import duplicate_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, n=3, num_hashes=16, band_size=2)
    return duplicate_clusters(pairs, src="d1", dst="d2")


@register(
    "dedup_passage_stats",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    m AS (SELECT doc_id, t, len(t) // 8 AS np FROM toks WHERE len(t) >= 8),
    pass AS (
      SELECT doc_id,
             md5(array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ')) AS h,
             doc_id * 1000000 + i AS k
      FROM m, unnest(range(1, np + 1)) AS u(i)
    ),
    firsts AS (SELECT h, min(k) AS first_k FROM pass GROUP BY h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN k > first_k THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
           CAST(sum(CASE WHEN k > first_k THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_frac
    FROM pass JOIN firsts USING (h)
    GROUP BY doc_id
    """,
)
def dedup_passage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style passage-level exact dedup stats: non-overlapping
    8-token passages hashed map-side, first occurrence = smallest
    (doc_id, position) key, per-doc repeated-passage fraction
    (operators/dedup.passage_dup_stats)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.passage_dup_stats(docs, passage_words=8)


GOPHER_LIST_SQL = "'" + "','".join(text.GOPHER_STOPWORDS) + "'"

# shared by text_gopher_quality and corpus_curation_report
_GOPHER_SQL = f"""
    WITH s AS (
      SELECT doc_id, text, string_split(text, ' ') AS t, length(text) AS nc
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             (nc - len(t) + 1)::DOUBLE / len(t)::DOUBLE AS mean_word_len,
             len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / len(t)::DOUBLE AS alpha_frac,
             ((nc - length(replace(text, '#', '')))
              + (nc - length(replace(text, '...', ''))) / 3)::DOUBLE
               / len(t)::DOUBLE AS symbol_ratio,
             CAST(len(list_filter(t, x -> x IN ({GOPHER_LIST_SQL}))) AS BIGINT) AS stop_hits
      FROM s
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio, stop_hits,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio < 0.1
            AND alpha_frac > 0.8
            AND stop_hits >= 2) AS gopher_pass
    FROM f
    """


@register("text_gopher_quality", _GOPHER_SQL)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveWeb document-quality rules (Rae et al. 2021
    §A1.1) per document, plus the combined pass/fail verdict
    (operators/text.gopher_quality) — integer counting and single
    double divisions, bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents")
    return text.gopher_quality(docs)


@register(
    "text_vocab",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tf AS (
      SELECT u.token, CAST(count(*) AS BIGINT) AS tf
      FROM toks, unnest(t) AS u(token) GROUP BY 1
    ),
    dfreq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df_docs
      FROM (SELECT doc_id, unnest(list_distinct(t)) AS token FROM toks)
      GROUP BY token
    )
    SELECT tf.token, tf.tf, dfreq.df_docs FROM tf JOIN dfreq USING (token)
    """,
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (token -> term frequency, document frequency)
    — operators/text.vocab.  df_docs dedups per-doc map-side
    (array_distinct before the explode), so the shuffle carries one
    row per distinct (mapper, token), never a corpus-wide
    count-distinct expansion."""
    docs = load(spark, sf_dir, "documents")
    out = text.vocab(docs)
    return out.select("token", F.col("tf").cast("bigint").alias("tf"),
                      F.col("df_docs").cast("bigint").alias("df_docs"))


def _contamination_sql(n: int = 8) -> str:
    gram = " || ' ' || ".join([f"t[i+{j}]" for j in range(n)])
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t)-{n - 2}, 1)),
                                          i -> {gram})) AS arr
      FROM d WHERE len(t) >= {n}
    ),
    bench AS (SELECT DISTINCT unnest(arr) AS s FROM g WHERE doc_id % 20 = 0),
    corp AS (SELECT doc_id, len(arr) AS n_ngrams, unnest(arr) AS s
             FROM g WHERE doc_id % 20 <> 0)
    SELECT corp.doc_id,
           CAST(n_ngrams AS BIGINT) AS n_ngrams,
           CAST(sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(n_ngrams AS DOUBLE) AS contamination_frac
    FROM corp LEFT JOIN bench USING (s)
    GROUP BY corp.doc_id, n_ngrams
    """


@register("text_contamination", _contamination_sql(8))
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/Llama-style n-gram overlap):
    documents with doc_id % 20 == 0 stand in for the held-out eval
    set; every other document reports the fraction of its distinct
    8-gram shingles that occur anywhere in that set
    (operators/text.contamination_stats — bench n-grams broadcast,
    corpus side map-side explode + broadcast join, one shuffle)."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return text.contamination_stats(corpus, bench, n=8)


def _sample_rates_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {ppm}" for s, ppm in sorted(text.SAMPLE_RATES_PPM.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


@register(
    "corpus_sample_stats",
    f"""
    WITH b AS (
      SELECT lang AS stratum,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 1000000 < {_sample_rates_case_sql()}
                  THEN 1 ELSE 0 END AS kept
      FROM documents
    )
    SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS realized_rate
    FROM b GROUP BY stratum
    """,
)
def corpus_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (data mixing): per-language
    keep rates applied via a hash-bucket decision
    (operators/text.stratified_sample_stats) — reproducible across
    engines/runs/cluster sizes, no RNG.  Map-side decision, one tiny
    per-stratum aggregate."""
    docs = load(spark, sf_dir, "documents")
    return text.stratified_sample_stats(docs)


@register(
    "dedup_keep_best",
    """
    WITH h AS (SELECT md5(text) AS fingerprint, doc_id, n_chars FROM documents),
    g AS (
      SELECT fingerprint, doc_id, n_chars,
             row_number() OVER (PARTITION BY fingerprint
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY fingerprint) AS n_copies
      FROM h)
    SELECT fingerprint, doc_id AS keeper_id,
           CAST(n_chars AS BIGINT) AS keeper_score,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM g WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with the quality-aware keep policy: the
    representative of each duplicate group is the highest-score copy
    (longest n_chars, ties to lowest id) rather than "first id wins" —
    what a pipeline wants when copies differ in extraction quality.
    MIN-over-struct aggregate, one digest shuffle, no corpus window
    (operators/dedup.exact_duplicates_keep_best)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.exact_duplicates_keep_best(docs)


@register(
    "doc_length_band",
    """
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents WHERE n_chars IS NOT NULL),
    bands AS (
      SELECT lang, CAST(min(n_chars) AS BIGINT) AS p_lo,
             CAST(max(n_chars) AS BIGINT) AS p_hi,
             CAST(min(n) AS BIGINT) AS n_total
      FROM ranked
      WHERE rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
         OR rn = CAST(ceil(0.95 * n) AS BIGINT)
      GROUP BY lang)
    SELECT d.lang, b.p_lo, b.p_hi, b.n_total,
           CAST(sum(CASE WHEN d.n_chars BETWEEN b.p_lo AND b.p_hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN bands b USING (lang)
    GROUP BY d.lang, b.p_lo, b.p_hi, b.n_total
    """,
)
def doc_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-outlier banding: DISCRETE p05/p95 length
    band (k-th order statistic, k = ceil(p*n) — no float
    interpolation, so the band values are actual corpus lengths and
    integer-exact cross-engine) plus how many docs it keeps — the
    "drop truncated fragments and concatenation blobs" filter
    (operators/text.length_band_stats)."""
    docs = load(spark, sf_dir, "documents")
    return text.length_band_stats(docs)


@register(
    "text_rare_tokens",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    occ AS (SELECT doc_id, unnest(t) AS token FROM toks),
    dfreq AS (
      SELECT token, count(*) AS dfc
      FROM (SELECT doc_id, unnest(list_distinct(t)) AS token FROM toks)
      GROUP BY token),
    rare AS (SELECT token FROM dfreq WHERE dfc < 3),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
               FROM occ GROUP BY doc_id),
    ro AS (SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_rare
           FROM occ o JOIN rare r USING (token) GROUP BY o.doc_id)
    SELECT t.doc_id, t.n_tokens,
           CAST(COALESCE(ro.n_rare, 0) AS BIGINT) AS n_rare,
           CAST(COALESCE(ro.n_rare, 0) AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS rare_ratio
    FROM totals t LEFT JOIN ro USING (doc_id)
    """,
)
def text_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rare-token occurrence ratio (corpus document frequency
    < 3) — a CCNet-spirit fluency proxy from integer counts only,
    bit-identical across engines where log-prob perplexity would hinge
    on libm rounding (operators/text.rare_token_stats)."""
    docs = load(spark, sf_dir, "documents")
    return text.rare_token_stats(docs)


@register(
    "corpus_pack_stats",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_RE.replace("'", "''")}')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, n_tok,
           CAST(floor((cum - n_tok) / 4096.0) AS BIGINT) AS bin_id,
           CAST((cum - n_tok) % 4096 AS BIGINT) AS bin_offset,
           CAST(CASE WHEN n_tok > 0
                     THEN floor((cum - 1) / 4096.0)
                          - floor((cum - n_tok) / 4096.0) + 1
                     ELSE 1 END AS BIGINT) AS n_bins_spanned
    FROM c
    """,
)
def corpus_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concat-and-split sequence packing layout (the standard
    LLM pre-training shard format): per document, the training
    sequence it starts in, its token offset, and how many sequences it
    spans — integer-exact on BPE-proxy token counts; the global
    running count runs through the chunked prefix sum, not one global
    window task (operators/text.sequence_pack_stats)."""
    docs = load(spark, sf_dir, "documents")
    return text.sequence_pack_stats(docs)


@register(
    "dedup_ledger_backfill",
    """
    WITH ledger AS (
      -- coalesce mirrors streaming.content_fingerprint: NULL text
      -- digests as '' (a NULL key would bypass the ledger forever)
      SELECT DISTINCT md5(coalesce(text, '')) AS fingerprint
      FROM documents WHERE doc_id < 250),
    batch AS (
      SELECT doc_id, md5(coalesce(text, '')) AS fingerprint
      FROM documents WHERE doc_id >= 250),
    first_per_fp AS (
      SELECT fingerprint, min(doc_id) AS doc_id FROM batch GROUP BY fingerprint)
    SELECT f.doc_id, f.fingerprint
    FROM first_per_fp f LEFT JOIN ledger l USING (fingerprint)
    WHERE l.fingerprint IS NULL
    """,
)
def dedup_ledger_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCH tier of the streaming digest-ledger dedup protocol
    (streaming/dedup.py), value-checked: documents with doc_id < 250
    play the already-ingested ledger, the rest arrive as a backfill
    batch — within-batch first-occurrence per digest (deterministic:
    lowest doc_id), then the anti-join against the ledger.  One digest
    shuffle + one digest-keyed anti-join; document text never moves."""
    from .streaming.dedup import FINGERPRINT_COL, content_fingerprint

    docs = load(spark, sf_dir, "documents")
    ledger = (
        content_fingerprint(docs.filter(F.col("doc_id") < 250), "text")
        .select(FINGERPRINT_COL)
        .distinct()
    )
    batch = content_fingerprint(docs.filter(F.col("doc_id") >= 250), "text")
    first = batch.groupBy(FINGERPRINT_COL).agg(F.min("doc_id").alias("doc_id"))
    return (
        first.join(ledger, on=FINGERPRINT_COL, how="left_anti")
        .select("doc_id", F.col(FINGERPRINT_COL).alias("fingerprint"))
    )


def _recall_vs_brute_sql(ann_sql: str) -> str:
    """recall@10 of any ANN result set (a query yielding a vec_id
    column) against the exact brute-force cosine ranking — shared by
    the LSH and IVF evaluation twins."""
    brute_cos = (
        _DOT_SQL.format(a="embedding", b="qe")
        + f" / ({_norm_sql('embedding')} * {_norm_sql('qe')})"
    )
    return f"""
    WITH ann AS ({ann_sql}),
    brute AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM (
          SELECT vec_id, {brute_cos} AS cosine
          FROM embeddings, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
          WHERE vec_id <> 0)
      ) WHERE rank <= 10),
    hits AS (SELECT count(*) AS h FROM ann JOIN brute USING (vec_id))
    SELECT CAST(10 AS BIGINT) AS k,
           CAST(h AS BIGINT) AS n_hits,
           CAST(h AS DOUBLE) / 10.0 AS recall
    FROM hits
    """


def _ann_recall_sql() -> str:
    return _recall_vs_brute_sql(_ann_lsh_sql())


def _recall_vs_brute(spark: SparkSession, sf_dir: str, ann_fn) -> DataFrame:
    """Spark side of :func:`_recall_vs_brute_sql`: join the given ANN
    path's result against the brute-force top-10 and count hits.
    ``ann_fn`` is the (retired-from-registry, still-exported) ANN
    query function — direct call, no registry indirection, so the
    r11 retirements keep these gauges self-contained."""
    ann = ann_fn(spark, sf_dir).select("vec_id")
    brute = emb_cosine_topk(spark, sf_dir).select("vec_id")
    return (
        ann.join(brute, on="vec_id")
        .agg(F.count("*").alias("__h"))
        .select(
            F.lit(10).cast("bigint").alias("k"),
            F.col("__h").cast("bigint").alias("n_hits"),
            (F.col("__h").cast("double") / F.lit(10.0)).alias("recall"),
        )
    )


@register("emb_ann_recall", _ann_recall_sql())
def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@10 of the LSH bucket path
    against the exact brute-force ranking — the metric every ANN
    deployment monitors before trading exactness for scan reduction.
    Both sides are deterministic (literal hyperplanes, sequential
    cosine folds), so even the EVALUATION has an exact oracle twin.
    Output is one row (k, n_hits, recall)."""
    return _recall_vs_brute(spark, sf_dir, emb_ann_lsh)


@register("emb_ivf_recall", _recall_vs_brute_sql(_ivf_topk_sql()))
def emb_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the IVF (nprobe=2 of 8 lists) ANN path against the
    exact brute-force ranking — emb_ann_recall's counterpart for the
    partition-pruned scale path, closing the eval loop on both ANN
    families.  Deterministic end to end: the integer-exact k-means
    makes even the probed-lists choice bit-identical cross-engine, so
    the evaluation itself is value-checked (oracle nests the unrolled
    IVF twin)."""
    return _recall_vs_brute(spark, sf_dir, emb_ivf_topk)


def _semantic_dedup_sql(k: int = 8, iters: int = 2, dim: int = 64, threshold: float = 0.4) -> str:
    ctes, prev = _ivf_train_sql(k, iters, dim)
    cos = (
        _DOT_SQL.format(a="ea.embedding", b="eb.embedding")
        + f" / ({_norm_sql('ea.embedding')} * {_norm_sql('eb.embedding')})"
    )
    return f"""
    WITH {ctes},
    af AS ({_ivf_af_sql(prev, dim)}),
    dup AS (
      SELECT DISTINCT a.vec_id
      FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id > b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE round({cos}, 6) >= {threshold})
    SELECT af.vec_id, CAST(af.cid AS INT) AS cid,
           (d.vec_id IS NULL) AS keep
    FROM af LEFT JOIN dup d ON af.vec_id = d.vec_id
    UNION ALL
    -- ineligible vectors (NULL / null-element / out-of-range — absent
    -- from af) cannot be assessed for semantic duplication: one row
    -- each, kept, with no cluster — the same routed verdict the Spark
    -- operator gives them
    SELECT e.vec_id, CAST(NULL AS INT) AS cid, TRUE AS keep
    FROM embeddings e LEFT JOIN af ON af.vec_id = e.vec_id
    WHERE af.vec_id IS NULL
    """


@register("dedup_semantic", _semantic_dedup_sql())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDedup, Abbas et al. 2023): integer-
    exact k-means clusters bound the quadratic term, then each vector
    is dropped if a LOWER-id cluster member is cosine-similar above
    the threshold (operators/similarity.semantic_dedup).  One row per
    vector (vec_id, cid, keep).  The oracle reuses the unrolled
    Lloyd's CTE chain proven by emb_ivf_topk, so clustering, pairing
    and the rounded-cosine keep decision are all value-checked."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, k=8, iters=2, threshold=0.4)


# BM25 retrieval: fixed query-term list over the documents corpus.
_BM25_TERMS = ["dup", "spark", "merge"]


def _bm25_sql(terms: list[str] = _BM25_TERMS, topk: int = 10) -> str:
    k1, k1p1 = repr(text.BM25_K1), repr(text.BM25_K1 + 1.0)
    b, omb = repr(text.BM25_B), repr(1.0 - text.BM25_B)
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    # tf{i} is BIGINT and DuckDB types a bare decimal literal as
    # DECIMAL, so `tf * 2.2` would be evaluated EXACTLY and diverge
    # from Spark's all-double tree in the last ulp (e.g. tf=3:
    # 6.5999999999999996 vs 6.6000000000000005) — cast the literal so
    # the multiply is the same correctly-rounded double op.  Every
    # other literal sits in an already-DOUBLE context.
    parts = " + ".join(
        f"(((n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * ((tf{i} * CAST({k1p1} AS DOUBLE))"
        f" / (tf{i} + {k1} * ({omb} + {b} * (dl / avgdl)))))"
        for i in range(len(terms))
    )
    anymatch = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
    WITH feat AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {df_cols}
      FROM feat),
    scored AS (
      SELECT doc_id, {parts} AS score
      FROM feat, stats
      WHERE {anymatch})
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      FROM scored) WHERE rank <= {topk}
    """


@register("text_bm25_topk", _bm25_sql())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval over the corpus (top-10 for a fixed
    query) — the ranking primitive a curation pipeline uses to mine
    topical training subsets.  operators/text.bm25_scores documents
    the one deliberate deviation (rational odds idf, no log — log is
    not correctly-rounded-guaranteed across libms, the rational form
    is monotone-equivalent and bit-exact cross-engine).  Plan shape:
    map-side tf/dl from the token array (no explode), ONE 1-row
    scalar aggregate broadcast back, TakeOrderedAndProject top-k —
    at 100 TB this is a single corpus scan."""
    docs = load(spark, sf_dir, "documents")
    scored = text.bm25_scores(docs, _BM25_TERMS)
    return _topk_ranked(scored, [F.col("score").desc(), F.col("doc_id")], 10)


# EWMA smoothing: K-lag truncated exponential weights with a DYADIC
# decay (alpha = 1/2), so every weight 0.5^j and every product w*x is
# EXACT in IEEE doubles (power-of-two scaling shifts the exponent, no
# mantissa rounding).  The numerator/denominator sums are emitted in
# the same left-associated order by both engines, and the single final
# division is correctly rounded — bit-identical cross-engine without
# DECIMAL casts.  This is the pandas ``ewm(alpha=0.5, adjust=True)``
# recurrence truncated at K lags (the 0.5^8 tail weight below the
# truncation is < 0.4% of the mass); the streaming twin (unbounded
# recurrence, per-key state) lives in streaming/stateful.py.
_EWMA_K = 8
_EWMA_WEIGHTS = [0.5**j for j in range(_EWMA_K)]


def _ewma_sql() -> str:
    def x(j: int) -> str:
        return "value" if j == 0 else f"lag(value, {j}) OVER w"

    num = " + ".join(
        f"(CASE WHEN {x(j)} IS NOT NULL THEN {w!r} * {x(j)} ELSE 0.0 END)"
        for j, w in enumerate(_EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"(CASE WHEN {x(j)} IS NOT NULL THEN {w!r} ELSE 0.0 END)"
        for j, w in enumerate(_EWMA_WEIGHTS)
    )
    return f"""
    SELECT event_type, us AS ts_us, value,
           CASE WHEN ({den}) > 0.0 THEN ({num}) / ({den}) ELSE NULL END AS ewma8
    FROM (SELECT event_type, epoch_us(ts) AS us, event_id, value FROM events
          WHERE {_VALID_TICKS_SQL})
    WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)
    """


@register("ts_ewma", _ewma_sql())
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA smoothing (alpha = 1/2, truncated at 8 lags) —
    the batch twin of the stateful streaming EWMA
    (streaming/stateful.py), value-checked: dyadic weights make every
    term exact, so the oracle comparison is bitwise.  Runs through the
    chunk-parallel window machinery (operators/chunkwin.py), so the
    per-series history never funnels into one task: parallelism is
    keys x weeks, with exactly 7 carry rows per chunk edge."""
    from functools import reduce
    from operator import add

    from .operators.chunkwin import chunked_window

    ev = _valid_ticks(load(spark, sf_dir, "events"))
    ev = ev.withColumn("ts_us", _us(ev, "ts"))

    def _build(w):
        nums, dens = [], []
        for j, wt in enumerate(_EWMA_WEIGHTS):
            x = F.col("value") if j == 0 else F.lag("value", j).over(w)
            nums.append(F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0)))
            dens.append(F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0)))
        num = reduce(add, nums)
        den = reduce(add, dens)
        return {"ewma8": F.when(den > F.lit(0.0), num / den)}

    out = chunked_window(
        ev.select("event_type", "ts_us", "event_id", "value"),
        key_cols=["event_type"],
        order_cols=["ts_us", "event_id"],
        chunk_len=WEEK_US,
        build=_build,
        rows_before=_EWMA_K - 1,
    )
    return out.select("event_type", "ts_us", "value", "ewma8")


def _centroid_dist_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    # NOTE the explicit CAST on sqdist: the only difference between this
    # oracle and the (driver-green) emb_pq_adc_topk one was an uncast
    # list_reduce sum as an OUTPUT column — some DuckDB versions widen
    # lambda-fold arithmetic (BIGINT -> HUGEINT/DOUBLE), which survives a
    # name-only schema check but changes the value hash (123 vs 123.0).
    # The r5 driver row was rows+schema green / hash red while three
    # local replays were bit-identical; pinning the output type removes
    # the one engine-version-sensitive degree of freedom.
    ctes, prev = _ivf_train_sql(k, iters, dim)
    return f"""
    WITH {ctes},
    af AS ({_ivf_af_sql(prev, dim)})
    SELECT af.vec_id, CAST(af.cid AS INT) AS cid,
           CAST({_ivf_l2_sql("q.qv", "c.cv", dim)} AS BIGINT) AS sqdist
    FROM af JOIN q0 q ON q.vec_id = af.vec_id
            JOIN {prev} c ON c.cid = af.cid
    """


@register("emb_centroid_dist", _centroid_dist_sql())
def emb_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality scoring (SSL-prototypes data-pruning metric,
    Sorscher et al. 2022): integer-exact squared L2 distance of every
    vector to its assigned k-means centroid
    (operators/similarity.centroid_distances) — the score column is
    pure bigint arithmetic, so even the ranking a pruning pipeline
    cuts at is bit-identical cross-engine.  Broadcast k-row centroid
    table, map-side fold, no data-sized shuffle."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.centroid_distances(emb, k=8, iters=2)


def _mix_weights_sql() -> str:
    vals = ", ".join(
        f"('{s}', {ppm})" for s, ppm in sorted(text.TARGET_MIX_PPM.items())
    )
    return f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tgt(source, target_ppm) AS (VALUES {vals}),
    j AS (
      SELECT COALESCE(c.source, t.source) AS source,
             CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs,
             CAST(COALESCE(t.target_ppm, 0) AS BIGINT) AS target_ppm
      FROM counts c FULL JOIN tgt t ON c.source = t.source),
    star AS (
      SELECT n_docs AS n_star, target_ppm AS t_star FROM j
      WHERE target_ppm > 0
      ORDER BY CAST(n_docs AS DOUBLE) / target_ppm, source LIMIT 1)
    SELECT source, n_docs, target_ppm,
           CAST((target_ppm * n_star) // t_star AS BIGINT) AS n_keep
    FROM j, star
    """


@register("corpus_mix_weights", _mix_weights_sql())
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing rebalance plan (operators/text.mixture_plan): how
    many documents to keep per source so the kept corpus hits the
    target mixture exactly by downsampling only.  Integer-exact
    (binding source by one double ranking, keep counts by bigint
    floor division).  One count aggregate + two broadcasts — nothing
    data-sized moves."""
    docs = load(spark, sf_dir, "documents")
    return text.mixture_plan(docs)


def _epoch_mix_ctes() -> str:
    """The epoch-mix CTE chain ending in ``kept(source, doc_id,
    keep_rank)`` — shared by the corpus_epoch_mix oracle and the
    epoch->pack integration oracle so the mix semantics cannot drift
    between them."""
    vals = ", ".join(
        f"('{s}', {ppm})" for s, ppm in sorted(text.TARGET_MIX_PPM.items())
    )
    return f"""
    counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tgt(source, target_ppm) AS (VALUES {vals}),
    j AS (
      SELECT COALESCE(c.source, t.source) AS source,
             CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs,
             CAST(COALESCE(t.target_ppm, 0) AS BIGINT) AS target_ppm
      FROM counts c FULL JOIN tgt t ON c.source = t.source),
    star AS (
      SELECT n_docs AS n_star, target_ppm AS t_star FROM j
      WHERE target_ppm > 0
      ORDER BY CAST(n_docs AS DOUBLE) / target_ppm, source LIMIT 1),
    plan AS (
      SELECT source,
             CAST((target_ppm * n_star) // t_star AS BIGINT) AS n_keep
      FROM j, star),
    ranked AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('mix|' || doc_id::VARCHAR), doc_id
             ) AS BIGINT) AS keep_rank
      FROM documents),
    kept AS (
      SELECT r.source, r.doc_id, r.keep_rank
      FROM ranked r JOIN plan p USING (source)
      WHERE r.keep_rank <= p.n_keep)"""


def _epoch_mix_sql() -> str:
    return (
        "WITH " + _epoch_mix_ctes()
        + "\n    SELECT source, doc_id, keep_rank FROM kept"
    )


@register("corpus_epoch_mix", _epoch_mix_sql())
def corpus_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-mix materialization (operators/text.epoch_mix_sample):
    turns the corpus_mix_weights plan into the actual kept-document
    set — per source, exactly n_keep documents chosen by a
    deterministic md5(doc-id) ranking, so the epoch is bit-identical
    across engines, reruns, and partitionings, and one source's
    growth never perturbs another's picks.  One count aggregate +
    one source-partitioned window + a |sources|-row broadcast;
    keep_rank doubles as the round-robin interleave key, so no
    global-ordering window exists anywhere in the plan."""
    docs = load(spark, sf_dir, "documents")
    return text.epoch_mix_sample(docs)


@register(
    "ts_mad_anomaly",
    f"""
    WITH base AS (
      SELECT event_type, epoch_us(ts) AS us, value FROM events
      WHERE {_VALID_TICKS_SQL}),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM base GROUP BY event_type),
    d AS (
      SELECT b.event_type, b.us, b.value, m.med, abs(b.value - m.med) AS adev
      FROM base b JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM d GROUP BY event_type)
    SELECT d.event_type, d.us AS ts_us, d.value, d.med, m2.mad
    FROM d JOIN mad m2 USING (event_type)
    WHERE d.adev > 3.0 * m2.mad
    """,
)
def ts_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: |x - median| > 3 * MAD per series —
    the outlier rule that, unlike ts_zscore_anomaly, is itself immune
    to the outliers it hunts.  Exact interpolated medians via Spark
    `percentile` ≡ DuckDB `quantile_cont` (the bit-equality already
    proven by ts_percentiles); both median tables come back as
    broadcasts, so the data-sized cost is two scans of the events
    table and no shuffle of data rows."""
    ev = _valid_ticks(load(spark, sf_dir, "events"))
    base = ev.select("event_type", _us(ev, "ts").alias("ts_us"), "value")
    med = base.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    # d feeds BOTH the MAD aggregate and the final filter; without
    # materialization the events scan + median join run twice (three
    # scans total with med's own) — store the adev frame once
    d = dedup.materialize_for_self_join(
        base.join(F.broadcast(med), on="event_type").withColumn(
            "adev", F.abs(F.col("value") - F.col("med"))
        )
    )
    mad = d.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        d.join(F.broadcast(mad), on="event_type")
        .filter(F.col("adev") > F.lit(3.0) * F.col("mad"))
        .select("event_type", "ts_us", "value", "med", "mad")
    )


def _minhash_error_sql(num_hashes: int = 16) -> str:
    return (
        _SHINGLE_CTE
        + _LSH_BANDS_CTE
        + f"""
    , cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    m AS (
      SELECT c.d1, c.d2, CAST(count(*) AS BIGINT) AS mm
      FROM cand c
      JOIN mh x ON x.doc_id = c.d1
      JOIN mh y ON y.doc_id = c.d2 AND y.seed = x.seed AND y.h = x.h
      GROUP BY c.d1, c.d2),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, est_jaccard, exact_jaccard,
           abs(est_jaccard - exact_jaccard) AS abs_err
    FROM (
      SELECT c.d1, c.d2,
             CAST(COALESCE(m.mm, 0) AS DOUBLE) / {float(num_hashes)} AS est_jaccard,
             CAST(COALESCE(i.i, 0) AS DOUBLE)
               / CAST(s1.n + s2.n - COALESCE(i.i, 0) AS DOUBLE) AS exact_jaccard
      FROM cand c
      LEFT JOIN m ON m.d1 = c.d1 AND m.d2 = c.d2
      LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
      JOIN sizes s1 ON s1.doc_id = c.d1
      JOIN sizes s2 ON s2.doc_id = c.d2)
    """
    )


@register("dedup_minhash_error", _minhash_error_sql())
def dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation for the MinHash-LSH path
    (operators/dedup.minhash_error_stats): per candidate pair, the
    16-hash Jaccard estimate vs the exact shingle Jaccard and the
    absolute error — the emb_ann_recall counterpart for the dedup
    sketch, with an exact oracle twin for the whole evaluation."""
    docs = load(spark, sf_dir, "documents")
    return dedup.minhash_error_stats(docs, n=3, num_hashes=16, band_size=2)


# near_dup rides the same portable minhash/band CTEs as the
# dedup_minhash_lsh oracle, then summarizes per BUCKET (bucket size
# >= 2 <=> the doc appears in >= 1 candidate pair) — the SQL twin of
# lsh_candidate_pairs(summarize=True), no pair join anywhere
_CURATION_SQL = (
    _SHINGLE_CTE
    + _LSH_BANDS_CTE
    + f"""
    , bsz AS (SELECT band, sig, count(*) AS m FROM bands GROUP BY band, sig),
    nd AS (SELECT DISTINCT bands.doc_id
           FROM bands JOIN bsz USING (band, sig) WHERE bsz.m >= 2),
    g AS (SELECT doc_id, gopher_pass FROM ({_GOPHER_SQL})),
    sem AS (SELECT vec_id AS doc_id, keep AS semantic_keep
            FROM ({_semantic_dedup_sql()})),
    fp AS (SELECT doc_id, md5(text) AS f FROM documents),
    win AS (SELECT f, min(doc_id) AS keeper FROM fp GROUP BY f),
    ex AS (SELECT fp.doc_id, (fp.doc_id = win.keeper) AS exact_keep
           FROM fp JOIN win USING (f))
    SELECT ex.doc_id, ex.exact_keep, g.gopher_pass, sem.semantic_keep,
           (nd.doc_id IS NOT NULL) AS near_dup,
           (ex.exact_keep AND g.gopher_pass AND sem.semantic_keep) AS keep
    FROM ex JOIN g USING (doc_id) JOIN sem USING (doc_id)
      LEFT JOIN nd ON nd.doc_id = ex.doc_id
    """
)


@register("corpus_curation_report", _CURATION_SQL)
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone curation verdict, one row per document: exact-dup
    keep (lowest id per md5 fingerprint), Gopher quality pass,
    semantic-dedup keep (SemDedup over the doc's embedding —
    embeddings.vec_id is documents.doc_id in this corpus), the
    near-dup flag (>= 1 MinHash-LSH candidate, via the stats-only
    summarize path — bucket counts, never the pair stream; VERDICT
    r10 #5), and the conjunction a shard writer would filter on.
    Composes four already-value-checked operator families in ONE
    value-checked query — the oracle nests their exact SQL twins.

    Plan shape: fingerprints + gopher features come from one corpus
    scan (map-side exprs); the only data-sized shuffles are the
    digest groupBy/join pair and the final doc_id join against the
    embedding-derived keep flags."""
    from ong_tsdb_spark.plans import curation

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return curation.curation_report(docs, emb, k=8, iters=2, threshold=0.4)


@register(
    "text_fertility",
    f"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_RE.replace("'", "''")}')) AS BIGINT) AS bpe,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words
      FROM documents)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(bpe) AS DOUBLE) / CAST(sum(words) AS DOUBLE) AS fertility
    FROM t GROUP BY lang
    """,
)
def text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language (BPE-proxy tokens per
    whitespace word) — the diagnostic that flags languages the
    tokenizer fragments and feeds per-language token budgets next to
    corpus_mix_weights (operators/text.fertility_by_lang).  Integer
    sums, one division per group, map-side counting into a |langs|-row
    aggregate."""
    docs = load(spark, sf_dir, "documents")
    return text.fertility_by_lang(docs)


@register(
    "corpus_delta_stats",
    """
    WITH v1 AS (
      SELECT DISTINCT md5(text) AS f FROM documents
      WHERE doc_id < 250 AND text IS NOT NULL),
    v2 AS (
      SELECT DISTINCT md5(text) AS f FROM documents
      WHERE doc_id >= 250 AND text IS NOT NULL),
    j AS (SELECT v1.f AS f1, v2.f AS f2 FROM v1 FULL JOIN v2 ON v1.f = v2.f)
    SELECT CAST(count(f1) AS BIGINT) AS n_v1,
           CAST(count(f2) AS BIGINT) AS n_v2,
           CAST(sum(CASE WHEN f1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN f2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN f1 IS NOT NULL AND f2 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
    FROM j
    """,
)
def corpus_delta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff observability: distinct-content counts of two
    corpus versions plus how many contents were added, removed, and
    retained between them (here v1/v2 are the doc_id halves of the
    test corpus; in production, two snapshot paths).  The metric an
    incremental pipeline monitors to catch silent refresh anomalies —
    e.g. a re-crawl that replaced 90% of content.  One digest shuffle
    per side + a digest full-outer join; document text never moves.
    NULL texts are excluded on both sides — md5(NULL) is NULL, which
    can never match in the join and would count as a phantom add AND
    remove simultaneously."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.filter(F.col("text").isNotNull()).select(
        F.md5("text").alias("f"), "doc_id"
    )
    v1 = fp.filter(F.col("doc_id") < 250).select(F.col("f").alias("f1")).distinct()
    v2 = fp.filter(F.col("doc_id") >= 250).select(F.col("f").alias("f2")).distinct()
    j = v1.join(v2, v1["f1"] == v2["f2"], how="full")
    return j.agg(
        F.count("f1").cast("bigint").alias("n_v1"),
        F.count("f2").cast("bigint").alias("n_v2"),
        F.sum(F.col("f1").isNull().cast("long")).cast("bigint").alias("n_added"),
        F.sum(F.col("f2").isNull().cast("long")).cast("bigint").alias("n_removed"),
        F.sum((F.col("f1").isNotNull() & F.col("f2").isNotNull()).cast("long"))
        .cast("bigint")
        .alias("n_retained"),
    )


_PACK_SEQ_LEN = 512
_PACK_VOCAB = 256
def _pack_chain_ctes(rel: str) -> str:
    """The concat-and-split packing CTE chain over any relation
    providing (doc_id, text) — doc_id is the PACKING ORDER key (the
    epoch integration substitutes its epoch key) — ending in
    ``packed(seq_id, n_real_tokens, n_docs, ids_checksum)``.  Shared
    by corpus_pack_sequences, corpus_epoch_shards, and
    corpus_shuffled_shards so the layout math cannot drift."""
    return f"""
    tk AS (
      -- coalesce: a NULL-text doc is a ZERO-TOKEN member (occupies
      -- one span like any empty doc); bare NULL would null n_tok and
      -- silently drop the doc from the whole layout chain
      SELECT doc_id,
             regexp_extract_all(coalesce(text, ''), '{_bpe_re_sql()}') AS toks
      FROM {rel}),
    tf AS (
      SELECT u AS token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT unnest(toks) AS u FROM tk) GROUP BY u),
    v AS (
      SELECT token,
             CAST(row_number() OVER (ORDER BY tf DESC, token) + 1 AS BIGINT) AS id
      FROM (SELECT token, tf FROM tf ORDER BY tf DESC, token LIMIT {_PACK_VOCAB})),
    occ AS (
      SELECT doc_id, unnest(toks) AS token, unnest(range(len(toks))) AS ord
      FROM tk),
    m AS (
      SELECT o.doc_id, o.ord, CAST(coalesce(v.id, 1) AS BIGINT) AS id
      FROM occ o LEFT JOIN v USING (token)),
    ids AS (
      SELECT doc_id, list(id ORDER BY ord) AS ids FROM m GROUP BY doc_id),
    t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM tk),
    c AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t),
    lay AS (
      SELECT doc_id, n_tok,
             CAST(floor((cum - n_tok) / {_PACK_SEQ_LEN}.0) AS BIGINT) AS bin_id,
             CAST((cum - n_tok) % {_PACK_SEQ_LEN} AS BIGINT) AS off,
             CAST(CASE WHEN n_tok > 0
                       THEN floor((cum - 1) / {_PACK_SEQ_LEN}.0)
                            - floor((cum - n_tok) / {_PACK_SEQ_LEN}.0) + 1
                       ELSE 1 END AS BIGINT) AS spans
      FROM c),
    bs AS (
      SELECT doc_id, n_tok, bin_id, off,
             unnest(range(bin_id, bin_id + spans)) AS seq_id
      FROM lay),
    sl AS (
      SELECT doc_id, seq_id,
             CASE WHEN seq_id = bin_id THEN 1
                  ELSE (seq_id - bin_id) * {_PACK_SEQ_LEN} - off + 1 END AS s,
             least(n_tok, (seq_id - bin_id + 1) * {_PACK_SEQ_LEN} - off) AS e
      FROM bs),
    sq AS (
      SELECT sl.seq_id,
             flatten(list(coalesce(i.ids, [])[sl.s:sl.e] ORDER BY sl.doc_id)) AS ids,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM sl LEFT JOIN ids i USING (doc_id)
      GROUP BY sl.seq_id),
    un AS (
      SELECT seq_id, unnest(ids) AS id, unnest(range(len(ids))) AS ord FROM sq),
    ck AS (
      SELECT seq_id, CAST(sum((ord + 1) * id) AS BIGINT) AS ids_checksum
      FROM un GROUP BY seq_id),
    packed AS (
      SELECT sq.seq_id,
             CAST(len(sq.ids) AS BIGINT) AS n_real_tokens,
             sq.n_docs,
             CAST(coalesce(ck.ids_checksum, 0) AS BIGINT) AS ids_checksum
      FROM sq LEFT JOIN ck USING (seq_id))"""


def _pack_chain_sql(rel: str) -> str:
    return _pack_chain_ctes(rel) + "\n    SELECT * FROM packed"


_PACK_SEQ_SQL = "WITH " + _pack_chain_sql("documents")


_C4_SQL = (
    """
    WITH f AS (
      -- NULL text scores as the EMPTY document, like the operator
      SELECT doc_id, coalesce(text, '') AS text,
             lower(coalesce(text, '')) AS lo,
             string_split(coalesce(text, ''), chr(10)) AS lines,
             list_filter(string_split(coalesce(text, ''), chr(10)),
                         l -> regexp_matches(trim(l), '[.!?"]$')
                              AND len(string_split(trim(l), ' ')) >= 5) AS kept
      FROM documents),
    g AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept_lines,
             CAST(coalesce(len(regexp_extract_all(
                    array_to_string(kept, chr(10)), '[.!?]')), 0)
                  AS BIGINT) AS n_sentences,
             contains(text, '{') AS has_brace,
             ("""
    + " OR ".join(
        f"contains(lo, '{p}')" for p in text.C4_POLICY_PHRASES
    )
    + """) AS has_policy
      FROM f)
    SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_brace, has_policy,
           (n_sentences >= 3 AND NOT has_brace AND NOT has_policy) AS c4_pass
    FROM g
    """
)


@register("text_c4_quality", _C4_SQL)
def text_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) per document —
    line-level terminal-punctuation/5-word filter, the >= 3-sentence
    page rule on the RETAINED lines, and the brace / boilerplate-phrase
    drops (operators/text.c4_quality).  Pure map-side line/array
    expressions; the span-level dedup that completes C4 is
    dedup_passage_stats.  NOTE the synthetic corpus has no newlines or
    terminal punctuation, so every row fails the sentence rule here —
    the operator's semantics are pinned by the hand-built fixtures in
    tests/test_operators.py."""
    docs = load(spark, sf_dir, "documents")
    return text.c4_quality(docs)


_DUP_SPAN_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    wv AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647) AS w
           FROM toks),
    ht AS (SELECT doc_id, n_tokens,
                 CASE WHEN len(w) >= 4
                      THEN list_transform(range(1, len(w)-2),
                             i -> list_reduce(list_prepend(0::BIGINT, w[i:i+3]),
                                              (acc, x) -> (acc * 1000003 + x) % 2147483647))
                      ELSE [] END AS hashes
          FROM wv),
    pos AS (SELECT doc_id, unnest(hashes) AS h, unnest(range(len(hashes))) AS pos
            FROM ht),
    freq AS (SELECT h, count(*) AS c FROM pos GROUP BY h),
    dup AS (SELECT p.doc_id, p.pos FROM pos p JOIN freq USING (h) WHERE c >= 2),
    led AS (SELECT doc_id, pos,
                   lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
            FROM dup),
    cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
                   CAST(sum(least(4, coalesce(np - pos, 4))) AS BIGINT) AS dup_cover_tokens
            FROM led GROUP BY doc_id)
    SELECT ht.doc_id, ht.n_tokens,
           CAST(len(ht.hashes) AS BIGINT) AS n_windows,
           CAST(coalesce(cov.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(coalesce(cov.dup_cover_tokens, 0) AS BIGINT) AS dup_cover_tokens,
           CAST(coalesce(cov.dup_cover_tokens, 0) AS DOUBLE)
             / CAST(ht.n_tokens AS DOUBLE) AS dup_frac
    FROM ht LEFT JOIN cov USING (doc_id)
    """


@register("text_dup_spans", _DUP_SPAN_SQL)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage per document (exact substring dedup,
    Lee et al. 2022): fraction of tokens covered by a 4-token window
    whose Rabin-Karp hash repeats anywhere in the corpus — overlaps
    union-merged exactly (operators/text.dup_span_stats).  The
    suffix-array pass of the paper as a fingerprint inverted index:
    one corpus-sized shuffle on the span hash, per-doc lead/agg, all
    integer arithmetic plus one final division."""
    docs = load(spark, sf_dir, "documents")
    return text.dup_span_stats(docs, k=4)


def _epoch_shards_sql() -> str:
    from .plans.tokenized_shards import EPOCH_KEY_STRIDE

    return (
        "WITH " + _epoch_mix_ctes() + f""",
    sidx AS (
      SELECT source,
             CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS s
      FROM (SELECT DISTINCT source FROM kept)),
    kd AS (
      SELECT k.keep_rank * {EPOCH_KEY_STRIDE} + s.s AS doc_id, d.text
      FROM kept k JOIN sidx s USING (source)
      JOIN documents d ON d.doc_id = k.doc_id),
    """
        + _pack_chain_sql("kd")
    )


@register("corpus_epoch_shards", _epoch_shards_sql())
def corpus_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-epoch-on-disk loop END TO END (VERDICT r7 #8):
    corpus_epoch_mix picks the documents, the canonical round-robin
    interleave (keep_rank asc, source asc) orders them, and the
    corpus_pack_sequences machinery packs them into fixed-length
    training sequences — one row per sequence with the
    order-sensitive positional ids checksum, so the oracle pins
    membership, token ids, AND concat order of the whole pipeline
    (plans/tokenized_shards.epoch_pack_stats).  The SQL twin composes
    the SAME two CTE chains the standalone oracles use."""
    docs = load(spark, sf_dir, "documents")
    return tokenized_shards.epoch_pack_stats(
        docs, vocab_size=_PACK_VOCAB, seq_len=_PACK_SEQ_LEN
    )


_SHUFFLE_BINS = 8  # sequences per shard at the registry's toy seq_len


def _shuffled_shards_sql() -> str:
    from .plans.tokenized_shards import EPOCH_KEY_STRIDE

    return (
        "WITH " + _epoch_mix_ctes() + f""",
    sidx AS (
      SELECT source,
             CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS s
      FROM (SELECT DISTINCT source FROM kept)),
    kd AS (
      SELECT k.keep_rank * {EPOCH_KEY_STRIDE} + s.s AS doc_id, d.text
      FROM kept k JOIN sidx s USING (source)
      JOIN documents d ON d.doc_id = k.doc_id),
    """
        + _pack_chain_ctes("kd")
        + f""",
    sh AS (
      SELECT seq_id,
             CAST(row_number() OVER (
               ORDER BY md5('shuffle|' || seq_id::VARCHAR), seq_id
             ) AS BIGINT) AS shuffle_rank
      FROM packed)
    SELECT p.seq_id, p.n_real_tokens, p.n_docs, p.ids_checksum,
           s.shuffle_rank,
           CAST((s.shuffle_rank - 1) // {_SHUFFLE_BINS} AS BIGINT) AS shard_id
    FROM packed p JOIN sh s USING (seq_id)
    """
    )


@register("corpus_shuffled_shards", _shuffled_shards_sql())
def corpus_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL step of the epoch-on-disk loop: mix -> order -> pack
    (corpus_epoch_shards) -> deterministic EPOCH SHUFFLE
    (plans/tokenized_shards.shuffled_shard_layout) — every training
    sequence gets a pseudo-random global position (md5 rank, computed
    as a bucketed two-level rank, never a global window) and a
    size-balanced shard that is a uniform random sample of the epoch,
    so a loader reading shards sequentially reads shuffled data.
    Re-salting permutes independently per epoch.  The oracle composes
    all three CTE chains, so mix, packing, and shuffle semantics are
    pinned together end to end."""
    from ong_tsdb_spark.operators.dedup import materialize_for_self_join

    docs = load(spark, sf_dir, "documents")
    packed = materialize_for_self_join(
        tokenized_shards.epoch_pack_stats(
            docs, vocab_size=_PACK_VOCAB, seq_len=_PACK_SEQ_LEN
        )
    )
    return tokenized_shards.shuffled_shard_layout(
        packed, bins_per_shard=_SHUFFLE_BINS
    )


@register("corpus_pack_sequences", _PACK_SEQ_SQL)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenized training sequences, value-checked by CONTENT: the
    concat-and-split layout of corpus_pack_stats MATERIALIZED — per
    fixed-length sequence, its real-token count, how many documents it
    straddles, and a positional checksum of the token ids (so the
    cross-engine hash pins id values AND concat order, not just
    counts).  Tokens ride the BPE-proxy pretokenizer with a
    frequency-ranked top-{vocab} vocabulary (PAD=0, UNK=1, ties by
    token string — fully deterministic; plans/tokenized_shards).  The
    binary-blob writer (write_tokenized_shards) shares this exact
    pipeline, so a green row here certifies the shard content too."""
    docs = load(spark, sf_dir, "documents")
    return tokenized_shards.pack_sequence_stats(
        docs, vocab_size=_PACK_VOCAB, seq_len=_PACK_SEQ_LEN
    )


def _bucket_sql(tok_expr: str, n: int) -> str:
    """DuckDB twin of text.hash_bucket: first 8 md5 hex chars as a
    bigint, mod the bucket count — shared by the classifier and DSIR
    oracles so the feature hash cannot drift between them."""
    return f"('0x' || substr(md5({tok_expr}), 1, 8))::BIGINT % {n}"


def _clf_sql() -> str:
    w = text.classifier_weights()
    n = len(w)
    wl = ",".join(str(int(x)) for x in w)
    return f"""
    WITH w AS (SELECT [{wl}]::BIGINT[] AS wl),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(toks,
                  tok -> wl[CAST({_bucket_sql("tok", n)} AS INT) + 1]))
               AS BIGINT) AS score
      FROM t, w)
    SELECT doc_id, n_tokens, score,
           CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_weight,
           score > 0 AS clf_pass
    FROM s
    """


def _clf_train_sql() -> str:
    n, s = text.CLF_BUCKETS, 1000
    return f"""
    WITH st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(length(text)) AS BIGINT) AS s
      FROM documents),
    lab AS (
      SELECT text, (length(text) * st.n > st.s) AS lab
      FROM documents, st),
    occ AS (
      SELECT unnest(string_split(text, ' ')) AS tok, lab FROM lab),
    agg AS (
      SELECT {_bucket_sql("tok", n)} AS bucket,
             CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
      FROM occ GROUP BY 1)
    SELECT bucket, n_pos, n_neg,
           CAST((n_pos * {s}) // (n_pos + n_neg + 1) - {s // 2} AS BIGINT)
             AS weight
    FROM agg
    """


@register("text_classifier_train", _clf_train_sql())
def text_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the quality classifier on-cluster (operators/text.
    nb_train_weights) — closes the model-filtering loop the same way
    corpus_epoch_shards closed the mixing loop: text_classifier_quality
    APPLIES a weight table; this entry LEARNS one, as integer-exact
    per-bucket purity weights over the same hash_bucket feature space
    (Naive-Bayes-flavored, add-one smoothed, floor-div so no
    transcendental drifts cross-engine).  Weak labels derive from the
    corpus itself (integer-exact longer-than-mean).  One 1-row stats
    broadcast + one bucket-keyed count aggregate: the shuffle carries
    <= 256 rows per mapper at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    return text.nb_train_weights(docs)


@register("text_classifier_quality", _clf_sql())
def text_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/text.classifier_quality):
    a hashed bag-of-words LINEAR classifier scored over every document
    — the execution shape of fastText-style quality/toxicity filters
    and the FineWeb-Edu educational-value model.  The deterministic
    integer weight vector stands in for trained coefficients; it rides
    the plan as a broadcast literal and scoring is a pure column
    expression over the token array (no explode, no shuffle, no
    Python) — at 100 TB the cost is exactly the corpus scan.  Integer
    score (order-free sum) + one correctly-rounded division, so the
    row set is bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents")
    return text.classifier_quality(docs)


def _dsir_sql() -> str:
    n = text.DSIR_BUCKETS
    bucket = _bucket_sql("tok", n)
    return f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    e AS (
      SELECT {bucket} AS b, CAST(lang = 'en' AS INT) AS is_t
      FROM (SELECT lang, unnest(toks) AS tok FROM t)),
    c AS (SELECT b, count(*) AS raw, sum(is_t) AS tgt FROM e GROUP BY b),
    fullb AS (
      SELECT r.b, coalesce(c.raw, 0) AS raw, coalesce(c.tgt, 0) AS tgt
      FROM (SELECT unnest(range(0, {n})) AS b) r LEFT JOIN c USING (b)),
    w AS (SELECT list((tgt + 1)::DOUBLE / (raw + 1)::DOUBLE ORDER BY b) AS wl FROM fullb),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             list_reduce(list_transform(toks,
                  tok -> wl[CAST({bucket} AS INT) + 1]),
                  (a, x) -> a + x) AS imp_sum,
             (lang = 'en') AS is_target
      FROM t, w)
    SELECT doc_id, n_tokens, imp_sum,
           imp_sum / CAST(n_tokens AS DOUBLE) AS imp_mean,
           is_target
    FROM s
    """


@register("corpus_dsir_weights", _dsir_sql())
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) with lang='en' as the
    target domain (operators/text.dsir_importance): hashed-unigram
    raw/target distributions from ONE map-side-combined token
    aggregate, then a per-document likelihood-ratio score as a pure
    column expression with the 64-weight model as a plan literal.  The
    data-selection stage that tilts a 100-TB crawl toward a target
    domain — corpus cost is one aggregate plus the scan.  Rational
    add-one ratios instead of the paper's log-ratios keep every
    operation correctly rounded (bit-identical cross-engine; deviation
    documented in the operator)."""
    docs = load(spark, sf_dir, "documents")
    return text.dsir_importance(docs)


def _pq_sql(
    m: int = 4, k: int = 8, iters: int = 2, dim: int = 64, topk: int = 10
) -> str:
    """DuckDB twin of the PQ/ADC pipeline: m independent unrolled
    Lloyd's chains (one per subspace slice of the embedding), exact
    per-subspace code assignment, the asymmetric distance table from
    the trained codebooks and the quantized query, and the final
    integer ADC sum — bit-identical because every step is bigint
    arithmetic (see _ivf_train_sql)."""
    sub = dim // m
    chains, afs, dts = [], [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes, prev = _ivf_train_sql(
            k, iters, sub, suffix=f"_p{s}", vec_expr=f"embedding[{lo}:{hi}]",
            elig_expr="embedding",
        )
        chains.append(ctes)
        afs.append(f"af_p{s} AS ({_ivf_af_sql(prev, sub, suffix=f'_p{s}')})")
        dts.append(
            f"""dt_p{s} AS (
      SELECT c.cid, {_ivf_l2_sql("qq.qv", "c.cv", sub)} AS d
      FROM {prev} c CROSS JOIN (SELECT qv FROM q0_p{s} WHERE vec_id = 0) qq)"""
        )
    joins = " ".join(
        f"JOIN af_p{s} a{s} ON a{s}.vec_id = a0.vec_id" for s in range(1, m)
    )
    dt_joins = " ".join(f"JOIN dt_p{s} d{s} ON d{s}.cid = a{s}.cid" for s in range(m))
    adc = " + ".join(f"d{s}.d" for s in range(m))
    return f"""
    WITH {",".join(chains)},
    {",".join(afs)},
    {",".join(dts)}
    SELECT vec_id, adc_dist, rank FROM (
      SELECT vec_id, adc_dist,
             CAST(row_number() OVER (ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
      FROM (
        SELECT a0.vec_id, CAST({adc} AS BIGINT) AS adc_dist
        FROM af_p0 a0 {joins} {dt_joins}
        WHERE a0.vec_id <> 0)
    ) WHERE rank <= {topk}
    """


@register("emb_pq_adc_topk", _pq_sql())
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric-distance top-k (Jegou et al.
    2011; operators/similarity.train_pq_codebooks_exact / pq_adc_topk):
    4 integer-exact sub-codebooks compress each 64-dim vector to 4
    codes; search is m table lookups + integer adds per row with the
    distance table as plan literals, then TakeOrderedAndProject.  The
    memory side of billion-scale ANN — 256 B/vector becomes 4 B, no
    float math in the scan — and fully value-checked: training,
    encoding and ADC are bigint arithmetic end to end, so the DuckDB
    twin (4 unrolled Lloyd's chains) matches rows+schema+hash."""
    emb = load(spark, sf_dir, "embeddings")
    books = similarity.train_pq_codebooks_exact(emb, m=4, k=8, iters=2)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.pq_adc_topk(emb, books, qvec, topk=10, exclude_ids=[0])


_BPE_PAIRS_SQL = """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS wd FROM documents),
    p AS (SELECT unnest(list_transform(range(1, length(wd)), i -> wd[i:i+1])) AS pair
          FROM w WHERE length(wd) >= 2),
    c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY pair)
    SELECT pair, cnt, rank FROM (
      SELECT pair, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
      FROM c
    ) WHERE rank <= 20
    """


@register("text_bpe_pairs", _BPE_PAIRS_SQL)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair statistics (Sennrich et al. 2016;
    operators/text.bpe_pair_counts): corpus-wide adjacent-character
    pair frequencies, top-20 — the argmax table each merge round of
    plans/bpe.train_bpe_merges consumes (this row set is the round-0
    state, so a green row value-checks the trainer's counting step).
    Pairs come from map-side substring windows (no per-char explode)
    and hash-combine before the shuffle, which therefore carries
    alphabet^2-bounded rows, never the corpus token stream."""
    docs = load(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs)


_CHUNK_W, _CHUNK_S = 64, 48

_CHUNK_SQL = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT doc_id, toks,
                 1 + (greatest(len(toks) - {_CHUNK_W}, 0) + {_CHUNK_S - 1}) // {_CHUNK_S} AS n
          FROM t),
    e AS (SELECT doc_id, toks, unnest(range(0, n)) AS ci FROM b)
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(len(toks[ci*{_CHUNK_S}+1 : ci*{_CHUNK_S}+{_CHUNK_W}]) AS BIGINT) AS n_words,
           md5(array_to_string(toks[ci*{_CHUNK_S}+1 : ci*{_CHUNK_S}+{_CHUNK_W}], ' ')) AS chunk_hash
    FROM e
    """


@register("doc_chunk_stats", _CHUNK_SQL)
def doc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking (operators/text.chunk_table):
    64-word windows advancing by 48 (16-word overlap), last window
    short — one row per chunk with its content-address hash, the
    table a retrieval pipeline embeds and indexes.  Map-side generate
    + slice, zero shuffle; value-checked chunk-for-chunk (the md5
    content hash pins window boundaries AND word order against the
    DuckDB twin)."""
    docs = load(spark, sf_dir, "documents")
    return text.chunk_table(docs, chunk_words=_CHUNK_W, stride=_CHUNK_S)


@register("emb_pq_recall", _recall_vs_brute_sql(_pq_sql()))
def emb_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the PQ/ADC path against the exact brute-force
    cosine ranking — the third ANN family's quality metric, closing
    the eval loop for LSH (emb_ann_recall), IVF (emb_ivf_recall) and
    PQ.  ADC ranks by compressed integer L2 while brute ranks by
    cosine, so this measures the real deployment question: how much
    ranking quality the 64x memory compression costs.  Deterministic
    end to end (integer-exact codebooks), so the evaluation itself is
    value-checked against an oracle nesting the four Lloyd's chains."""
    return _recall_vs_brute(spark, sf_dir, emb_pq_adc_topk)


_FUNNEL_SQL = """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
    SELECT stage, stage_idx, n_users FROM (
      SELECT 'view' AS stage, CAST(1 AS BIGINT) AS stage_idx,
             CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 'click', CAST(2 AS BIGINT),
             CAST((SELECT count(*) FROM s2) AS BIGINT)
      UNION ALL
      SELECT 'purchase', CAST(3 AS BIGINT),
             CAST((SELECT count(*) FROM s3) AS BIGINT))
    """


@register("events_funnel", _FUNNEL_SQL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users who
    viewed, then clicked STRICTLY after their first view, then
    purchased strictly after that first qualifying click — the
    sequential-pattern analytic (product funnels, pipeline-stage
    tracking) expressed as min-aggregate + join chaining, no windows
    over the full stream and no per-user state.

    Scale shape: three user-keyed aggregates and two user-keyed
    equi-joins — every shuffle is bounded by the user cardinality,
    never the event count (the min-aggs partial-combine map-side); at
    100 TB with events bucketed by user_id the joins are
    co-partitioned and shuffle-free.  Timestamps ride the
    dtype-adaptive epoch-us helpers, integer comparisons only."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.col("user_id"), F.col("event_type"), _us(ev, "ts").alias("us")
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def row(stage: str, idx: int, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(idx).cast("bigint").alias("stage_idx"),
            F.count("*").cast("bigint").alias("n_users"),
        )

    return row("view", 1, s1).unionByName(row("click", 2, s2)).unionByName(
        row("purchase", 3, s3)
    )


_IJ_WIN_US = 5 * 60 * US  # ±5-minute incident window around each error


@register(
    "events_interval_join",
    f"""
    WITH e AS (SELECT event_id, epoch_us(ts) AS us, event_type, value FROM events),
    iv AS (SELECT event_id AS err_id,
                  us - {_IJ_WIN_US} AS start_us,
                  us + {_IJ_WIN_US} AS end_us
           FROM e WHERE event_type = 'error')
    SELECT iv.err_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e2.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM iv JOIN e e2 ON e2.us BETWEEN iv.start_us AND iv.end_us
    GROUP BY iv.err_id
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range-overlap) join via the chunked bin join
    (operators/intervaljoin.py): every event within ±5 minutes of each
    error event, aggregated per incident window — the blast-radius
    query that, written naively as ``ts BETWEEN start AND end``, Spark
    plans as a broadcast-nested-loop.  The bin join replaces that with
    one chunk-keyed equi-join (plan-pinned NestedLoop-free by
    test_interval_join_matches_naive_and_plan); the DECIMAL sum keeps
    the value aggregate exact/order-free as everywhere else."""
    from .operators.intervaljoin import interval_join

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_id"), _us(ev, "ts").alias("us"),
        F.col("event_type"), F.col("value"),
    )
    iv = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        (F.col("us") - F.lit(_IJ_WIN_US)).alias("start_us"),
        (F.col("us") + F.lit(_IJ_WIN_US)).alias("end_us"),
    )
    return (
        interval_join(
            e.select("us", "value"), iv, chunk_us=2 * _IJ_WIN_US
        )
        .groupBy("err_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "events_retention",
    f"""
    WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS period
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    f AS (SELECT user_id, min(period) AS cohort FROM w GROUP BY user_id)
    SELECT f.cohort AS cohort, w.period AS period,
           CAST(w.period - f.cohort AS BIGINT) AS periods_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM w JOIN f USING (user_id)
    GROUP BY f.cohort, w.period
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle (operators/events.py
    retention_cohorts): users cohorted by first-activity week, active
    members counted per (cohort, week).  Pure integer period math on
    epoch-us, so the triangle is bit-identical cross-engine; every
    shuffle is user- or (cohort, period)-bounded, never event-count
    bounded (the distinct and the min-agg both partial-combine
    map-side)."""
    from .operators.events import retention_cohorts

    ev = load(spark, sf_dir, "events")
    e = ev.select(F.col("user_id"), _us(ev, "ts").alias("us"))
    return retention_cohorts(e, us_col="us", user_col="user_id",
                             period_us=WEEK_US)


#: bipartite order->part edge list: dst offset keeps key spaces disjoint
_PR_DST_OFFSET = 1_000_000_000
_PR_SCALE = 1_000_000_000


def _pagerank_sql(iters: int = 6) -> str:
    """Unrolled integer-exact PageRank twin of operators/graph.py
    pagerank_exact: per round one contribution CTE (floor-divided
    per-edge shares summed per dst) and one score CTE (damped floor
    division).  All operands positive, so DuckDB ``//`` (truncating)
    == Spark ``div`` == Python floor division — bit-identical."""
    base = 3 * _PR_SCALE  # (den - num) * scale with 17/20 damping
    ctes = [
        f"""e AS (SELECT l_orderkey AS s, {_PR_DST_OFFSET} + l_partkey AS d
           FROM lineitem),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    deg AS (SELECT s, count(*) AS outdeg FROM e GROUP BY s),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS score FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
      SELECT e.d AS node, SUM(r.score // g.outdeg) AS inc
      FROM e JOIN r{i - 1} r ON r.node = e.s JOIN deg g ON g.s = e.s
      GROUP BY e.d),
    r{i} AS (
      SELECT n.node,
             CAST(({base} + 17 * COALESCE(c.inc, 0)) // 20 AS BIGINT) AS score
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"""
        )
    return f"""
    WITH {",".join(ctes)}
    SELECT node, CAST(score AS BIGINT) AS pr_scaled,
           score::DOUBLE / {_PR_SCALE}.0 AS pr
    FROM r{iters}
    """


@register("graph_pagerank", _pagerank_sql(iters=6))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/graph.py pagerank_exact) over
    the bipartite order->part graph from lineitem — part importance by
    order in-links, the link-analysis primitive a crawl-corpus curation
    pipeline ranks domains with (Gopher/CCNet keep-lists).  Scores are
    scale-2^0 bigints with rational 17/20 damping and floor-divided
    shares: no float anywhere in the loop, so the fixed-point is
    partition-independent and value-checked against the unrolled CTE
    twin.  Per round: one node-keyed equi-join + one dst-keyed integer
    sum; localCheckpoint per round cuts the lineage (same pattern as
    connected_components)."""
    from .operators.graph import pagerank_exact

    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("src"),
        (F.lit(_PR_DST_OFFSET) + F.col("l_partkey")).alias("dst"),
    )
    return pagerank_exact(edges, iters=6, scale=_PR_SCALE)


@register(
    "text_bigram_novelty",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])) AS g
           FROM toks WHERE len(t) >= 2),
    c AS (SELECT g, count(*) AS cnt FROM bg GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN c.cnt < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           SUM(CASE WHEN c.cnt < 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE AS novelty
    FROM bg JOIN c USING (g)
    GROUP BY doc_id
    """,
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-novelty scoring (operators/text.py bigram_novelty): the
    integer-exact proxy for LM-perplexity filtering — per document, how
    many of its word bigrams are corpus-unique.  Bigrams hash-combine
    map-side into the corpus count; the per-doc join is bigram-keyed;
    the single float is one final bigint/bigint division, identical
    IEEE result in both engines."""
    docs = load(spark, sf_dir, "documents")
    return text.bigram_novelty(docs)


@register(
    "dedup_ledger_replay",
    """
    WITH b0 AS (
      -- coalesce mirrors streaming.content_fingerprint (NULL -> '')
      SELECT min(doc_id) AS doc_id, md5(coalesce(text, '')) AS fingerprint
      FROM documents WHERE doc_id < 250 GROUP BY md5(coalesce(text, ''))),
    b1all AS (
      SELECT min(doc_id) AS doc_id, md5(coalesce(text, '')) AS fingerprint
      FROM documents WHERE doc_id >= 250 GROUP BY md5(coalesce(text, ''))),
    b1 AS (
      SELECT f.doc_id, f.fingerprint FROM b1all f
      LEFT JOIN b0 ON b0.fingerprint = f.fingerprint
      WHERE b0.fingerprint IS NULL)
    SELECT CAST(0 AS BIGINT) AS batch, doc_id, fingerprint FROM b0
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS batch, doc_id, fingerprint FROM b1
    """,
)
def dedup_ledger_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIVE streaming ledger protocol (streaming/dedup.py), driven
    batch-by-batch: two micro-batches of documents run through the
    real ``dedup_batch_against_ledger`` anti-join with REAL Parquet
    ledger partitions written between them (``ledger/batch=N``, the
    same per-batch idempotent directories ``start_ledger_dedup``'s
    foreachBatch commits) — so a green row certifies the on-disk
    ledger handoff between batches, not just the within-batch SQL the
    ``dedup_ledger_backfill`` twin already pins.  Output is the full
    survivor set of both batches keyed by batch id.  Scale shape: per
    batch one digest shuffle + one digest-keyed anti-join against a
    digests-only ledger scan — state grows with distinct content,
    never stream length."""
    import shutil
    import tempfile

    from .streaming.dedup import FINGERPRINT_COL, dedup_batch_against_ledger

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="ledger_replay_")
    ledger_path = f"{base}/ledger"
    try:
        outs = []
        for bid, pred in ((0, F.col("doc_id") < 250), (1, F.col("doc_id") >= 250)):
            # evaluate the anti-join BEFORE this batch's ledger write
            # (the same localCheckpoint ordering start_ledger_dedup
            # uses); the eager checkpoint also means the survivor rows
            # no longer reference the on-disk ledger afterwards
            surv = dedup_batch_against_ledger(
                spark, docs.filter(pred), ledger_path, "text", exclude_batch=bid
            ).localCheckpoint(eager=True)
            surv.select(FINGERPRINT_COL).distinct().write.mode(
                "overwrite"
            ).parquet(f"{ledger_path}/batch={bid}")
            outs.append(
                surv.select(
                    F.lit(bid).cast("bigint").alias("batch"),
                    "doc_id",
                    F.col(FINGERPRINT_COL).alias("fingerprint"),
                )
            )
        return outs[0].unionByName(outs[1])
    finally:
        # every invocation (bench best-of-N, replay, driver) would
        # otherwise leave a parquet ledger behind in /tmp
        shutil.rmtree(base, ignore_errors=True)


def _near_ledger_sql() -> str:
    """DuckDB twin of the NEAR-dup ledger protocol's two-batch replay:
    the same md5+substr minhash family the (driver-green)
    dedup_minhash_lsh oracle pins, at the streaming tier's parameters
    (4-word shingles, 16 hashes, 4 bands of 4), band keys md5-hashed
    with their band index, short docs (< 4 words) keyed exactly —
    streaming/dedup.py near_band_keys_table line for line."""

    def reps(pred: str, name: str) -> str:
        # coalesce mirrors streaming.content_fingerprint (NULL -> '')
        return f"""{name} AS (
      SELECT min(doc_id) AS doc_id FROM documents WHERE {pred}
      GROUP BY md5(coalesce(text, '')))"""

    def keys(src: str, name: str) -> str:
        # band keys for >=4-word docs + exact keys for shorter ones;
        # NULL text -> '' like near_band_keys_table's up-front coalesce
        return f"""toks_{name} AS (
      SELECT d.doc_id, coalesce(d.text, '') AS text,
             string_split(coalesce(d.text, ''), ' ') AS t
      FROM documents d JOIN {src} USING (doc_id)),
    sh_{name} AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1)),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingle
      FROM toks_{name} WHERE len(t) >= 4),
    mh_{name} AS (
      SELECT doc_id, seed, min(h) AS h FROM (
        SELECT doc_id, s.seed * 4 + j.j AS seed,
               substr(md5(s.seed::VARCHAR || '|' || shingle), j.j * 8 + 1, 8) AS h
        FROM sh_{name} CROSS JOIN range(0, 4) s(seed) CROSS JOIN range(0, 4) j(j)
      ) GROUP BY doc_id, seed),
    {name} AS (
      SELECT doc_id,
             md5('b' || (seed // 4)::VARCHAR || '|' ||
                 string_agg(h, '|' ORDER BY seed)) AS fp
      FROM mh_{name} GROUP BY doc_id, seed // 4
      UNION ALL
      SELECT doc_id, md5('exact|' || text) AS fp
      FROM toks_{name} WHERE len(t) < 4)"""

    return f"""
    WITH {reps("doc_id < 250", "b0")},
    {reps("doc_id >= 250", "r1")},
    {keys("b0", "k0")},
    {keys("r1", "k1")},
    dup1 AS (
      SELECT DISTINCT k1.doc_id FROM k1
      JOIN (SELECT DISTINCT fp FROM k0) l USING (fp))
    SELECT CAST(0 AS BIGINT) AS batch, doc_id FROM b0
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS batch, r1.doc_id
    FROM r1 LEFT JOIN dup1 USING (doc_id)
    WHERE dup1.doc_id IS NULL
    """


@register("dedup_near_ledger_replay", _near_ledger_sql())
def dedup_near_ledger_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live streaming NEAR-DUP ledger tier
    (streaming/dedup.py:366-510), driven batch-by-batch like
    dedup_ledger_replay but with MinHash BAND KEYS as the ledger
    currency: batch 0's survivors contribute every band key of their
    4-word-shingle signature (short docs an exact content key) to a
    REAL parquet ledger partition; batch 1 is exact-deduped
    within-batch, then drops every document sharing >= 1 band key
    with that ledger — the crash-safe near-dup protocol
    ``start_near_ledger_dedup`` commits per micro-batch, value-checked
    end to end against the md5-minhash SQL family the
    dedup_minhash_lsh oracle already pins.  Scale shape: one
    batch-sized minhash aggregate + a band-key semi-join against a
    keys-only ledger scan; ledger state = 32-hex keys x 4 bands per
    distinct surviving document."""
    import shutil
    import tempfile

    from .streaming.dedup import (
        FINGERPRINT_COL,
        near_dedup_batch_against_ledger,
        near_keys_of,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="near_ledger_replay_")
    ledger_path = f"{base}/ledger"
    try:
        outs = []
        for bid, pred in ((0, F.col("doc_id") < 250), (1, F.col("doc_id") >= 250)):
            # return_keys mirrors the LIVE hook pair in
            # start_near_ledger_dedup (optimization r15): the batch's
            # checkpointed band-key table feeds both the dup semi-join
            # and — survivor-filtered by id — the ledger write, instead
            # of re-running the whole shingle+minhash aggregate for
            # near_keys_of.  Keys are a pure function of the text, so
            # the written ledger is value-identical either way (the
            # first batch, with no ledger and hence no keys table yet,
            # still derives from the survivors like the replay path).
            surv, keys = near_dedup_batch_against_ledger(
                spark, docs.filter(pred), ledger_path, "text",
                exclude_batch=bid, return_keys=True,
            )
            surv = surv.localCheckpoint(eager=True)
            if keys is None:
                kdf = near_keys_of(surv, "text")
            else:
                kdf = (
                    keys.join(
                        surv.select("doc_id"), on="doc_id", how="left_semi"
                    )
                    .select(FINGERPRINT_COL)
                    .distinct()
                )
            kdf.write.mode("overwrite").parquet(f"{ledger_path}/batch={bid}")
            outs.append(
                surv.select(
                    F.lit(bid).cast("bigint").alias("batch"), "doc_id"
                )
            )
        return outs[0].unionByName(outs[1])
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "dedup_ledger_crash_replay",
    """
    WITH b0 AS (
      -- coalesce mirrors streaming.content_fingerprint (NULL -> '')
      SELECT min(doc_id) AS doc_id FROM documents
      WHERE doc_id < 250 GROUP BY md5(coalesce(text, ''))),
    b0fp AS (
      SELECT md5(coalesce(text, '')) AS fp FROM documents WHERE doc_id < 250),
    b1in AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents
      WHERE doc_id < 50),
    b1all AS (
      SELECT min(doc_id) AS doc_id, md5(coalesce(text, '')) AS fp
      FROM b1in GROUP BY md5(coalesce(text, ''))),
    b1 AS (
      SELECT f.doc_id FROM b1all f
      LEFT JOIN (SELECT DISTINCT fp FROM b0fp) l ON l.fp = f.fp
      WHERE l.fp IS NULL)
    SELECT CAST(0 AS BIGINT) AS batch, doc_id FROM b0
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS batch, doc_id FROM b1
    """,
)
def dedup_ledger_crash_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRASH-RECOVERY of the live streaming ledger (VERDICT r6 #8):
    drives the REAL ``start_ledger_dedup`` Structured Streaming query
    (file source, availableNow trigger, foreachBatch) through the
    hardest documented replay window — batch 0 committed, its ledger
    partition COMPACTED into ``batch=-1``, then the CHECKPOINT lost
    (redeploy/crash), so the restarted query re-delivers batch 0.
    The replay branch must keep the committed output and re-derive
    the ledger keys from it; a buggy recompute would anti-join batch
    0 against its own compacted digests (which self-exclusion cannot
    see) and emit an EMPTY batch — a value-visible failure this
    oracle catches, not just a row-count one.  Batch 1 — the fresh
    half of the corpus PLUS re-keyed copies of 50 batch-0 documents
    (the testdata has no exact duplicates of its own, so the copies
    make the post-crash ledger drop itself value-visible) — then
    streams through the same checkpoint and must drop every copy.
    Output: (batch, doc_id) survivors of both batches — identical to
    the no-crash protocol by construction."""
    import os
    import shutil
    import tempfile

    from .streaming.dedup import compact_ledger, start_ledger_dedup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="ledger_crash_replay_")
    src = f"{base}/src"
    ledger, out = f"{base}/ledger", f"{base}/out"
    os.makedirs(src)
    try:
        def run(ckpt: str) -> None:
            stream = spark.readStream.schema("doc_id long, text string").json(src)
            q = start_ledger_dedup(
                spark, stream, ledger_path=ledger, out_path=out,
                checkpoint_path=f"{base}/{ckpt}",
            )
            q.awaitTermination(300)

        docs.filter(F.col("doc_id") < 250).write.mode("append").json(src)
        run("ckpt1")                       # batch 0 commits out + ledger
        compact_ledger(spark, ledger)      # folds batch 0 keys -> batch=-1
        shutil.rmtree(f"{base}/ckpt1")     # the crash: checkpoint lost
        run("ckpt2")                       # batch 0 REPLAYED -> must no-op
        b1 = docs.filter(F.col("doc_id") >= 250).unionByName(
            docs.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + F.lit(10000)).alias("doc_id"), "text"
            )
        )
        b1.write.mode("append").json(src)
        run("ckpt2")                       # batch 1 drops vs ledger
        surv = spark.read.parquet(out).select(
            F.col("batch").cast("bigint").alias("batch"), "doc_id"
        )
        # tmpdir is removed on return — materialize off the parquet
        return surv.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _topic_sample_sql(total: int = 256, k: int = 8, iters: int = 2,
                      dim: int = 64) -> str:
    """DuckDB twin of similarity.topic_balanced_sample: the unrolled
    Lloyd's chain + per-vector integer distances (the emb_centroid_dist
    oracle), then k-row integer proportional quotas and the
    prototype-first within-cluster ranking."""
    ctes, prev = _ivf_train_sql(k, iters, dim)
    return f"""
    WITH {ctes},
    af AS ({_ivf_af_sql(prev, dim)}),
    scored AS (
      SELECT af.vec_id, CAST(af.cid AS INT) AS cid,
             CAST({_ivf_l2_sql("q.qv", "c.cv", dim)} AS BIGINT) AS sqdist
      FROM af JOIN q0 q ON q.vec_id = af.vec_id
              JOIN {prev} c ON c.cid = af.cid),
    quotas AS (
      SELECT cid, CAST(({total} * count(*)) // (SELECT count(*) FROM scored)
                  AS BIGINT) AS quota
      FROM scored GROUP BY cid),
    ranked AS (
      SELECT vec_id, cid, sqdist,
             CAST(row_number() OVER (PARTITION BY cid
                                     ORDER BY sqdist, vec_id) AS BIGINT) AS rank
      FROM scored)
    SELECT r.vec_id, r.cid, r.sqdist, r.rank
    FROM ranked r JOIN quotas q USING (cid)
    WHERE r.rank <= q.quota
    """


@register("corpus_topic_sample", _topic_sample_sql())
def corpus_topic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced prototype-first sampling
    (similarity.topic_balanced_sample): the topic-rebalance curation
    pass — integer-exact k-means clusters, integer proportional
    quotas (floor(total * n_c / N)), and each cluster's quota filled
    by its most PROTOTYPICAL members (lowest bigint L2 to the
    centroid, Sorscher et al. 2022 easy-first).  Composes two
    driver-proven primitives (the Lloyd's chain of emb_centroid_dist
    and a k-row quota plan like corpus_mix_weights), so the whole
    keep-set is bit-identical cross-engine.  Scale shape: map-side
    scoring + k-row broadcasts + one cluster-partitioned window."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.topic_balanced_sample(emb, total=256, k=8, iters=2)


@register("emb_kmeans_k64", _centroid_dist_sql(k=64, iters=2, dim=64))
def emb_kmeans_k64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integer-exact Lloyd's trainer at NON-TOY k: k=64 centroids
    (vs the k=8 of every other ANN/PQ oracle), proving the trainer's
    k x (dim+1)-cells-per-iteration shuffle claim holds when the
    centroid table stops being tiny — same unrolled-CTE oracle, same
    2^20-quantized bigint arithmetic, just LIMIT 64 seeds.  Output is
    the full prototypicality ranking against the k=64 codebook."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.centroid_distances(emb, k=64, iters=2)


# ======================================================================
# driver sample rotation: the correctness driver checks the FIRST 50
# registry entries (dict order).  Rotation policy (VERDICT r4 #1/#3,
# r5 #3): rotate a DIFFERENT subset out each round so every entry is
# driver-re-proven at least every other round; keep the head <= 50 so
# no entry silently falls outside the window
# (test_registry_window_invariants enforces the cap).
#
# Round-7 head (everything NOT in the tail below) = the planner's
# staleness order over r01..r06 evidence (`tools/rotate.py --write`,
# VERDICT r6 #3): the two never-proven round-7 registrations first
# (corpus_epoch_mix, dedup_ledger_crash_replay), then the EIGHT
# r4-green holdovers (text_vocab, text_contamination, ts_range_read,
# ts_rolling_mean, ts_snap_grid, tpch_q1, tpch_q6, ts_delta — last
# driver-green r4, two rounds ago), then 40 r5-green entries.  The
# 59-entry tail is entirely r5/r6
# green and ordered stalest-first, so the r5-green block rotates back
# in at r8 — the planner printed ZERO entries that slip past the
# two-round cadence this round.  The `# planned-on:` marker below
# records the evidence window this rotation was computed over;
# test_rotation_planner_invariants recomputes the plan restricted to
# that window (so driver-written CORRECTNESS_r07.json cannot flip the
# suite red — VERDICT r6 #1) and checks head-cap / never-proven /
# idempotence against ALL evidence unconditionally.  New entries
# registered mid-round go in the head (never in this tail) until the
# next --write.
# ======================================================================

# --- TAIL_ROTATION BEGIN (managed by tools/rotate.py) ---
# planned-on: r01..r14 @ a1ef828c4c42
_TAIL_ROTATION = [
    "ts_range_read",
    "ts_snap_grid",
    "ts_downsample_first",
    "ts_checksum_nansum",
    "influx_roundtrip",
    "tpch_q1",
    "tpch_q3_topk",
    "tpch_q5ish",
    "part_brand_agg",
    "emb_label_centroids",
    "ts_asof_join",
    "tpch_rollup",
    "events_json_extract",
    "tpch_q6",
    "ts_pivot_daily",
    "ts_percentiles",
    "orders_with_late_lines",
    "customers_without_recent_orders",
    "ts_sessionize",
    "users_set_ops",
    "top_orders_per_priority",
    "ts_gap_fill_linear",
    "ts_rate",
    "ts_value_histogram",
    "ts_cumulative_sum_chunked",
    "multimodal_features",
    "corpus_clean_pipeline",
    "ts_moving_range_avg",
    "multimodal_frame_sample",
    "text_rolling_fingerprint",
    "text_bpe_tokens",
    "dedup_winnow",
    "dedup_clusters",
    "dedup_ledger_backfill",
    "emb_ann_recall",
    "emb_ivf_recall",
    "corpus_curation_report",
    "text_c4_quality",
    "text_dup_spans",
    "text_classifier_train",
    "text_classifier_quality",
    "corpus_dsir_weights",
    "events_funnel",
    "graph_pagerank",
    "text_bigram_novelty",
    "dedup_ledger_replay",
    "dedup_near_ledger_replay",
    "dedup_ledger_crash_replay",
    "corpus_topic_sample",
    "emb_kmeans_k64",
]
# --- TAIL_ROTATION END ---


def _rotate_registry() -> None:
    head = {k: v for k, v in REGISTRY.items() if k not in _TAIL_ROTATION}
    tail = {k: REGISTRY[k] for k in _TAIL_ROTATION if k in REGISTRY}
    REGISTRY.clear()
    REGISTRY.update(head)
    REGISTRY.update(tail)


_rotate_registry()


# ======================================================================
# public surface used by __spark_entry__
# ======================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grafana-style downsample (W1) on sf0.001."""
    return ts_downsample_first(spark, "/root/testdata/sf0.001")
