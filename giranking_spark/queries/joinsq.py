"""Temporal-join queries: as-of join and range join over the events table.

The reference has neither operator (SURVEY.md §2.4 "range / as-of joins:
not present"); these are the training-data-pipeline staples (attribution,
look-back features). The DuckDB oracles use DuckDB's *native* ASOF JOIN and
inequality join — a genuinely independent implementation of the same
semantics, so a value-hash match is strong evidence the scalable Spark
formulations (window last / chunk-bucketed equi-join) are correct.

Timestamps are epoch MICROSECONDS on both sides: the parquet physical
type is TIMESTAMP(MICROS) NTZ; both engines compare epoch-µs integers
(load_events ``ts_us`` vs DuckDB ``epoch_us``). NULL-able match columns are coalesced to -1 on both sides so
pandas dtypes stay int64 for the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from giranking_spark.operators.joins import asof_join, bucket_range_join
from giranking_spark.queries.relational import load_events

_US = 1_000_000
LOOKBACK_S = 30 * 60  # 30-minute attribution window


def _purchases(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts_us").alias("pt")
    )


def _clicks(ev: DataFrame) -> DataFrame:
    """One click row per (user, ts): keep the max event_id — deterministic
    as-of tie rule replicated in the oracle."""
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts_us").alias("ct"))
        .agg(F.max("event_id").alias("click_id"))
    )


def q_rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each purchase picks the same user's latest click at or
    before it (union-tag + window — one shuffle, no inequality join)."""
    ev = load_events(spark, sf_dir)
    out = asof_join(
        _purchases(ev), _clicks(ev), on=["user_id"], left_ts="pt", right_ts="ct"
    )
    return out.select(
        "purchase_id",
        "user_id",
        "pt",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce("ct", F.lit(-1)).alias("click_ts"),
    )


def q_rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks inside each purchase's 30-minute look-back window
    [pt - 30 min, pt], executed as a chunk-bucketed equi-join; per-purchase
    click count (zero-match purchases kept via a left join of the counts).

    Bounds are epoch SECONDS (integer `div`, exact in both engines) — nanos
    would lose precision in the chunk-index floor division (int64 ≫ 2^53)."""
    ev = load_events(spark, sf_dir)
    p = (
        _purchases(ev)
        .withColumn("hi", F.expr("pt div 1000000"))
        .withColumn("lo", F.col("hi") - F.lit(LOOKBACK_S))
    )
    clicks = _clicks(ev).withColumn("t", F.expr("ct div 1000000"))
    hits = bucket_range_join(
        clicks,
        p,
        on=["user_id"],
        pt="t",
        lo="lo",
        hi="hi",
        chunk=LOOKBACK_S,
    )
    counts = hits.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    return (
        p.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "pt",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
    )


QUERIES = {
    "rel_asof_join": q_rel_asof_join,
    "rel_range_join": q_rel_range_join,
}

_P_SQL = (
    "SELECT event_id AS purchase_id, user_id, epoch_us(ts)::BIGINT AS pt "
    "FROM events WHERE event_type = 'purchase'"
)
_C_SQL = (
    "SELECT user_id, epoch_us(ts)::BIGINT AS ct, max(event_id) AS click_id "
    "FROM events WHERE event_type = 'click' GROUP BY 1, 2"
)

ORACLES = {
    "rel_asof_join": (
        f"WITH p AS ({_P_SQL}), c AS ({_C_SQL}) "
        "SELECT p.purchase_id, p.user_id, p.pt, "
        "coalesce(c.click_id, -1) AS click_id, coalesce(c.ct, -1) AS click_ts "
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.pt >= c.ct"
    ),
    "rel_range_join": (
        f"WITH p AS ({_P_SQL}), c AS ({_C_SQL}) "
        "SELECT p.purchase_id, p.user_id, p.pt, "
        "count(c.ct) AS n_clicks "
        "FROM p LEFT JOIN c ON p.user_id = c.user_id "
        f"AND c.ct // {_US} BETWEEN p.pt // {_US} - {LOOKBACK_S} AND p.pt // {_US} "
        "GROUP BY 1, 2, 3"
    ),
}


# ---------------------------------------------------------------------------
# interval-overlap join (chunk-bucketed)

#: synthetic per-event duration: 1..10 minutes, derived from the event id so
#: both engines compute the identical intervals
OVERLAP_MAX_MIN = 10
#: chunk width = the maximum interval length, so every interval spans at
#: most 2 chunks and the fan-out is bounded by construction
OVERLAP_CHUNK_US = OVERLAP_MAX_MIN * 60 * 1_000_000


def q_rel_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP self-join: pairs of same-user events whose
    [start, start+dur] spans intersect, with the overlap length — the
    general interval join (rel_range_join is its point-in-interval
    special case; concurrent-session detection, conflict windows).

    Scale shape: the inequality pair predicate never reaches Catalyst as a
    join condition — intervals explode to at most 2 fixed-width chunks
    (chunk = max duration), candidates meet in an equi-join on
    (user, chunk), and each surviving pair is counted exactly ONCE by the
    canonical-chunk rule (the chunk containing the later start), not
    deduplicated after the fact.  Cost is bounded by true overlap density
    per (user, chunk), never |L|·|R|."""
    dur = (1 + F.col("event_id") % OVERLAP_MAX_MIN) * (60 * 1_000_000)
    iv = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + dur).alias("e"),
    )
    ch = iv.withColumn(
        "chunk",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / OVERLAP_CHUNK_US),
                F.floor(F.col("e") / OVERLAP_CHUNK_US),
            )
        ),
    )
    a = ch.select(
        "user_id", "chunk",
        F.col("event_id").alias("id_a"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = ch.select(
        "user_id", "chunk",
        F.col("event_id").alias("id_b"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    return (
        a.join(b, ["user_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea"))
        )
        # canonical chunk: the one holding the later start — each
        # overlapping pair satisfies this in exactly one chunk
        .filter(
            F.col("chunk")
            == F.floor(F.greatest("sa", "sb") / OVERLAP_CHUNK_US)
        )
        .select(
            "user_id",
            "id_a",
            "id_b",
            (F.least("ea", "eb") - F.greatest("sa", "sb")).alias("overlap_us"),
        )
    )


QUERIES["rel_interval_join"] = q_rel_interval_join
# the oracle is the straight inequality self-join — a different algorithm
# (no chunking), so a green row proves the bucketed plan loses nothing
ORACLES["rel_interval_join"] = (
    "WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s, "
    f"epoch_us(ts) + (1 + event_id % {OVERLAP_MAX_MIN}) * 60000000 AS e "
    "FROM events) "
    "SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, "
    "least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us "
    "FROM iv a JOIN iv b ON a.user_id = b.user_id "
    "AND a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e"
)


# ---------------------------------------------------------------------------
# bidirectional nearest-event join


def q_rel_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor temporal join: each purchase is matched to the
    same user's CLOSEST view event in time, whichever side it falls on —
    the sensor-alignment generalization of the as-of join (asof looks only
    backward; clock skew makes the nearest reading the right one).
    Ties (equal distance) resolve to the earlier right row.

    Scale shape: the same union-tag trick as ``asof_join`` — one shuffle
    on (user, time) total; a single sort gives BOTH candidates via
    last(ignorenulls) over the preceding frame and first(ignorenulls)
    over the following frame, and a row-local comparison picks the
    nearest.  Never an inequality join.  The right side is deduplicated
    on (user, ts) first so the match is deterministic.  The oracle is the
    brute-force per-row argmin join — a different algorithm entirely."""
    ev = load_events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts_us").alias("lts")
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_us").alias("rts"))
        .agg(F.round(F.max("value"), 6).alias("rvalue"))
    )
    u = left.select(
        "user_id",
        F.col("lts").alias("t"),
        F.lit(1).alias("is_l"),
        "event_id",
        "lts",
        F.lit(None).cast("double").alias("rvalue"),
    ).unionByName(
        right.select(
            "user_id",
            F.col("rts").alias("t"),
            F.lit(0).alias("is_l"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("lts"),
            "rvalue",
        )
    )
    order = [F.col("t").asc(), F.col("is_l").asc()]
    back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next-right carry as a REVERSE-order running last: Spark frames ending
    # at UNBOUNDED FOLLOWING re-evaluate per row (O(rows^2) per user — the
    # same cliff fixed in rel_skyline_2d); the desc-order UNBOUNDED
    # PRECEDING frame is incremental and provably equivalent (right rows
    # are unique per (user, t), and a right row tying a left row's t sits
    # outside BOTH forward frames by the is_l tiebreak)
    fwd_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("is_l").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r_t = F.when(F.col("is_l") == 0, F.col("t"))
    r_v = F.when(F.col("is_l") == 0, F.col("rvalue"))
    cand = u.select(
        "user_id",
        "is_l",
        "event_id",
        "lts",
        F.last(r_t, ignorenulls=True).over(back).alias("pt"),
        F.last(r_v, ignorenulls=True).over(back).alias("pv"),
        F.last(r_t, ignorenulls=True).over(fwd_rev).alias("nt"),
        F.last(r_v, ignorenulls=True).over(fwd_rev).alias("nv"),
    ).filter(F.col("is_l") == 1)
    take_prev = F.col("pt").isNotNull() & (
        F.col("nt").isNull()
        | ((F.col("lts") - F.col("pt")) <= (F.col("nt") - F.col("lts")))
    )
    return cand.select(
        "user_id",
        "event_id",
        "lts",
        F.when(take_prev, F.col("pt")).otherwise(F.col("nt")).alias("nearest_ts"),
        F.when(take_prev, F.col("pv")).otherwise(F.col("nv")).alias("rvalue"),
    ).filter(F.col("nearest_ts").isNotNull())


QUERIES["rel_nearest_join"] = q_rel_nearest_join
ORACLES["rel_nearest_join"] = (
    "WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS lts FROM events "
    "WHERE event_type = 'purchase'), "
    "r AS (SELECT user_id, epoch_us(ts) AS rts, round(max(value), 6) "
    "AS rvalue FROM events WHERE event_type = 'view' GROUP BY 1, 2), "
    "j AS (SELECT l.user_id, l.event_id, l.lts, r.rts, r.rvalue, "
    "row_number() OVER (PARTITION BY l.event_id "
    "ORDER BY abs(l.lts - r.rts), r.rts) AS rn "
    "FROM l JOIN r ON l.user_id = r.user_id) "
    "SELECT user_id, event_id, lts, rts AS nearest_ts, rvalue "
    "FROM j WHERE rn = 1"
)


# ---------------------------------------------------------------------------
# spatial bucketed join (geo-cell + haversine)

GEO_RADIUS_KM = 2000.0
GEO_CELL_DEG = 18.0        # one cell >= the radius in latitude degrees
GEO_LON_CELLS = 20         # 360 / GEO_CELL_DEG — for wraparound modulo
GEO_EARTH_R = 6371.0088


def _geo_coord(kind: str, key, lo: float, span_millis: int):
    """Deterministic hash coordinate in [lo, lo + span/1000)."""
    from giranking_spark.functions.hashing import md5_u32

    h = md5_u32(F.concat(F.lit(kind + ":"), key.cast("string")))
    return F.lit(lo) + (h % span_millis) / F.lit(1000.0)


def q_rel_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join, Spark-first: hash-derived coordinates
    (lat ∈ [-60, 60), lon ∈ [-180, 180)) put every supplier and customer on
    the globe; candidate pairs come from a GEO-CELL equi-join (suppliers
    explode their 3x5 lat/lon cell neighborhood — 5 wide in longitude
    because a degree shrinks by cos(lat), down to 0.5 at |lat| = 60 —
    with modulo wraparound at the antimeridian), then the exact haversine
    keeps pairs within GEO_RADIUS_KM. The O(n²) all-pairs distance join
    never exists: candidates are bounded by cell occupancy, the standard
    geospatial bucketing every engine's spatial join uses.

    Cross-engine float care: the radius test compares the ROUNDED distance
    (round 6) on both engines, so libm-vs-JVM 1-ulp trig noise cannot flip
    membership except exactly at a rounding boundary (the shared
    convention)."""
    from giranking_spark.sources.tables import load_table

    def with_coords(df, key_col, prefix):
        lat = _geo_coord(prefix + "lat", F.col(key_col), -60.0, 120000)
        lon = _geo_coord(prefix + "lon", F.col(key_col), -180.0, 360000)
        return df.select(
            F.col(key_col),
            lat.alias("lat"),
            lon.alias("lon"),
            F.floor((lat + 60.0) / GEO_CELL_DEG).cast("int").alias("cy"),
            F.floor((lon + 180.0) / GEO_CELL_DEG).cast("int").alias("cx"),
        )

    sup = with_coords(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey", "s",
    )
    cust = with_coords(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey", "c",
    )
    probes = sup.select(
        "s_suppkey",
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
        F.explode(
            F.array(*[F.lit(dy) for dy in (-1, 0, 1)])
        ).alias("dy"),
        "cy",
        "cx",
    ).select(
        "s_suppkey", "slat", "slon",
        (F.col("cy") + F.col("dy")).alias("cy"),
        # dx spans -3..3: the exact inverse-haversine longitude bound at
        # |lat|=60 is 2*asin(sin(d/2R)/cos 60) ~= 36.44 deg, slightly past
        # the planar 2000/(111.2*cos 60) = 35.97 deg — two 18-deg cells are
        # not quite enough, three always are (54 deg >= 36.44).
        F.explode(
            F.array(*[F.lit(dx) for dx in (-3, -2, -1, 0, 1, 2, 3)])
        ).alias("dx"),
        "cx",
    ).select(
        "s_suppkey", "slat", "slon", "cy",
        ((F.col("cx") + F.col("dx") + GEO_LON_CELLS) % GEO_LON_CELLS).alias(
            "cx"
        ),
    )
    rad = F.lit(3.141592653589793 / 180.0)
    cand = probes.join(cust, ["cy", "cx"])
    dlat = (F.col("lat") - F.col("slat")) * rad / 2
    dlon = (F.col("lon") - F.col("slon")) * rad / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.col("slat") * rad)
        * F.cos(F.col("lat") * rad)
        * F.sin(dlon) * F.sin(dlon)
    )
    dist = F.round(
        F.lit(2.0 * GEO_EARTH_R) * F.asin(F.sqrt(a)), 6
    )
    hits = (
        cand.select("s_suppkey", "c_custkey", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= GEO_RADIUS_KM)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.min("dist_km").alias("nearest_km"),
        )
    )
    return (
        sup.select("s_suppkey")
        .join(hits, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce("n_within", F.lit(0)).cast("long").alias("n_within"),
            "nearest_km",
        )
    )


from giranking_spark.functions.hashing import md5_u32_sql_duckdb as _mgeo  # noqa: E402


def _geo_coord_sql(kind: str, key_expr: str, lo: float, span: int) -> str:
    h = _mgeo(f"'{kind}:' || {key_expr}::VARCHAR")
    return f"({lo} + ({h} % {span}) / 1000.0)"


QUERIES["rel_geo_join"] = q_rel_geo_join
ORACLES["rel_geo_join"] = (
    "WITH sup AS (SELECT s_suppkey, "
    + _geo_coord_sql("slat", "s_suppkey", -60.0, 120000) + " AS slat, "
    + _geo_coord_sql("slon", "s_suppkey", -180.0, 360000) + " AS slon "
    "FROM supplier), "
    "cust AS (SELECT c_custkey, "
    + _geo_coord_sql("clat", "c_custkey", -60.0, 120000) + " AS lat, "
    + _geo_coord_sql("clon", "c_custkey", -180.0, 360000) + " AS lon "
    "FROM customer), "
    # the oracle can afford the exact all-pairs check — it certifies that
    # the Spark side's cell candidates LOSE nothing inside the radius
    "d AS (SELECT s_suppkey, c_custkey, "
    f"round(2.0 * {GEO_EARTH_R} * asin(sqrt("
    "pow(sin((lat - slat) * pi() / 180.0 / 2), 2) "
    "+ cos(slat * pi() / 180.0) * cos(lat * pi() / 180.0) "
    "* pow(sin((lon - slon) * pi() / 180.0 / 2), 2))), 6) AS dist_km "
    "FROM sup, cust), "
    f"hits AS (SELECT s_suppkey, count(*)::BIGINT AS n_within, "
    f"min(dist_km) AS nearest_km FROM d WHERE dist_km <= {GEO_RADIUS_KM} "
    "GROUP BY s_suppkey) "
    "SELECT s.s_suppkey, coalesce(h.n_within, 0)::BIGINT AS n_within, "
    "h.nearest_km FROM supplier s LEFT JOIN hits h USING (s_suppkey)"
)
