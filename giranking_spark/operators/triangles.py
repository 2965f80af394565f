"""Degree-oriented exact triangle enumeration (compact-forward /
Chiba–Nishizeki orientation).

Every exact triangle algorithm enumerates wedges; the only scale question
is WHOSE wedges. Orienting each undirected edge by vertex id makes the
wedge relation Sigma_v outdeg_id(v)^2 — a single celebrity hub with a
small id turns that quadratic in its degree. Orienting instead from the
(degree, id)-SMALLER endpoint to the larger bounds every vertex's
out-degree by O(sqrt(m)) (more precisely by the graph's arboricity:
Chiba & Nishizeki 1985), so the wedge relation is O(m * alpha) no matter
how skewed the degree distribution — the difference between "works on the
fixture" and "works when one page has 2M in-links".

Counts are EXACT and orientation-invariant: every triangle x ≺ y ≺ z (≺ =
(degree, id) lexicographic) is produced exactly once, from its ≺-minimum
vertex. The DuckDB oracles therefore keep their simpler id-oriented form —
same value, different plan — which is the point: orientation is a physical
choice, not a semantic one.

Reference parity note: the reference engine has no triangle operator; this
is extension surface (SURVEY.md LLM-pipeline ops), shaped for the 100 TB
navigation/citation graphs the rank family already handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_oriented(co: DataFrame) -> DataFrame:
    """Orient canonical undirected edges by (degree, id).

    ``co`` holds each undirected edge once as (u, v) with u < v (ids).
    Returns (a, b, db): the edge re-oriented from the (degree, id)-smaller
    endpoint ``a`` to the larger ``b``, carrying b's degree ``db`` so wedge
    construction can compare endpoints in ≺ order without re-joining the
    degree relation. Two map-side-combinable aggregates + two broadcastable
    equi-joins (the degree relation is vertex-sized, typically orders of
    magnitude under the edge relation)."""
    und = co.select("u", "v").unionByName(
        co.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    j = co.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )


def oriented_wedges(o: DataFrame) -> DataFrame:
    """Wedges (a; b1 ≺ b2) of the degree-oriented edge relation ``o`` —
    the candidate relation whose size the orientation bounds by m·alpha.
    One self-equi-join on the wedge apex."""
    e1 = o.select(F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1"))
    e2 = o.select(F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2"))
    return e1.join(e2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )


def triangle_relation(co: DataFrame) -> DataFrame:
    """All triangles of the canonical edge set ``co``, one row (a, b1, b2)
    per triangle with a ≺ b1 ≺ b2: oriented wedges semi-probed against the
    closing oriented edge (b1, b2). Since b1 ≺ b2, the closing edge — if it
    exists — is stored oriented exactly as (b1 → b2), so the probe is a
    two-key LEFT SEMI equi-join (key-only, no payload shuffle).

    The oriented relation feeds BOTH join branches (wedge legs and the
    closing probe); without materialization the union + degree-aggregate
    + two-join orientation subtree executes once per branch — measured
    as most of a 25 s wall on a 587k-edge graph with ZERO triangles.
    localCheckpoint (not persist) so the blocks die with the DataFrame
    instead of leaking across bench reps."""
    o = degree_oriented(co).localCheckpoint(eager=True)
    closing = o.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    return (
        oriented_wedges(o)
        .join(closing, ["b1", "b2"], "left_semi")
        .select("a", "b1", "b2")
    )


def triangle_edges(co: DataFrame) -> DataFrame:
    """Distinct canonical (u, v) edges that close ≥1 triangle — the
    NOT-a-local-bridge relation. Emits the 3 edges of each triangle
    (canonicalized back to id order, since ≺ order and id order may
    disagree) and dedups; intermediate size is 3·#triangles on top of the
    orientation-bounded wedge relation, never the Sigma d^2 full neighbor
    expansion."""
    tri = triangle_relation(co)
    pairs = (
        tri.select(F.col("a").alias("x"), F.col("b1").alias("y"))
        .unionByName(tri.select(F.col("a").alias("x"), F.col("b2").alias("y")))
        .unionByName(tri.select(F.col("b1").alias("x"), F.col("b2").alias("y")))
    )
    return pairs.select(
        F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
    ).distinct()
