"""Whole-graph summary metrics — degree moments, degree
assortativity, partition modularity, and directed reciprocity — as
single-pass DataFrame aggregates (SURVEY.md §2.11 analytics surface
next to triangles/clustering).

Degree assortativity (Newman 2002, "Assortative mixing in networks")
is the Pearson correlation of the degrees at the two ends of every
edge, each undirected edge counted in both orientations — exactly what
``networkx.degree_assortativity_coefficient`` computes; the sample-vs-
population variance factors cancel in the ratio, so any Pearson
``corr`` implementation (Spark's, DuckDB's) yields the identical
value.

Spark shape: one |E| shuffle to count degrees, one degree join back
onto the symmetrized edges (the degree table is |V| rows — broadcast
at any realistic vertex count when |V| ≪ |E|, AQE decides), one
scalar aggregate. No iteration, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import symmetrize


def degree_table(edges: DataFrame) -> DataFrame:
    """(v, deg) over the undirected simple graph underlying ``edges``."""
    return symmetrize(edges).groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("deg")
    )


def degree_assortativity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One row: (assortativity, n_vertices, n_edges, avg_deg, max_deg).

    ``assortativity`` is NULL on degree-regular graphs (zero variance —
    the coefficient is undefined there, matching networkx's nan).
    """
    sym = symmetrize(edges)
    deg = degree_table(edges)
    ds = deg.select(F.col("v").alias("src"), F.col("deg").alias("deg_s"))
    dd = deg.select(F.col("v").alias("dst"), F.col("deg").alias("deg_d"))
    # corr() recomposed from its own co-moment pieces: under ANSI mode
    # (engine default) corr() THROWS a divide-by-zero on zero-variance
    # input (a degree-regular graph) where the coefficient is simply
    # undefined — try_divide yields the NULL the semantics call for.
    # covar_samp/stddev_samp use the same (n-1) scaling, so the ratio
    # IS Pearson corr where it is defined.
    r = sym.join(ds, "src").join(dd, "dst").agg(
        F.try_divide(
            F.covar_samp("deg_s", "deg_d"),
            F.stddev_samp("deg_s") * F.stddev_samp("deg_d"),
        ).alias("assortativity")
    )
    # degree moments come from the |V|-row degree table, not the edge
    # ends (an edge-end average would weight each vertex by its degree)
    moments = deg.agg(
        F.count("*").alias("n_vertices"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.avg("deg").alias("avg_deg"),
        F.max("deg").alias("max_deg"),
    )
    return r.crossJoin(F.broadcast(moments))


def modularity(spark: SparkSession, edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row: (modularity, n_communities, m_edges) — Newman
    modularity of the vertex partition ``labels`` (vid, label) over
    the undirected simple graph underlying ``edges``::

        Q = Σ_c [ L_c/m − (D_c/(2m))² ]

    with ``L_c`` the intra-community undirected edge count, ``D_c``
    the community degree sum, ``m`` total undirected edges — exactly
    what ``networkx.algorithms.community.modularity`` (weight=None)
    computes. The natural consumer is an LPA or CC labelling, but any
    total vertex partition works; vertices missing from ``labels``
    drop their edges (the partition must cover the graph, same
    precondition networkx enforces).

    Spark shape: symmetrize (each undirected edge in both
    orientations), two |V|-row label joins onto the edge ends (AQE
    broadcasts the label side when small), ONE groupBy(label) whose
    count(*) is D_c and whose same-label sum is 2·L_c — degree sums
    and intra counts come out of the same aggregate, no separate
    degree table — then a scalar fold. Σ and Σ² of D_c recover the
    global 2m inside the fold, so no window or second pass over the
    per-community rows is needed. Degree sums are cast to double
    before squaring: ANSI mode throws on long overflow, and at
    10^12-edge scale D_c² exceeds int64.
    """
    sym = symmetrize(edges)
    lab = labels.select("vid", "label")
    ls = lab.select(F.col("vid").alias("src"), F.col("label").alias("lab_s"))
    ld = lab.select(F.col("vid").alias("dst"), F.col("label").alias("lab_d"))
    per_c = (
        sym.join(ls, "src")
        .join(ld, "dst")
        .groupBy(F.col("lab_s").alias("label"))
        .agg(
            F.count("*").alias("deg_sum"),
            F.sum(
                F.when(F.col("lab_s") == F.col("lab_d"), 1).otherwise(0)
            ).alias("intra2"),
        )
    )
    # n_communities counts distinct labels of the PARTITION, not just
    # labels owning an edge endpoint — a community of isolated (or
    # self-loop-only) vertices contributes 0 to Q but still exists in
    # the partition a consumer compares against (round-4 ADVICE; it
    # contributes nothing to any Q term, so the scalar fold below is
    # unchanged).
    n_comm = lab.agg(F.count_distinct("label").alias("n_communities"))
    return per_c.agg(
        F.sum("intra2").alias("_i2"),
        F.sum("deg_sum").alias("_m2"),
        F.sum(F.col("deg_sum").cast("double") * F.col("deg_sum")).alias("_d2"),
    ).crossJoin(F.broadcast(n_comm)).select(
        F.try_divide(F.col("_i2"), F.col("_m2")).alias("_frac_intra"),
        "_m2",
        "_d2",
        "n_communities",
    ).select(
        (
            F.col("_frac_intra")
            - F.col("_d2") / (F.col("_m2").cast("double") * F.col("_m2"))
        ).alias("modularity"),
        "n_communities",
        (F.col("_m2") / 2).cast("long").alias("m_edges"),
    )


def reciprocity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One row: (reciprocity, n_directed_edges, n_reciprocated) over
    the DIRECTED simple graph of distinct non-loop (src, dst) rows:
    the fraction of directed edges whose reverse edge is also present
    (``networkx.overall_reciprocity`` on the loop-free DiGraph).
    Self-loops are excluded — a loop is trivially its own reverse and
    only inflates the ratio. NULL on an empty edge set.

    Spark shape: no self-join against the reversed table — distinct
    directed edges collapse onto their unordered pair key
    ``(least, greatest)`` in ONE groupBy, where each pair carries
    k ∈ {1, 2} observed orientations; k=2 means both directions
    exist, contributing 2 reciprocated directed edges, and Σk is the
    directed edge count. One scalar fold finishes. Two shuffles
    total (distinct + pair groupBy), both shrinking.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pairs = e.groupBy(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    ).agg(F.count("*").alias("k"))
    return pairs.agg(
        F.coalesce(F.sum("k"), F.lit(0)).alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("k") == 2, F.lit(2)).otherwise(0)), F.lit(0)
        ).alias("_r"),
    ).select(
        F.try_divide(F.col("_r"), F.col("_n")).alias("reciprocity"),
        F.col("_n").cast("long").alias("n_directed_edges"),
        F.col("_r").cast("long").alias("n_reciprocated"),
    )
