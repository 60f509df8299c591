"""Whole-graph summary metrics — degree moments and degree
assortativity — as single-pass DataFrame aggregates (SURVEY.md §2.11
analytics surface next to triangles/clustering).

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
