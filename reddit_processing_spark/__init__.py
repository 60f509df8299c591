"""reddit_processing_spark — a from-scratch PySpark-native link-graph
analytics engine over conversation-transcript tables.

Capabilities (re-expressed Spark-first, NOT a port of the reference
``snap-stanford/reddit-processing`` pipeline — see SURVEY.md §0):

- ``operators.extract``      : transcripts → edge table (role-adjacency +
                               user↔thread reply edges, stable turn order,
                               byte-exact text passthrough).
- ``graph.*``                : PageRank, connected components, label
                               propagation, triangle counting as iterative
                               DataFrame programs with Arrow-vectorized
                               CSR kernels.
- ``operators.split_merge``  : the reference's split/merge two-phase
                               reorganization collapsed into declarative
                               repartition + sortWithinPartitions writes.
- ``operators.dedup``        : exact / MinHash-LSH / SimHash / n-gram
                               Jaccard document deduplication.
- ``operators.similarity``   : brute-force + LSH-bucketed cosine ANN.
- ``functions.text``         : language-ID, quality scoring, token counts,
                               rolling-hash fingerprints (all JVM-side).
- ``plans.ckpt``             : per-superstep checkpoint manifests with
                               per-partition lineage + delta metrics,
                               resumable mid-iteration.
"""

__version__ = "0.1.0"
