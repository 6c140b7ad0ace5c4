"""PySpark-native analytics engine with the capabilities of
``yeshu8zpf/active_query_optimizer`` (a Lero-style active-learning learned
query optimizer), rebuilt Spark-first.

Layers
------
A. Query surface (``operators/``): the full relational surface the reference's
   workloads exercise — multi-way inner equi-joins under every physical
   strategy, COUNT/MIN aggregates, rich predicates — plus the LLM-data-pipeline
   operators (dedup, similarity search, text analysis, multimodal plumbing).
B. Optimizer pipeline (``stats/ workload/ plans/ model/ select/ pipelines/``):
   statistics harvesting, seeded workload generation, candidate-plan
   exploration via join-strategy hints, tree-convolution pairwise plan
   ranking, Spearman evaluation, MinHash-LSH + k-center coreset selection.

Everything here derives from public knowledge: the Apache Spark / PySpark API,
the public reference repo, and published papers (Lero, VLDB'23).
"""

__version__ = "0.1.0"
