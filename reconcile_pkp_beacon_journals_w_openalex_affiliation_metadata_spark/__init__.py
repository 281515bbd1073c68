"""PySpark-native record-linkage engine.

A from-scratch rebuild (NOT a port) of the computation performed by the
reference pipeline ``cometadata/reconcile-pkp-beacon-journals-w-openalex-
affiliation-metadata``: reconcile PKP Beacon journal records against
OpenAlex works/affiliations.

Architecture (Spark-first):

- ``schemas``     explicit StructTypes for every table (never inferSchema)
- ``synth``       deterministic generator for the interleaved text+media
                  ``documents`` table (the ``input_hint`` shape) + labeled truth
- ``functions``   scalar layer: native column fns + vectorized pandas UDFs
                  (ascii-fold normalize, InDel ratio, Jaro-Winkler,
                  token-set ratio, MinHash bands)
- ``operators``   extract / blocking / candidate pairs (salted, skew-split) /
                  scoring / connected-components clustering / stats rollup /
                  dedup family / similarity search / lineage metrics
- ``sources``     schema-asserted readers & committed-table catalog
                  (parquet-backed stand-in for Iceberg; atomic commit +
                  anti-join resume)
- ``plans``       end-to-end reconcile pipeline assembly
- ``streaming``   incremental mode (Trigger.AvailableNow foreachBatch)

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
