"""vectrain_ray — a Ray-Data-native knowledge-graph-construction engine.

A brand-new engine with the query/data-processing capabilities of the
reference (torys877/vectrain, a Go Source→Embedder→Storage streaming
service), re-expressed as Ray Data streaming pipelines:

  read_parquet(transcripts)
    → map_batches(extract_mentions_triples)          # stateless Arrow tasks
    → map_batches(HashingEncoder, concurrency=N)     # stateful actor pool
    → canonicalize (salted groupby + union-find)     # the shuffle stage
    → map_batches(EntityLinker, concurrency=N)       # broadcast index lookup
    → write_parquet(nodes/, edges/) + manifests      # idempotent, resumable

Reference parity notes are cited per module as /root/reference file:line.
"""

__version__ = "0.1.0"
