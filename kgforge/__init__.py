"""kgforge — a Ray-Data-native knowledge-graph construction engine.

Built from scratch (NOT a port) with the capabilities of the reference
KB-synthesis tool (`milost/kbgen`, see SURVEY.md §0) re-expressed as a
web-scale KG-construction pipeline over Parquet web pages:

    pages → extract_text → dedup (exact + minhash-LSH) → SVO extraction
          → mention detection + entity linking → union-find canonicalization
          → salted groupby materialize → sorted (subj, pred, obj) triples
          → KBModel-style histogram learning (type/pred/degree distributions)

Everything is a ``ray.data.Dataset`` transform: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, ``groupby`` /
``sort`` for the wide steps.  No ``ray.init`` anywhere in this package —
the caller (driver / bench.py / tests) owns the Ray session.
"""

__version__ = "0.1.0"
ENGINE_VERSION = __version__
