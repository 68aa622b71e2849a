"""sophia_rs_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-implementation of the *semantics* of pchampin/sophia_rs
(RDF term model, N-Triples/Turtle/JSON-LD parsing, RDFC-1.0
canonicalization, isomorphism, FastGraph-style SPO/POS/OSP layouts) on an
entirely different *architecture*: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, and groupby/sort shuffles for the wide steps. See SURVEY.md.

Layout:

- ``terms`` / ``iri`` / ``ntriples`` / ``turtle`` / ``jsonld`` — pure,
  batch-vectorized reference-semantics modules (no Ray imports);
- ``c14n`` / ``iso`` / ``reasoner`` — the heavy algorithms (RDFC-1.0,
  isomorphism, RDFS saturation);
- ``extract/`` — deterministic HTML extractors (JSON-LD blocks,
  microdata, RDFa, visible text);
- ``sources/`` — synthetic Common-Crawl-style page table generator;
- ``stages/`` — Ray Data stage wrappers (extract, dedup, skolemize,
  materialize, c14n, entity dedup, NER/link actor pools);
- ``functions/`` — training-data-pipeline kernels (text quality, lang-id,
  minhash/simhash dedup, ANN);
- ``pipelines/`` — end-to-end flows (the flagship KG pipeline);
- ``state/`` — per-partition lineage manifests + checkpoint/resume.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (driver, bench.py, pytest fixture).
"""

import os as _os

# Polars sizes its rayon pool to ALL cores at import time; inside a Ray
# worker that means num_cpus × cores threads stampeding one machine
# (measured: the 32-CPU flagship arm went 71 s → 38 s with the pin).
# Ray tasks are the parallelism unit — library kernels stay serial.
# Must run before the first `import polars` anywhere in the process;
# respects an explicit user override.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
