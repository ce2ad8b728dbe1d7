"""Training-data pipeline operators (the beyond-reference surface).

- :mod:`.dedup` — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup +
  connected-component keep/drop
- :mod:`.similarity` — embedding ANN (brute-force JVM fold, BLAS matmul,
  hyperplane LSH, IVF multi-probe) + cosine near-dup
- :mod:`.text` — language-ID, quality scoring, token counting,
  fingerprinting
- :mod:`.sampling` — deterministic hash sampling, train/val/test splits,
  sequence packing
- :mod:`.multimodal` — opaque binary payload plumbing with typed metadata
"""
