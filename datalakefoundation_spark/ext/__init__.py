"""Large-scale training-data pipeline operators (BASELINE.json north star):

* dedup.py       — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
* similarity.py  — brute-force cosine top-k, sign-LSH bucketed ANN, IVF cells
* text.py        — token stats (whitespace + BPE-style regex), quality
                   scoring + keep/drop filter gate, language-ID,
                   fingerprinting, vocabulary top-k
* sampling.py    — deterministic (stratified) sampling via sha256-threshold
                   keep decisions, reproducible under any partitioning;
                   deterministic reshard_shuffle for training order
* profile.py     — Deequ-style column profiling (completeness, distinct
                   via HLL or exact, min/max) in one pass
* multimodal.py  — opaque binary columns + Arrow-batched decode/feature/
                   resize/frame-sample plumbing
* skew.py        — salted two-stage aggregation, bucketed co-located joins
* util.py        — adaptive compute-parallelism helper

All hot-path operators are pure JVM-side DataFrame expressions (higher-order
array functions, sha2, window functions) — no Python UDFs except the
multimodal decode path, which is Arrow-batched ``mapInPandas`` by design.
"""
