"""Large-scale training-data pipeline operators (BASELINE.json north star):

* dedup.py       — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
* similarity.py  — brute-force cosine top-k, sign-LSH bucketed ANN
* text.py        — token stats, quality scoring, language-ID, fingerprinting
* multimodal.py  — opaque binary columns + Arrow-batched decode/feature plumbing

All hot-path operators are pure JVM-side DataFrame expressions (higher-order
array functions, sha2, window functions) — no Python UDFs except the
multimodal decode path, which is Arrow-batched ``mapInPandas`` by design.
"""
