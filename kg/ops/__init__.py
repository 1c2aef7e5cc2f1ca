"""Training-data pipeline operators over the driver testdata tables.

First-class components alongside the KG pipeline: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force cosine top-k + LSH-bucketed ANN), text analysis (language id,
quality scoring, token counting, fingerprinting) and multimodal binary-column
plumbing.  Everything stays JVM-side (built-in functions) unless vectorized
NumPy genuinely wins; no per-row Python UDFs anywhere.
"""
