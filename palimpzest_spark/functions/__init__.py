"""Training-data pipeline operators (beyond the reference's surface).

These are first-class engine components for 100 TB-scale corpus work:
- ``text``       : language-ID, quality scoring, token counting, fingerprints
- ``dedup``      : exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
- ``similarity`` : brute-force cosine top-k + LSH-bucketed ANN
- ``multimodal`` : binary-column decode/feature plumbing (decoders stubbed —
                   no image/audio libs in this container; the Spark-side
                   schema/partitioning/UDF shape is real and tested)
"""
