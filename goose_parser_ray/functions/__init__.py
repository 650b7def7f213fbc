"""Large-scale training-data operators (beyond the reference's surface).

The reference has no multi-document operators at all (SURVEY.md §2.7); these
are the ops a 100 TB training-data pipeline needs, each built Ray-Data-first:

- :mod:`relational` — broadcast join, pre-aggregated groupby
- :mod:`dedup`      — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                      embedding-cosine near-dup
- :mod:`similarity` — brute-force cosine top-k; LSH-bucketed variant
- :mod:`textstats`  — token counting, quality scoring, language-ID,
                      document fingerprinting
- :mod:`multimodal` — binary-column decode/resize/feature stages (stubbed
                      decode, real Ray plumbing)
"""
