"""Column-level function library (all JVM-side Catalyst expressions).

Submodules:
- ``timefn``   — time-bucket + compact-timestamp parsing (reference G1-G5)
- ``inference``— sampled type-vote inference and conversions (J1-J9)
- ``textfn``   — tokenization, shingling, quality/langid signals
- ``hashfn``   — stable 64-bit md5-based hashes (dedup/minhash primitives)
- ``vectorfn`` — dense-vector arithmetic over array columns
"""
