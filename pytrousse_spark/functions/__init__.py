"""Column-expression function library (JVM-side, no Python UDFs).

Submodules:
- ``hashing``  — portable 60-bit md5 hash + salted variants, sha256 id.
- ``numeric_repair`` — the typo-fix expression cascade (row_fix.py parity).
- ``text``     — tokenization, language-id, quality, fingerprints, shingles.
- ``vectors``  — cosine / dot / norm over array<float> embedding columns.
"""

from . import hashing, numeric_repair, text, vectors  # noqa: F401
