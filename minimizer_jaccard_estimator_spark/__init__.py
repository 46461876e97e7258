"""minimizer_jaccard_estimator_spark — a PySpark-native near-duplicate
detection + clustering engine whose sketch core (k-shingling, seeded 64-bit
hashing, (w,k) winnowed minimizers, Jaccard estimation + bias correction)
reproduces medvedevgroup/minimizer-jaccard-estimator bit-for-bit at the same
(k, w, hash, seed) configuration.
"""

__version__ = "0.1.0"
