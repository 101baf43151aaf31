"""spel_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query/data-processing capabilities of the reference
(shavarani/SpEL, EMNLP 2023 — a PyTorch structured-prediction entity
linker) as an idiomatic Spark record-linkage pipeline:

    transcripts -> mention extraction (Arrow UDF) -> surface normalization
    -> blocking (normalized key ∪ MinHash-LSH, salted) -> pair generation
    -> pairwise scoring (Jaro-Winkler + Jaccard + cosine) -> threshold
    -> transitive clustering (hash-min connected components)
    -> clusters + pairwise micro-P/R/F1

SpEL resolves every mention span to a dense entity-vocabulary id and two
mentions corefer iff their ids match (reference:
src/spel/span_annotation.py:12, src/spel/utils.py:389-396).  This engine
reproduces exactly that equivalence relation with blocking + similarity +
transitive closure instead of a neural classifier.
"""

__version__ = "0.1.0"
