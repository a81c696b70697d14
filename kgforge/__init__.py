"""kgforge — a PySpark-native knowledge-graph construction engine.

Brand-new implementation (NOT a port) of the capabilities of the DBpedia
extraction framework (reference: /root/reference, dbpedia/extraction-framework):
wikitext-style markup parsing, extractor suite, redirect resolution, entity
linking, IRI canonicalization and (subj, pred, obj) triple materialization —
re-expressed as an idiomatic Spark DataFrame DAG.

Architecture (see SURVEY.md):
  corpus (repo, path, commit, lang, content)
    → title/namespace derivation                 [Catalyst expressions]
    → parse stage (wikitext → nested columns)    [one Arrow mapInPandas stage]
    → extractors (page → quads)                  [explode/filter/project]
    → redirect closure + canonicalization        [iterative join + broadcast]
    → entity linking                             [broadcast surface-form join]
    → dedup + partitioned write                  [dropDuplicates + partitionBy]
"""

__version__ = "0.1.0"
