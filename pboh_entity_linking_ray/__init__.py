"""Ray-Data-native record-linkage engine (PBoH recast for transcripts).

A from-scratch blocking + pairwise-scoring + transitive-clustering pipeline
over Parquet tables of multi-turn conversation transcripts
(``conv_id, turn_idx, role, text, tool, ts``), expressed as
``ray.data.Dataset`` stages over zero-copy Arrow batches.

Structural ancestor (capabilities only, no code): dalab/pboh-entity-linking
(/root/reference) — per-document loopy-BP entity linking over in-JVM
hash-map indexes. Here the per-doc LBP is replaced by a loopy-BP-free
max-product pairwise log-odds scored inside ``map_batches`` actor pools
holding broadcast Arrow statistics tables (see SURVEY.md §2.3 M11-M13),
and clusters come from iterative hash-partitioned connected components.
"""

__version__ = "0.1.0"
