"""ChEMBL preprocessing pipeline (reference fs_mol/preprocessing/**):
query -> clean -> featurise -> fold split. Host-side only; RDKit and the
MySQL connector are optional dependencies gated at import of the modules
that need them (the training path reads preprocessed JSONL and never
touches this package — SURVEY.md §2.9 item 7)."""
