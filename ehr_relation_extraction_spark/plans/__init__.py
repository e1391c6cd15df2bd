"""Pipeline orchestration: composition, stage checkpoints, lineage, resume."""
