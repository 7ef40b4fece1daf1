"""Run state: per-partition lineage manifests and resume logic."""
