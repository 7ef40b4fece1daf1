"""Pipeline assemblies: the flagship transcript quality pipeline and the
metrics/aggregation pipelines (dashboard analogs)."""
