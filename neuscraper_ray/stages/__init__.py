"""Pipeline stages: each exposes a batch UDF (function or callable class)
suitable for ``ray.data.Dataset.map_batches`` plus the pure functions it is
built from (shared with the single-process oracle)."""
