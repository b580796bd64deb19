"""numpy kernels: the non-SQL-expressible cores (exact HDBSCAN*, data
bubbles) run per-group via ``applyInPandas`` or on the driver."""
