from .dt_rewrite import dt_rewrite_columns, dt_rewrite_paths, rewrite_dt_fields

__all__ = ["dt_rewrite_columns", "dt_rewrite_paths", "rewrite_dt_fields"]
