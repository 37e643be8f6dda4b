from .inspect import (
    executed_plan,
    has_python_eval,
    pushed_filters,
    shuffle_count,
)
from .schema_json import schema_to_dict

__all__ = [
    "executed_plan",
    "has_python_eval",
    "pushed_filters",
    "schema_to_dict",
    "shuffle_count",
]
