"""Aggregate FunctionOptions shared by scalar + grouped kernels.

Split from ``aggregates.py`` so option-only importers (e.g.
``aggregates_order``) never race the kernel modules' registration imports
(the registry import chain re-enters ``arrow_tpu.compute``).
Reference: ``cpp/src/arrow/compute/api_aggregate.h`` options structs.
"""

from __future__ import annotations

__all__ = ["ScalarAggregateOptions", "CountOptions", "VarianceOptions",
           "PivotWiderOptions"]


class ScalarAggregateOptions:
    def __init__(self, skip_nulls: bool = True, min_count: int = 1):
        self.skip_nulls = skip_nulls
        self.min_count = min_count


class CountOptions:
    def __init__(self, mode: str = "only_valid"):
        assert mode in ("only_valid", "only_null", "all")
        self.mode = mode


class PivotWiderOptions:
    """Options for (hash_)pivot_wider (``api_aggregate.h``
    PivotWiderOptions): expected pivot key names + behavior on keys
    outside that list ("ignore" silently skips, "raise" errors)."""

    def __init__(self, key_names, unexpected_key_behavior: str = "ignore"):
        assert unexpected_key_behavior in ("ignore", "raise")
        self.key_names = list(key_names)
        self.unexpected_key_behavior = unexpected_key_behavior


class VarianceOptions:
    def __init__(self, ddof: int = 0, skip_nulls: bool = True,
                 min_count: int = 0):
        self.ddof = ddof
        self.skip_nulls = skip_nulls
        self.min_count = min_count
