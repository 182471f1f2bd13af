from .quality import observed_quality_gate
from .text import (
    caret_count,
    json_string_array,
    normalize_text,
    normalize_text_native,
    repair_timestamp,
    truncate30,
)

__all__ = [
    "caret_count",
    "observed_quality_gate",
    "json_string_array",
    "normalize_text",
    "normalize_text_native",
    "repair_timestamp",
    "truncate30",
]
