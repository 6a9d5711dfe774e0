from airfoil_tpu.geometry.parser import (
    AirfoilParseError,
    parse_dat_file,
    parse_dat_text,
    detect_and_merge_sections,
)
from airfoil_tpu.geometry.multielement import count_le_passes, is_multi_element

__all__ = [
    "AirfoilParseError",
    "parse_dat_file",
    "parse_dat_text",
    "detect_and_merge_sections",
    "count_le_passes",
    "is_multi_element",
]
