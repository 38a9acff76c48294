"""I/O: tableau rendering and JSON (de)serialization.

The JSON schema ({m, n, z, c, b, a, cl, cm}, Fractions as strings) is
interoperable with the reference's tableau files (tableau.py:322-360); the
schema doubles as a lossless checkpoint format (SURVEY.md §5 checkpoint/resume).
"""

from .render import render_grid, render_text, render_latex, render_csv
from .grid import parse_grid, format_grid
from .mps import read_mps, read_mps_string, write_mps, write_mps_string

__all__ = [
    "render_grid",
    "render_text",
    "render_latex",
    "render_csv",
    "parse_grid",
    "format_grid",
    "read_mps",
    "read_mps_string",
    "write_mps",
    "write_mps_string",
]
