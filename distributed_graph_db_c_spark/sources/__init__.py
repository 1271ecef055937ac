from .gformat import read_gformat, write_gformat, matrix_to_edges
from .tables import load_table, load_tables

__all__ = ["read_gformat", "write_gformat", "matrix_to_edges", "load_table", "load_tables"]
