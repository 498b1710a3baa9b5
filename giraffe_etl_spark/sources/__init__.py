from .csv_io import read_csv_quarantined, write_csv
from .jdbc import jdbc_reader

__all__ = ["read_csv_quarantined", "write_csv", "jdbc_reader"]
