from .tables import TableAdapter, read_table

__all__ = ["TableAdapter", "read_table"]
