from .io import TABLES, load_table, load_tables, register_views, write_mr_text

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "write_mr_text"]
