from .table import TableStore  # noqa: F401
