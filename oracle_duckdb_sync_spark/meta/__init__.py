from .repos import (
    MenuRepository,
    ParquetRepository,
    SyncLogRepository,
    TableConfigRepository,
    UserRepository,
)

__all__ = [
    "MenuRepository",
    "ParquetRepository",
    "SyncLogRepository",
    "TableConfigRepository",
    "UserRepository",
]
