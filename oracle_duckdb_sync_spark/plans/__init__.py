"""Service layer: result contracts, cache management, query services."""
