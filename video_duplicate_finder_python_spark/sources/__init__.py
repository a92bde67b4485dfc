from .checkpoint import CheckpointManager, StageMetrics
from .pages import read_pages, documents_as_pages

__all__ = ["CheckpointManager", "StageMetrics", "read_pages", "documents_as_pages"]
