from .pipeline import DedupPipeline, PipelineResult

__all__ = ["DedupPipeline", "PipelineResult"]
