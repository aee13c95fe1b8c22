from .registry import DatasetRegistry, PipelineContext  # noqa: F401
