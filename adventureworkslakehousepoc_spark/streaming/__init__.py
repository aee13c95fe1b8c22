from .runner import run_available_now, stage_stream_dir, stream_table  # noqa: F401
from .cdf import ChangeFeed  # noqa: F401
