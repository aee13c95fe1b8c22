from .medallion import build_medallion, medallion_context  # noqa: F401
from .bronze import bronze_fanout  # noqa: F401
