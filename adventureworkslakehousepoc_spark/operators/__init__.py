from .joins import interval_join, star_left_join  # noqa: F401
from .aggregates import grouped_avg, pivot_agg  # noqa: F401
