from .fixed_width import FixedWidthField, fixed_width_columns, parse_fixed_width, read_fixed_width  # noqa: F401
from .files import read_csv_with_schema, read_text_lines  # noqa: F401
