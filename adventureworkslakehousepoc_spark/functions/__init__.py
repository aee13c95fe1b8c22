from .expressions import (  # noqa: F401
    clean_name,
    decode,
    exact_avg,
    exact_sum,
    greatest_ts,
    money,
    quantized_avg,
    surrogate_key,
    typed_null,
)
