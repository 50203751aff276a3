from .scalars import (  # noqa: F401
    dec_sum,
    dec_avg,
    nullify,
    parse_date_multi,
    parse_number,
    parse_bool,
    NULL_WORDS,
)
from .regex import py_regex_to_java  # noqa: F401
