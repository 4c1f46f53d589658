from .tsql import (  # noqa: F401
    concat_null_propagating,
    convert_103,
    convert_108,
    dt_hr_concat,
    isnull,
    money,
)
