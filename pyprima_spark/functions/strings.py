"""String cleaning, mirroring ``clean_names`` (correction_functions.py:809-822):
remove non-ASCII characters and truncate to 63 chars. Pure expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NON_ASCII = r"[^\x00-\x7F]"


def clean_name(col: Column, max_len: int = 63) -> Column:
    return F.substring(F.regexp_replace(col, NON_ASCII, ""), 1, max_len)


def clean_name_sql(col_sql: str, max_len: int = 63) -> str:
    return f"substring(regexp_replace({col_sql}, '[^\\x00-\\x7F]', '', 'g'), 1, {max_len})"
