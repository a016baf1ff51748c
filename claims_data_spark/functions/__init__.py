"""Scalar function surface (SURVEY.md §2.9).

Everything here is a *Column-expression builder* — pure JVM-side
``pyspark.sql.functions`` compositions that stay inside whole-stage
codegen. No Python UDFs.
"""

from claims_data_spark.functions.datetime import (  # noqa: F401
    age_years,
    month_end,
    tsql_datediff_day,
    tsql_datediff_month,
    yyyymm_to_date,
    date_to_yyyymm,
    yyyymm_add,
)
from claims_data_spark.functions.strings import (  # noqa: F401
    is_numeric,
    like_charset_to_regex,
    tsql_like,
    normalize_icdcm,
    zero_pad_left,
)
from claims_data_spark.functions.text import (  # noqa: F401
    token_count_ws,
    token_count_bpe,
    punct_ratio,
    stopword_ratio,
    quality_score,
    doc_fingerprint,
)
