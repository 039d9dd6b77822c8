from etl_expenses_spark.functions.money import parse_money  # noqa: F401
from etl_expenses_spark.functions.dates import (  # noqa: F401
    fix_two_digit_year,
    pad_time,
    ts_from_epoch_millis,
)
from etl_expenses_spark.functions.ids import payment_id, content_fingerprint  # noqa: F401
from etl_expenses_spark.functions.text import (  # noqa: F401
    token_count,
    punct_ratio,
    stopword_hits,
    quality_score,
    lang_id,
    rolling_hash,
)
