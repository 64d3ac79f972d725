from hunt_spark.functions.analysis import (  # noqa: F401
    TOKEN_PATTERN_JAVA,
    TOKEN_PATTERN_PY,
    extract_text_udf,
    normalize_terms,
    tokenize_col,
    tokenize_py,
)
from hunt_spark.functions.varbyte import (  # noqa: F401
    delta_varbyte_decode,
    delta_varbyte_encode,
)
