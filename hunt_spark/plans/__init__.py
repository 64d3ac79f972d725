from hunt_spark.plans.ast import (  # noqa: F401
    QBoost,
    QContext,
    QFullWord,
    QPhrase,
    QRange,
    QSeq,
    QWord,
    qand,
    qandnot,
    qor,
    qphrase,
)
from hunt_spark.plans.parser import parse_query  # noqa: F401
