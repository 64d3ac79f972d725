from hunt_spark.sources.corpus import corpus_df, corpus_pandas  # noqa: F401
from hunt_spark.sources.catalog import IndexCatalog  # noqa: F401
