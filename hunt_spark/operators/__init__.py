from hunt_spark.operators.build import BuildConfig, build_index  # noqa: F401
