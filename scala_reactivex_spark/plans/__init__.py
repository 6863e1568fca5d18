from scala_reactivex_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    register,
    registry,
)
