from scala_reactivex_spark.functions.determinism import (  # noqa: F401
    DEC,
    ROUND,
    davg,
    dsum,
    r4,
    rmax,
    rmin,
    sql_davg,
    sql_dsum,
)
