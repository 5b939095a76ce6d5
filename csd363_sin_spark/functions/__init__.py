from csd363_sin_spark.functions.metrics import (  # noqa: F401
    community_edge_stats,
    modularity,
    conductance,
    coverage,
    description_length,
    nmi,
    evaluate_all,
)
