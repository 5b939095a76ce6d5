from csd363_sin_spark.operators.degree import degree_stats, density, analyze_graph  # noqa: F401
from csd363_sin_spark.operators.components import connected_components  # noqa: F401
