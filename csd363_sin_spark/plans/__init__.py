from csd363_sin_spark.plans.induce import induce_graph, symmetrize  # noqa: F401
from csd363_sin_spark.plans.ids import dense_ids  # noqa: F401
