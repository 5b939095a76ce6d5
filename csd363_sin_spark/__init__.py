"""csd363_sin_spark — a PySpark-native link-graph / hybrid community-detection engine.

Re-creates the capabilities of the reference pipeline (ishahahahan/CSD363-SIN:
Louvain -> Girvan-Newman refinement -> Infomap enhancement over an undirected
graph, plus the full metric suite) as an idiomatic Spark DataFrame engine:

* input is a table of multi-turn conversation / agent transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp)``;
* vertices are ``conv:<conv_id>`` and ``tool:<tool>`` actors, edges are
  weighted co-occurrences of actors within a conversation;
* all graph state lives in DataFrames (edge table, symmetric edge table,
  CSR-partitioned adjacency blocks); kernels are vectorized Arrow/pandas
  grouped UDFs — never per-row Python;
* every iterative operator checkpoints per superstep so plans stay shallow
  and runs are resumable.

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"

from csd363_sin_spark.session import get_spark  # noqa: F401
