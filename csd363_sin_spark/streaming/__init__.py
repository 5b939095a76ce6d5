from csd363_sin_spark.streaming.ingest import (  # noqa: F401
    stream_transcripts,
    streaming_edge_counts,
    run_incremental_induction,
)
from csd363_sin_spark.streaming.communities import (  # noqa: F401
    attach_new_actors,
    read_communities,
    refresh_communities,
)
