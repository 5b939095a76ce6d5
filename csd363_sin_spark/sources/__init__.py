from csd363_sin_spark.sources.synth import synth_transcripts, synth_ground_truth  # noqa: F401
from csd363_sin_spark.sources.transcripts import (  # noqa: F401
    transcripts_from_events,
    TRANSCRIPT_SCHEMA,
)
