from .ingest import (  # noqa: F401
    CORRUPT_COL,
    TRANSCRIPTS_SCHEMA,
    parse_json_envelope,
    read_transcripts,
    split_corrupt,
    validate_transcripts,
)
