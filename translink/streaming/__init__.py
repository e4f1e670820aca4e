from translink.streaming.incremental import (
    incremental_signatures,
    stream_transcript_dir,
)
from translink.streaming.link import (
    incremental_link,
    prepare_reference,
    read_match_store,
)

__all__ = [
    "incremental_signatures",
    "stream_transcript_dir",
    "incremental_link",
    "prepare_reference",
    "read_match_store",
]
