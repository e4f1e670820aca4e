from translink.streaming.incremental import (
    incremental_signatures,
    stream_transcript_dir,
)

__all__ = ["incremental_signatures", "stream_transcript_dir"]
