from .incremental import IncrementalReasoner, quad_stream_from_files  # noqa: F401
