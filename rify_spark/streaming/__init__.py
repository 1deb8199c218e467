from .dedup import dedup_stream  # noqa: F401
from .lsh_index import IncrementalLshIndex  # noqa: F401
from .incremental import IncrementalReasoner, quad_stream_from_files  # noqa: F401
from .retract import overdelete, rederive  # noqa: F401
from .sessionize import sessionize_stream  # noqa: F401
from .windowed import windowed_counts_stream  # noqa: F401
