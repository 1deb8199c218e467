from . import (  # noqa: F401
    dedup,
    events,
    multimodal,
    params,
    quads,
    similarity,
    snapshot,
    text,
)
