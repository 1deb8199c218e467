from . import dedup, events, multimodal, params, quads, similarity, text  # noqa: F401
