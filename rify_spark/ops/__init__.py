from . import dedup, multimodal, params, quads, similarity, text  # noqa: F401
