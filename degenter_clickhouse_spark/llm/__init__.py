from . import dedup, multimodal, packing, similarity, text  # noqa: F401
