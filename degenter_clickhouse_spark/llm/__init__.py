from . import bpe, dedup, lm, multimodal, packing, similarity, text  # noqa: F401
