"""UFVideo-TPU: a TPU-native unified fine-grained video-LLM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
UFVideo stack (video QA, object referring, [SEG] video segmentation, temporal
grounding) for TPU hardware: static-shape multimodal splicing, Pallas flash
attention, pjit/mesh parallelism, and a lax.scan streaming SAM2 predictor.

Public API mirrors the reference's entry points (reference:
ufvideo/__init__.py:14 `model_init`, :34 `mm_infer`).
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .configs import (  # noqa: F401
    MultimodalBudget,
    ProjectorConfig,
    Qwen2Config,
    RegionEncoderConfig,
    SAM2Config,
    SiglipVisionConfig,
    UFVideoConfig,
    tiny_config,
)


def model_init(*args, **kwargs):
    from .api import model_init as _model_init

    return _model_init(*args, **kwargs)


def mm_infer(*args, **kwargs):
    from .api import mm_infer as _mm_infer

    return _mm_infer(*args, **kwargs)


def mm_infer_batch(*args, **kwargs):
    """Batched serving entry (beyond reference) — see api.mm_infer_batch."""
    from .api import mm_infer_batch as _f

    return _f(*args, **kwargs)


def mm_infer_stream(*args, **kwargs):
    """Streaming QA entry (beyond reference) — see api.mm_infer_stream."""
    from .api import mm_infer_stream as _f

    return _f(*args, **kwargs)
