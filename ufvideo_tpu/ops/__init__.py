from .attention import attention, decode_attention, xla_attention  # noqa: F401
from .rope import (  # noqa: F401
    apply_rope,
    apply_rope_interleaved,
    axial_rope_cos_sin,
    rope_cos_sin,
)
