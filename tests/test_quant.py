"""Int8 weight-only quantization: kernel roundtrip + quantized LM fidelity."""

import jax
import jax.numpy as jnp
import numpy as np

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.qwen2 import Qwen2LM
from ufvideo_tpu.quant import quantize_kernel, quantize_qwen2_params

TINY = Qwen2Config(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    eos_token_id=2, pad_token_id=0,
)


def test_quantize_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 16)) * 0.3
    qd = quantize_kernel(w)
    assert qd["q"].dtype == jnp.int8
    deq = qd["q"].astype(jnp.float32) * qd["scale"]
    err = np.abs(np.asarray(deq - w))
    # max error bounded by half a quantization step per column
    step = np.asarray(qd["scale"])
    assert (err <= step[None, :] * 0.51).all()


def test_quantized_lm_matches_fp():
    model = Qwen2LM(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    qparams = quantize_qwen2_params(params)
    qmodel = Qwen2LM(TINY, dtype=jnp.float32, param_dtype=jnp.float32, quant=True)

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 3, TINY.vocab_size)
    ref = model.apply({"params": params}, ids)
    got = qmodel.apply({"params": qparams}, ids)

    ref = np.asarray(ref[..., : TINY.vocab_size], np.float32)
    got = np.asarray(got[..., : TINY.vocab_size], np.float32)
    # logits stay highly correlated and greedy tokens mostly agree
    c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert c > 0.99
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.8
