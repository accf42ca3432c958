"""Sharding: partition rules and tensor-parallel numerical equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ufvideo_tpu.configs import Qwen2Config
from ufvideo_tpu.models.qwen2 import Qwen2LM
from ufvideo_tpu.parallel import create_mesh, shardings_for
from ufvideo_tpu.parallel.partition import partition_specs

TINY = Qwen2Config(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    eos_token_id=2, pad_token_id=0,
)


def test_partition_specs_right_aligned():
    params = {
        "llm": {
            "layers": {
                "self_attn_q_proj": {"kernel": jnp.zeros((2, 64, 64))},
            },
            "embed_tokens": {"embedding": jnp.zeros((512, 64))},
            "norm": {"scale": jnp.zeros((64,))},
        }
    }
    specs = partition_specs(params)
    # scan-stacked kernel: layer axis unsharded
    assert specs["llm"]["layers"]["self_attn_q_proj"]["kernel"] == P(
        None, "fsdp", "tensor"
    )
    assert specs["llm"]["embed_tokens"]["embedding"] == P("tensor", "fsdp")
    assert specs["llm"]["norm"]["scale"] == P()


def test_tensor_parallel_forward_equivalence(cpu_mesh):
    """Logits under a (1,4,2) fsdp+tensor mesh must equal single-device."""
    model = Qwen2LM(TINY, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 3, TINY.vocab_size)

    ref = np.asarray(model.apply({"params": params}, ids))

    sh = shardings_for({"llm": params}, cpu_mesh)["llm"]
    sharded = jax.tree.map(jax.device_put, params, sh)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    with cpu_mesh:
        got = np.asarray(fwd(sharded, jax.device_put(
            ids, NamedSharding(cpu_mesh, P())
        )))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
