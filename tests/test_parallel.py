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


def test_flagship_dims_divisibility_audit():
    """At the REAL 7B dims (3584 hidden / 28-4 heads / 152k vocab), no
    param ≥100 MB may silently fall back to replication on the deployment
    meshes (VERDICT r2 #1: the partition rules must meet the real dims)."""
    from ufvideo_tpu.configs import UFVideoConfig
    from ufvideo_tpu.models.ufvideo import UFVideoModel
    from ufvideo_tpu.parallel.partition import (
        audit_shardings, per_chip_state_bytes,
    )

    model = UFVideoModel(UFVideoConfig())
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))

    devs = jax.devices()
    if len(devs) < 8:  # single-device env: fake an 8-entry device array
        devs = list(devs) * 8
    for dp, fsdp, tp in [(1, 4, 2), (1, 2, 4), (2, 4, 1), (1, 8, 1)]:
        mesh = create_mesh(dp=dp, fsdp=fsdp, tp=tp, devices=devs[: dp * fsdp * tp])
        findings = audit_shardings(shapes, mesh)
        assert not findings, (dp, fsdp, tp, findings)
        # the sharded state must actually shrink: per-chip ≤ 40% of total
        # on an 8-way mesh (towers replicate a small remainder)
        total = per_chip_state_bytes(shapes, create_mesh(
            dp=1, fsdp=1, tp=1, devices=devs[:1]))
        per_chip = per_chip_state_bytes(shapes, mesh)
        assert per_chip <= 0.4 * total, (dp, fsdp, tp, per_chip / total)


def test_audit_flags_nondivisible_big_param():
    from ufvideo_tpu.parallel.partition import audit_shardings

    devs = (jax.devices() * 8)[:8]
    mesh = create_mesh(dp=1, fsdp=4, tp=2, devices=devs)
    # dim1 % fsdp=4 != 0 and dim2 % tp=2 != 0 -> divisibility fallback; the
    # tensor is >100 MB so the audit must flag it
    params = {"llm": {"layers": {"mlp_gate_proj": {"kernel": jax.ShapeDtypeStruct(
        (28, 2_000_002, 3), jnp.bfloat16)}}}}
    findings = audit_shardings(params, mesh)
    assert len(findings) == 1
    assert findings[0]["reason"] == "divisibility fallback"
