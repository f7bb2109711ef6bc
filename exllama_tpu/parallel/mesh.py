"""Device mesh + declarative sharding of quantized params and KV cache.

This layer has NO reference counterpart: ExLlama's only multi-device story
is per-layer placement with host-mediated copies (reference
model.py:636-668, 702-708, 1053-1058). The TPU-native design shards tensors
over a 2-axis mesh and lets GSPMD insert the collectives:

  * ``tp`` (tensor parallel, rides ICI): q/k/v/gate/up shard their *output*
    columns; o/down shard their *input* rows (Megatron-style pairing, so the
    only collective per block is one psum/reduce-scatter after o and after
    down). The kgroup layout shards cleanly along columns (lanes are true
    output columns): any tp that divides N_pad/256 keeps aligned column
    blocks per shard with their scales/zscale columns alongside.
  * ``dp`` (data/batch parallel, can span DCN): batch dimension of
    activations and KV cache.
  * KV cache shards over kv-heads on ``tp`` and batch on ``dp``.

Weight-stationary: after load + device_put with these shardings, weights
never move; activations flow through psum boundaries XLA places.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllama_tpu.formats.gptq import N_ALIGN, QuantTensor


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= tp * dp, (
        f"need {tp * dp} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _quant_specs(qt: QuantTensor, shard: str) -> QuantTensor:
    """PartitionSpecs for one QuantTensor. ``shard`` ∈ {'out', 'in', 'none'}.

    'out' shards output columns: qweight's word axis and scales' column axis.
    'in' shards input rows: qweight's K axis and scales' group axis (rows of
    a group stay together because K-shards must be multiples of groupsize —
    callers validate via validate_tp()).
    """
    if shard == "out":
        qw = P(None, "tp")
        sc = P(None, "tp")
        xm = P(None)
    elif shard == "in":
        qw = P("tp", None)
        sc = P("tp", None)
        xm = P(None)  # x_map values are global K indices; replicate
    else:
        qw = P(None, None)
        sc = P(None, None)
        xm = P(None)
    return QuantTensor(
        qweight=qw,
        scales=sc,
        zscale=sc,
        x_map=None if qt.x_map is None else xm,
        in_features=qt.in_features,
        out_features=qt.out_features,
        groupsize=qt.groupsize,
        layout=qt.layout,
    )


def _can_shard_out(qt: QuantTensor, tp: int) -> bool:
    """Column sharding must keep N_ALIGN-aligned column blocks per shard
    (npair pairs columns within an aligned block, so block-aligned shards
    keep pairs together with their scale columns)."""
    n_pad = qt.padded_out_features
    return (n_pad // N_ALIGN) % tp == 0


def _can_shard_in(qt: QuantTensor, tp: int) -> bool:
    """Row sharding must keep quantization groups whole per shard."""
    k = qt.in_features
    return k % tp == 0 and (k // tp) % qt.groupsize == 0


def param_shardings(params, mesh: Mesh):
    """ModelParams-shaped pytree of NamedShardings (layers = per-layer tuple)."""
    from exllama_tpu.models.llama import LayerParams, ModelParams

    tp = mesh.shape["tp"]

    def spec_for(qt: QuantTensor, want: str) -> QuantTensor:
        """Degrade to replication when the tensor can't split cleanly —
        e.g. GQA k/v projections whose N is below PANEL*tp (a replicated
        small matmul beats a broken layout; its KV output is still sliced
        per-shard by the cache's head sharding)."""
        ok = _can_shard_out(qt, tp) if want == "out" else _can_shard_in(qt, tp)
        return _quant_specs(qt, want if ok else "none")

    if tp > 1 and any(
        lp.qkv is not None or lp.gateup is not None for lp in params.layers
    ):
        raise ValueError(
            "TP sharding requires unfused projections: load with "
            "tuning.fuse_projections=False (fused qkv/gateup column blocks "
            "would straddle shard boundaries)"
        )

    def opt(qt, want):
        # fused (dp-only) layers have q/k/v/gate/up = None and carry
        # replicated qkv/gateup instead
        return None if qt is None else spec_for(qt, want)

    layer_specs = tuple(
        LayerParams(
            input_norm=P(None),
            post_norm=P(None),
            q=opt(lp.q, "out"),
            k=opt(lp.k, "out"),
            v=opt(lp.v, "out"),
            o=spec_for(lp.o, "in"),
            gate=opt(lp.gate, "out"),
            up=opt(lp.up, "out"),
            down=spec_for(lp.down, "in"),
            qkv=opt(lp.qkv, "none"),
            gateup=opt(lp.gateup, "none"),
        )
        for lp in params.layers
    )
    head = params.lm_head
    head_spec = (
        spec_for(head, "out")
        if isinstance(head, QuantTensor)
        else P(None, "tp")            # logits sharded over vocab
    )
    specs = ModelParams(
        embed=P(None, None),          # replicated: lookup stays local
        layers=layer_specs,
        norm=P(None),
        lm_head=head_spec,
        rope_sin=P(None, None),
        rope_cos=P(None, None),
    )
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh):
    if mesh is None:
        return params
    return jax.device_put(params, param_shardings(params, mesh))


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer [B, Hkv, S, D] — batch over dp, kv-heads over tp."""
    return NamedSharding(mesh, P("dp", "tp", None, None))


def shard_cache(cache, mesh: Mesh):
    from exllama_tpu.cache import KVCacheState

    sh = cache_sharding(mesh)
    sh3 = NamedSharding(mesh, P("dp", "tp", None))  # int8-cache scale strips

    def put(t, s):
        return None if t is None else tuple(jax.device_put(x, s) for x in t)

    cache.state = KVCacheState(
        k=put(cache.state.k, sh),
        v=put(cache.state.v, sh),
        k_scale=put(cache.state.k_scale, sh3),
        v_scale=put(cache.state.v_scale, sh3),
    )
    return cache
